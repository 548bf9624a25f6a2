"""Summarize parity_logs/*.speed.stdout into PARITY.md-ready speed rows.

Each speed stdout is a short fixed-epoch run logged by the trainer's
honest per-epoch wall clock (`epoch_time_s: total ...` — the total
includes the previous epoch's device work resolved under the
one-epoch-deep pipeline, matching how the reference column is computed
from its log timestamp deltas). The first epoch is compile + warmup and
is dropped; the row value is the median of the steady-state epochs.

Usage: python scripts/parity_speed_report.py [parity_logs]
"""

from __future__ import annotations

import re
import statistics
import sys
from pathlib import Path

# Hand-checked overrides (BASELINE.md); anything not listed here is
# derived from the reference log's own Epoch-line timestamp deltas
# (first combo only) by _ref_epoch_from_log below.
REF_EPOCH_S = {
    "CF_Diff_beauty": 91.0,
    "SMORE_sports": 15.0,
    "DRAGON_sports": 17.0,
    "MICRO_microlens": 54.0,
    "LATTICE_microlens": 5.0,
    # log/MHRec_beauty.log provably ran phase C only (none of the
    # unconditional diffusion-phase lines, train_and_evaluate.py:337-364
    # — see the measurement-mode note in models/mhrec.py). The matched
    # workload is the .phaseC row; the FULL three-phase epoch has no
    # reference timing (None = print no ref/speedup).
    "MHRec_beauty": None,
    "MHRec_beauty.phaseC": 4.0,
    "DiffMM_beauty": 13.0,
    "GUME_sports": 15.0,
    "COHESION_sports": 30.0,
    "MMSSL_beauty": 26.0,
    "MCLN_beauty": 9.0,
}

REF_LOG_DIR = Path("/root/reference/log")
_TS = re.compile(r"^\w{3} (\d{2} \w{3} \d{4} \d{2}:\d{2}:\d{2}) INFO (.*)")


def _ref_epoch_from_log(name: str):
    """Median per-epoch wall clock of the reference log's FIRST grid
    combo, from its own Epoch-line timestamp deltas (the same way the
    hand-checked BASELINE.md numbers were computed). Returns None when
    there is no log or fewer than 2 epoch deltas; 1-s log resolution
    makes sub-second reference epochs unusable, so those report None."""
    import datetime

    aliases = {"Grade_sports": "Grade_Sports"}  # ref log case quirk
    path = REF_LOG_DIR / f"{aliases.get(name, name)}.log"
    if not path.exists():
        return None
    stamps, combos = [], 0
    for line in path.read_text(errors="replace").splitlines():
        m = _TS.match(line)
        if not m:
            continue
        msg = m.group(2)
        if "Parameters:" in msg:
            combos += 1
            if combos > 1:
                break
        elif msg.startswith("Epoch ") and combos <= 1:
            stamps.append(datetime.datetime.strptime(
                m.group(1), "%d %b %Y %H:%M:%S"))
    deltas = [(b - a).total_seconds() for a, b in zip(stamps, stamps[1:])
              if 0 < (b - a).total_seconds() < 3600]
    if len(deltas) < 2:
        return None
    med = statistics.median(deltas)
    return med if med >= 1.0 else None

LINE = re.compile(r"epoch_time_s: total ([0-9.]+)")


def summarize(path: Path, first_combo_only: bool = False):
    """Median steady-state epoch seconds. With first_combo_only, stop at
    the second grid-combo header so full-run rows compare the same combo
    the reference column was derived from (its log's first combo)."""
    times, combos = [], 0
    for line in path.read_text(errors="replace").splitlines():
        if "Parameters:" in line:
            combos += 1
            if first_combo_only and combos > 1:
                break
        m = LINE.search(line)
        if m:
            times.append(float(m.group(1)))
    if len(times) < 3:
        return None
    steady = times[1:]  # drop compile epoch
    return statistics.median(steady), len(steady)


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "parity_logs")
    # Dedicated speed captures take precedence; full-run stdouts (the
    # quality combos log the same per-epoch wall clock) fill the rest.
    sources: dict[str, tuple[Path, str]] = {}
    for path in sorted(root.glob("*.stdout")):
        if ".randsvd" in path.name:
            continue
        if path.name.endswith(".speed.stdout"):
            name = path.name.replace(".speed.stdout", "")
            sources[name] = (path, "speed")
        else:
            name = path.name.replace(".stdout", "")
            sources.setdefault(name, (path, "full-run"))
    rows = []
    for name, (path, kind) in sorted(sources.items()):
        s = summarize(path, first_combo_only=(kind == "full-run"))
        if s is None:
            rows.append((name, None, None, None, kind))
            continue
        med, n = s
        # retime stdouts carry dated suffixes (Model_data.speed_r5c2,
        # Model_data.full.speed_r5e): the reference column belongs to
        # the base workload (".phaseC" is semantic and kept)
        parts = name.split(".")
        base = parts[0] + (".phaseC" if len(parts) > 1
                           and parts[1] == "phaseC" else "")
        if base in REF_EPOCH_S:
            ref = REF_EPOCH_S[base]
        else:
            ref = _ref_epoch_from_log(base)
        rows.append((name, med, n, ref, kind))
    w = max((len(r[0]) for r in rows), default=10)
    print(f"{'workload':<{w}}  epochs  median_s  ref_s  speedup  source")
    for name, med, n, ref, kind in rows:
        if med is None:
            print(f"{name:<{w}}  (no steady-state epochs — run incomplete"
                  f" or pre-timing-era {kind})")
            continue
        spd = f"{ref / med:7.2f}x" if ref else "      —"
        print(f"{name:<{w}}  {n:>6}  {med:8.3f}  {ref if ref else '—':>5}"
              f"  {spd}  {kind}")


if __name__ == "__main__":
    main()
