"""Summarize quality parity: our parity_logs/*.log best blocks vs the
reference's own logs (/root/reference/log), PARITY.md-table-ready.

Both sides use the identical log grammar ("Best performance: X" is the
grid-best test Recall@20 — main.py:435 in the reference, cli.py here),
so the comparison is a grep, not a judgment call. Rows where the
reference log is truncated before its Best block print "(ref truncated)".

Usage: python scripts/parity_quality_report.py [parity_logs] [ref_log_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

BEST = re.compile(r"Best performance: ([0-9.]+)")

# Models whose quality depends on v/t modality features: the snapshot's
# Data/ mount ships none, so OUR runs use synthetic stand-ins (loud
# warning in data/loading.py) and several REFERENCE logs themselves ran
# degraded features (SURVEY.md §6 footnote — ~0.003-0.008 clusters).
# Their rows are speed evidence, not quality parity.
MULTIMODAL = {
    "VBPR", "MMGCN", "GRCN", "MGAT", "LATTICE", "MICRO", "FREEDOM",
    "DualGNN", "DRAGON", "BM3", "SLMRec", "MMGCL", "MMSSL", "MVGAE",
    "LGMRec", "MENTOR", "LightGT", "MGCL", "MGCN", "POWERec", "DDRec",
    "Grade", "GUME", "MHRec", "DiffMM", "SMORE", "COHESION",
}


# reference log filenames that differ from ours only by case/typo
REF_ALIASES = {
    "Grade_sports.log": "Grade_Sports.log",
    "DualGNN_microlens.log": "DualGN_microlens.log",  # ref typo'd name
}


def best_of(path: Path):
    if not path.exists():
        return None
    hits = BEST.findall(path.read_text(errors="replace"))
    return float(hits[-1]) if hits else None


def main() -> None:
    ours_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "parity_logs")
    ref_dir = Path(sys.argv[2] if len(sys.argv) > 2
                   else "/root/reference/log")
    rows = []
    seed_runs = {}  # base workload -> [best per extra seed]
    for path in sorted(ours_dir.glob("*.log")):
        name = path.stem
        ours = best_of(path)
        m = re.match(r"(.+)\.seed(\d+)$", name)
        if m and ours is not None:
            seed_runs.setdefault(m.group(1), []).append(ours)
        ref_name = REF_ALIASES.get(path.name, path.name)
        ref = best_of(ref_dir / ref_name)
        rows.append((name, ours, ref, ref_name))
    w = max((len(r[0]) for r in rows), default=10)
    print(f"{'workload':<{w}}  {'ours':>8}  {'reference':>9}  delta")
    for name, ours, ref, ref_name in rows:
        o = f"{ours:.5f}" if ours is not None else "(no best)"
        if ref is None:
            r, d = ("(no ref log)" if not (ref_dir / ref_name).exists()
                    else "(ref truncated)"), ""
        elif ours is None:
            r, d = f"{ref:.5f}", ""
        else:
            r = f"{ref:.5f}"
            d = f"{(ours - ref) / ref * 100.0:+6.1f}%"
        model = name.split("_")[0]
        note = ("  [multimodal: synthetic v/t stand-ins — not a quality row]"
                if model in MULTIMODAL else "")
        # VERDICT r3 item 10: mean +- spread across the seed repeats so
        # outlier single-run deltas read as RNG noise or a numerics bug
        if name in seed_runs and ours is not None:
            vals = [ours] + seed_runs[name]
            mean = sum(vals) / len(vals)
            spread = (max(vals) - min(vals)) / 2.0
            note += (f"  [seeds n={len(vals)}: {mean:.5f} +- {spread:.5f}"
                     + (f", mean delta {(mean - ref) / ref * 100.0:+.1f}%"
                        if ref is not None else "") + "]")
        print(f"{name:<{w}}  {o:>8}  {r:>9}  {d}{note}")


if __name__ == "__main__":
    main()
