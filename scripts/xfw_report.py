"""Build the cross-framework trajectory parity table.

Parses parity_logs/xfw_<Model>_<data>.{ref,ours}.log pairs (reference
torch-on-CPU run via scripts/xfw_oracle.py vs our CLI at the same combo,
same synthetic features, same epoch budget) and writes
parity_logs/xfw_report.txt with per-epoch loss and test Recall@20
trajectories plus final-epoch deltas.

Interpretation note (documented tolerance): the two sides share inputs,
seeds and semantics but NOT RNG streams (torch vs jax init/shuffle/
negative draws), so trajectories are compared statistically: final-epoch
loss within ~10% and test R@20 within ~15% at epoch >= 3 is
single-stream territory for 6-epoch runs on baby; larger systematic
gaps flag a numerics divergence worth bisecting at op level
(tests/test_torch_oracles.py).
"""

import re
import sys
from pathlib import Path

LOGDIR = Path(__file__).resolve().parent.parent / "parity_logs"

EPOCH_RE = re.compile(r"Epoch (\d+), Loss: ([\d.eE+-]+)")
K20_RE = re.compile(r"^.*20: precision: [\d.]+ \| recall: ([\d.]+)")


def parse(path: Path):
    """-> (losses, test_recalls) per epoch. The log prints Validation
    then Test tables after each epoch line; recall@20 appears once per
    table — take every SECOND k=20 row (test)."""
    losses, recalls, k20 = [], [], []
    for line in path.read_text().splitlines():
        m = EPOCH_RE.search(line)
        if m:
            # flush the previous epoch's test row (2nd k=20 match)
            if len(k20) >= 2:
                recalls.append(k20[1])
            k20 = []
            losses.append(float(m.group(2)))
            continue
        m = K20_RE.match(line)
        if m:
            k20.append(float(m.group(1)))
    if len(k20) >= 2:
        recalls.append(k20[1])
    return losses, recalls


def main() -> None:
    pairs = sorted({p.name.rsplit(".", 2)[0] for p in
                    LOGDIR.glob("xfw_*.ref.log")})
    out = []
    out.append(f"{'workload':<22} {'side':<5} "
               + " ".join(f"{'ep' + str(i + 1):>9}" for i in range(8)))
    summary = []
    for name in pairs:
        ref_p = LOGDIR / f"{name}.ref.log"
        ours_p = LOGDIR / f"{name}.ours.log"
        rl, rr = parse(ref_p)
        ol, orr = ([], [])
        if ours_p.exists():
            ol, orr = parse(ours_p)
        wl = name[len("xfw_"):]
        for label, (ls, rs) in (("ref", (rl, rr)), ("ours", (ol, orr))):
            out.append(f"{wl:<22} {label:<5} "
                       + " ".join(f"{v:9.3f}" for v in ls[:8]) + "  loss")
            out.append(f"{'':<22} {'':<5} "
                       + " ".join(f"{v:9.5f}" for v in rs[:8]) + "  testR@20")
        if rl and ol:
            n = min(len(rl), len(ol), len(rr), len(orr))
            dl = (ol[n - 1] - rl[n - 1]) / abs(rl[n - 1]) * 100
            dr = ((orr[n - 1] - rr[n - 1]) / rr[n - 1] * 100
                  if rr[n - 1] else float("nan"))
            summary.append(f"{wl:<22} ep{n}: loss {dl:+6.1f}%   "
                           f"testR@20 {dr:+6.1f}%")
        out.append("")
    out.append("final-epoch deltas (ours vs reference-torch-on-CPU, "
               "same synthetic features/combo):")
    out.extend(summary or ["  (no complete pairs yet)"])
    text = "\n".join(out) + "\n"
    (LOGDIR / "xfw_report.txt").write_text(text)
    print(text)


if __name__ == "__main__":
    main()
