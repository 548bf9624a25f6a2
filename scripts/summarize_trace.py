"""Summarize a jax.profiler trace: top device ops by total duration.

Reads the newest ``plugins/profile/<run>/*.trace.json.gz`` under the
given directory and aggregates event durations per op name on the
device tracks (pids whose process name mentions TPU/device), printing
the top-N with total ms, call count and share of device time. This is
the cheap first-look that says WHERE an epoch's device time goes before
opening the full trace in xprof.

Usage: python scripts/summarize_trace.py /tmp/lattice_prof [top_n]
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def main() -> None:
    root = Path(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    traces = sorted(root.glob("plugins/profile/*/*.trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        sys.exit(f"no trace under {root}")
    path = traces[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # process-name metadata -> device pids
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
    print(f"trace: {path}")
    print(f"device tracks: {[pid_name[p] for p in sorted(dev_pids)]}")
    print(f"total device op time: {total:.1f} ms")
    print(f"{'op':<72} {'ms':>10} {'calls':>7} {'%':>6}")
    for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{name[:72]:<72} {ms:10.2f} {n:7d} {100*ms/max(total,1e-9):6.1f}")


if __name__ == "__main__":
    main()
