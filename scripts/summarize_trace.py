"""Summarize a jax.profiler trace: top device ops by SELF duration.

Reads the newest ``plugins/profile/<run>/*.trace.json.gz`` under the
given directory and aggregates event durations per op name on the
device tracks (pids whose process name mentions TPU/device), printing
the top-N with total ms, call count and share of device time. This is
the cheap first-look that says WHERE an epoch's device time goes before
opening the full trace in xprof.

XLA op traces nest sub-ops under parent regions on the same track, so
summing every complete event double-counts parents; aggregation is by
self time (event duration minus the durations of its direct children,
computed with an interval stack per track).

Usage: python scripts/summarize_trace.py /tmp/lattice_prof [top_n]
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def track_self_times(track):
    """[(ts, dur, name)] -> yields (name, self_dur) per event.

    Events on one timeline nest (trace-complete semantics); a sweep in
    start order with an interval stack attributes each event's duration
    minus its direct children's to itself.
    """
    # parents sort before their children: earlier start first; at equal
    # start, longer duration first
    track.sort(key=lambda e: (e[0], -e[1]))
    stack = []  # [end_ts, name, dur, child_dur_sum]
    for ts, dur, name in track:
        while stack and ts >= stack[-1][0] - 1e-9:
            end, pname, pdur, child = stack.pop()
            yield pname, max(0.0, pdur - child)
        if stack:
            stack[-1][3] += dur
        stack.append([ts + dur, name, dur, 0.0])
    while stack:
        end, pname, pdur, child = stack.pop()
        yield pname, max(0.0, pdur - child)


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
    tid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "device" in n.lower()}
    # a device pid carries parallel timelines ("Steps", "XLA Modules",
    # "XLA Ops", "Source code", ...) that all span the same wall time —
    # summing every track multi-counts each op under its module/step
    # parents. Keep only the leaf-op tracks when they exist.
    op_tids = {t for t, n in tid_name.items()
               if t[0] in dev_pids and "XLA Ops" in n}
    by_track = defaultdict(list)
    counts = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        key = (ev["pid"], ev.get("tid"))
        if op_tids and key not in op_tids:
            continue
        name = ev.get("name", "?")
        counts[name] += 1
        by_track[key].append(
            (float(ev.get("ts", 0.0)), float(ev.get("dur", 0.0)), name))
    agg = defaultdict(float)
    total = 0.0
    for track in by_track.values():
        for name, self_us in track_self_times(track):
            ms = self_us / 1e3
            agg[name] += ms
            total += ms
    print(f"trace: {path}")
    print(f"device tracks: {[pid_name[p] for p in sorted(dev_pids)]}")
    print(f"total device self time: {total:.1f} ms")
    print(f"{'op':<72} {'ms':>10} {'calls':>7} {'%':>6}")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name[:72]:<72} {ms:10.2f} {counts[name]:7d} "
              f"{100 * ms / max(total, 1e-9):6.1f}")


if __name__ == "__main__":
    main()
