"""Run one command with the evidence queue/watchdog SIGSTOPped.

Reuses bench.py's pause helper so an interactive profile or validation
run never timeshares the single TPU chip with the background evidence
queue (``scripts/tpu_watchdog.sh`` -> ``run_quality_r2.sh``). The queue
resumes exactly where it was, even if the wrapped command fails.

Usage: python scripts/with_queue_paused.py -- <command> [args...]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    resume = bench._pause_evidence_queue()
    try:
        return subprocess.call(argv)
    finally:
        resume()


if __name__ == "__main__":
    raise SystemExit(main())
