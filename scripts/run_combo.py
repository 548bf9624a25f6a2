"""Full quality run at ONE pinned hyperparameter combo.

For quality-parity comparisons against a reference log whose best combo
is known, running our full cartesian grid is wasted compute (the
reference's AdaGCL/netfilx grid took ~40 GPU-hours for 96 combos); a
full early-stopped run at the reference's own best combo is the honest
apples-to-apples comparison and is what PARITY.md's "ref's logged combo"
rows mean.

Usage:
  python scripts/run_combo.py --Model AdaGCL --data_path netfilx \
      --data_root /root/reference/Data --log_dir parity_logs \
      --combo '{"n_layers": 2, "learning_rate": 0.001, "reg_weight": 0.1,
                "ssl_alpha": 0.2, "ssl_temp": 0.5}'

Any key absent from the combo keeps its CLI/default value; the YAML grid
is replaced entirely by the single pinned combo.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chaorec_tpu.cli import run  # noqa: E402
from chaorec_tpu.config import parse_cli  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    combo = {}
    if "--combo" in argv:
        i = argv.index("--combo")
        combo = json.loads(argv[i + 1])
        del argv[i : i + 2]
    sys.argv[1:] = argv
    cfg = parse_cli()
    pinned = {k: [v] for k, v in combo.items()}
    pinned["hyper_parameters"] = list(combo.keys())
    run(cfg, yaml_cfg=pinned)


if __name__ == "__main__":
    main()
