"""Single-combo epoch-timing run: the first YAML grid combo only.

For epoch-time comparisons against the reference logs one combo is
enough; running the full grid recompiles the epoch program per combo and
multiplies wall-clock by the grid size.

Usage: python scripts/run_speed_single.py --Model GUME --data_path sports \
           --num_epoch 6 --data_root /root/reference/Data --log_dir parity_logs
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chaorec_tpu.cli import run  # noqa: E402
from chaorec_tpu.config import grid_combinations, load_yaml_config, parse_cli  # noqa: E402


def main() -> None:
    cfg = parse_cli()
    try:
        yaml_cfg = load_yaml_config(cfg.Model)
        first = next(iter(grid_combinations(yaml_cfg)), {})
    except FileNotFoundError:
        first = {}
    single = {k: [v] for k, v in first.items()}
    single["hyper_parameters"] = list(first.keys())
    run(cfg, yaml_cfg=single)


if __name__ == "__main__":
    main()
