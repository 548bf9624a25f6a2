"""CLI driver: grid search + logging with reference-format parity.

Mirrors the reference's ``main.py``: same flags, same YAML grid semantics,
same log file naming (``log/{Model}_{data_path}.log``, overwrite mode) and
line formats (``'%(asctime)s %(levelname)s %(message)s'`` with
``'%a %d %b %Y %H:%M:%S'`` dates; main.py:84-103), same grid-progress and
best-performance blocks (main.py:252-253, 428-442).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

from chaorec_tpu.config import Config, grid_combinations, load_yaml_config, parse_cli
from chaorec_tpu.data.loading import data_load
from chaorec_tpu.models import build_model
from chaorec_tpu.train.loop import Trainer

LOG_FORMAT = "%(asctime)s %(levelname)s %(message)s"
DATE_FORMAT = "%a %d %b %Y %H:%M:%S"


def setup_logging(cfg: Config) -> None:
    os.makedirs(cfg.log_dir, exist_ok=True)
    log_filename = os.path.join(cfg.log_dir, f"{cfg.Model}_{cfg.data_path}.log")
    formatter = logging.Formatter(LOG_FORMAT, DATE_FORMAT)
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(formatter)
    file_handler = logging.FileHandler(log_filename, mode="w")
    file_handler.setLevel(logging.INFO)
    file_handler.setFormatter(formatter)
    logger.addHandler(console)
    logger.addHandler(file_handler)


def run(cfg: Config, yaml_cfg: Optional[Dict] = None) -> Dict:
    """Full grid-search run; returns the best test metrics."""
    setup_logging(cfg)
    logging.info("============Arguments==============")
    for arg, value in cfg.as_flat_dict().items():
        logging.info("%s: %s", arg, value)

    dataset = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)

    if yaml_cfg is None:
        try:
            yaml_cfg = load_yaml_config(cfg.Model)
        except FileNotFoundError:
            yaml_cfg = {"hyper_parameters": []}

    combos = list(grid_combinations(yaml_cfg)) or [{}]
    total_loops = len(combos)

    best_performance = None
    best_params = None
    best_metrics = None
    best_export = None

    # Grid cursor (capability add, SURVEY §5): with checkpointing enabled,
    # finished combos are recorded and skipped on restart, and each combo
    # gets its own checkpoint subdirectory so resume never mixes weights.
    import json
    import os

    cursor_path = (os.path.join(cfg.checkpoint_dir, "grid_cursor.json")
                   if cfg.checkpoint_dir and cfg.checkpoint_every > 0
                   else None)
    done: Dict[str, Dict] = {}
    if cursor_path and os.path.exists(cursor_path):
        with open(cursor_path) as f:
            done = json.load(f)

    for idx, hyper_param_dict in enumerate(combos):
        logging.info(
            "========={}/{}: Parameters:{}=========".format(
                idx + 1, total_loops, hyper_param_dict
            )
        )
        combo_cfg = cfg.replace(**hyper_param_dict)
        if cursor_path:
            combo_cfg = combo_cfg.replace(checkpoint_dir=os.path.join(
                cfg.checkpoint_dir, f"combo_{idx}"))
            if str(idx) in done:
                logging.info("combo %d already finished - skipping (grid "
                             "cursor)", idx + 1)
                current = {int(k): v for k, v in done[str(idx)].items()}
                current_recall = current[20]["recall"] if 20 in current \
                    else current[max(current)]["recall"]
                if best_performance is None or \
                        current_recall > best_performance:
                    best_performance = current_recall
                    best_params = dict(hyper_param_dict)
                    best_metrics = current
                continue
        model = build_model(combo_cfg, dataset)
        trainer_cls = getattr(model, "trainer_cls", Trainer)
        trainer = trainer_cls(model, dataset, combo_cfg)
        current = trainer.run()
        if cursor_path:
            done[str(idx)] = {str(k): dict(v) for k, v in current.items()}
            with open(cursor_path, "w") as f:
                json.dump(done, f)
        current_recall = current[20]["recall"] if 20 in current else (
            current[max(current)]["recall"]
        )
        if best_performance is None or current_recall > best_performance:
            best_performance = current_recall
            best_params = dict(hyper_param_dict)
            best_metrics = current
            if cfg.export_artifact:
                best_host = getattr(trainer, "best_params_host", None)
                best_export = (
                    model,
                    best_host if best_host is not None
                    else getattr(trainer, "final_params", None),
                    getattr(trainer, "best_mstate_host", None)
                    or getattr(trainer, "model_state", None),
                    "best-epoch" if best_host is not None else "final-epoch",
                )

    if cfg.export_artifact:
        if best_export is None:
            # best combo was skipped via the grid cursor: no live weights
            logging.warning("export_artifact: best combo resumed from the "
                            "grid cursor - re-run it to export")
            params = None
        else:
            model, params, mstate, snapshot = best_export
        if params is None:
            logging.warning("export_artifact: best combo's trainer kept no "
                            "weights - skipping export")
        else:
            from chaorec_tpu.serve import export_artifact

            logging.info("export_artifact: exporting %s weights to %s",
                         snapshot, cfg.export_artifact)
            export_artifact(model, params, mstate, dataset,
                            cfg.export_artifact, snapshot=snapshot)

    logging.info("Best performance: {:.5f}".format(best_performance))
    logging.info("Best parameters: {}".format(best_params))
    logging.info("Best metrics:")
    for k, metrics in best_metrics.items():
        metrics_strs = [f"{metric}: {value:.5f}" for metric, value in metrics.items()]
        logging.info(f"{k}: {' | '.join(metrics_strs)}")
    return best_metrics


def main(argv: Optional[List[str]] = None) -> None:
    cfg = parse_cli(argv)
    run(cfg)


if __name__ == "__main__":
    main()
