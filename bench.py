"""Benchmark: LightGCN full epoch (train + full-catalog eval) on beauty.

Reference baseline: ~4 s/epoch on an unrecorded GPU (median of log
timestamp deltas in /root/reference/log/LightGCN_beauty.log; BASELINE.md).
An epoch here means exactly what it means in the reference loop: one full
pass over the shuffled train edges with per-batch Adam updates, followed by
full-catalog ranking (top-50 over all items for all users) and metric
computation on val+test (train_and_evaluate.py:554-677).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path


def find_data_root() -> str:
    for cand in ("Data", "/root/repo/Data", "/root/reference/Data"):
        if Path(cand).joinpath("beauty/train.npy").exists():
            return cand
    raise FileNotFoundError("beauty dataset not found")


def main() -> None:
    import jax

    from chaorec_tpu.config import Config
    from chaorec_tpu.data.loading import data_load
    from chaorec_tpu.models import build_model
    from chaorec_tpu.train.loop import Trainer

    baseline_epoch_s = 4.0  # log/LightGCN_beauty.log median epoch seconds

    cfg = Config(
        Model="LightGCN",
        data_path="beauty",
        data_root=find_data_root(),
        n_layers=2,
        learning_rate=1e-3,
        reg_weight=1e-3,
        batch_size=1024,
        dim_E=64,
    )
    dataset = data_load(cfg.data_path, cfg.data_root)
    model = build_model(cfg, dataset)
    trainer = Trainer(model, dataset, cfg)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    opt_state = trainer.init_opt_state(params)

    # Warm-up epoch: compile train scan + eval kernels.
    params, opt_state, rng, loss = trainer.train_epoch(params, opt_state, rng, 0)
    trainer.evaluate(params)

    # Steady-state epochs, one-epoch-deep eval pipeline (the trainer's
    # default run-loop behavior): dispatch epoch N's train+eval, resolve
    # epoch N-1's single metrics fetch while N computes on device. Every
    # epoch's metrics are still fetched and observed; the epoch time is the
    # inter-resolve interval.
    # 7 timed epochs: enough for the dispatch queue to reach steady state
    # so the median reflects sustainable throughput, not pipeline fill.
    times = []
    pending = None
    for epoch in range(1, 9):
        t0 = time.perf_counter()
        params, opt_state, rng, loss = trainer.train_epoch(
            params, opt_state, rng, epoch
        )
        _, resolve = trainer.evaluate_async(params, extra_scalar=loss)
        if pending is not None:
            pending()  # blocking fetch of the previous epoch's metrics
            times.append(time.perf_counter() - t0)
        pending = resolve
    pending()

    epoch_s = statistics.median(times)
    print(
        json.dumps(
            {
                "metric": "lightgcn_beauty_epoch_s",
                "value": round(epoch_s, 4),
                "unit": "s",
                "vs_baseline": round(baseline_epoch_s / epoch_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
