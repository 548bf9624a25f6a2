"""Golden-file integration (SURVEY §4 item 2): real-dataset trajectory
vs the reference's own run log.

`log/LightGODE_baby.log` is the only reference log for baby — the one
dataset in the snapshot that is CPU-feasible AND ships
user_item_dict.npy. Its single grid combo (gamma=0.2, lr=0.001, t=1.0)
logs a loss/metric trajectory we bracket here: different RNG streams
(init/shuffle/negatives) move individual epochs, so the pins are
tolerance bands around the reference's epoch-5/10 losses and epoch-10
test Recall@20, not exact values.
"""

import os

import numpy as np
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model

DATA_ROOT = "/root/reference/Data"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(os.path.join(DATA_ROOT, "baby/train.npy")),
        reason="reference baby dataset not mounted"),
]


def test_lightgode_baby_trajectory_brackets_reference_log():
    from chaorec_tpu.data.loading import data_load
    from chaorec_tpu.train.loop import Trainer

    # log/LightGODE_baby.log combo 1/1: {'gamma': 0.2, 'learning_rate':
    # 0.001, 't': 1.0}; ref: Epoch 5 loss 18.79547, Epoch 10 loss
    # 8.96839, epoch-10 test Recall@20 0.02958, late epochs ~0.0575
    cfg = Config(Model="LightGODE", data_path="baby", data_root=DATA_ROOT,
                 gamma=0.2, learning_rate=0.001, t=1.0, batch_size=1024,
                 num_epoch=11, patience=11)
    ds = data_load(cfg.data_path, cfg.data_root)
    model = build_model(cfg, ds)
    trainer = Trainer(model, ds, cfg)

    import jax

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    opt_state = trainer.init_opt_state(params)
    losses = {}
    for epoch in range(11):
        params, opt_state, rng, loss = trainer.train_epoch(
            params, opt_state, rng, epoch)
        losses[epoch] = float(loss)
    val_m, test_m = trainer.evaluate(params)[:2]

    # loss scale matches the reference trajectory (sum over 63 batches;
    # the curve drops ~19 -> ~9 between epochs 5 and 10)
    assert 0.6 * 18.79547 < losses[4] < 1.6 * 18.79547, losses
    assert 0.6 * 8.96839 < losses[9] < 1.6 * 8.96839, losses
    assert losses[9] < losses[4] < losses[0]

    # epoch-10 test Recall@20 brackets the reference's 0.02958
    r20 = test_m[20]["recall"]
    assert r20 > 0.8 * 0.02958, (r20, test_m)
