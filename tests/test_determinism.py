"""Bitwise determinism: two same-seed runs produce identical results.

The TPU-era analog of the reference's cudnn determinism knobs
(main.py:69-70, utils.py:24-34: fixed seed 42, cudnn.deterministic=True).
Here determinism is structural — all randomness flows through seeded
jax.random streams and XLA compiles a fixed program — and this test pins
it: losses and rank lists from two fresh Trainers with the same config
must be bit-identical, not merely close.
"""

import numpy as np
import pytest

import jax

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model
import chaorec_tpu.models.builders  # noqa: F401  (registry)
from chaorec_tpu.train.loop import Trainer

pytestmark = pytest.mark.fast


def _run(tiny_dataset, epochs=2):
    cfg = Config(Model="LightGCN", data_path="tiny")
    cfg = cfg.replace(n_layers=2, learning_rate=1e-2, reg_weight=1e-3,
                      batch_size=32, seed=42)
    model = build_model(cfg, tiny_dataset)
    tr = Trainer(model, tiny_dataset, cfg)
    params = model.init_params(jax.random.PRNGKey(cfg.seed))
    opt_state = tr.init_opt_state(params)
    rng = jax.random.PRNGKey(cfg.seed)
    losses = []
    for epoch in range(epochs):
        params, opt_state, rng, loss = tr.train_epoch(
            params, opt_state, rng, epoch)
        losses.append(np.asarray(loss))
    _, _, rank = tr.evaluate(params)
    return np.asarray(losses), np.asarray(rank)


def test_same_seed_runs_are_bit_identical(tiny_dataset):
    l1, r1 = _run(tiny_dataset)
    l2, r2 = _run(tiny_dataset)
    np.testing.assert_array_equal(l1, l2)  # exact, not allclose
    np.testing.assert_array_equal(r1, r2)


def test_different_seed_runs_differ(tiny_dataset):
    l1, _ = _run(tiny_dataset)
    cfg_losses = []
    cfg = Config(Model="LightGCN", data_path="tiny")
    cfg = cfg.replace(n_layers=2, learning_rate=1e-2, reg_weight=1e-3,
                      batch_size=32, seed=7)
    model = build_model(cfg, tiny_dataset)
    tr = Trainer(model, tiny_dataset, cfg)
    params = model.init_params(jax.random.PRNGKey(cfg.seed))
    opt_state = tr.init_opt_state(params)
    rng = jax.random.PRNGKey(cfg.seed)
    for epoch in range(2):
        params, opt_state, rng, loss = tr.train_epoch(
            params, opt_state, rng, epoch)
        cfg_losses.append(np.asarray(loss))
    assert not np.array_equal(l1, np.asarray(cfg_losses))
