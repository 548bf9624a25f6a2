"""Rebuild-gated optimizer semantics (base.py epoch0_params).

LATTICE/MICRO only give their feature tables / trs projections /
modal weights gradients on each epoch's FIRST batch (the carried item
graph is detached otherwise, reference train_and_evaluate.py:98-103 +
Model/LATTICE.py:137-158). torch Adam skips params whose .grad is None
after zero_grad(set_to_none) — no update AND no moment decay — so the
trainer must not run zero-grad Adam steps over that subtree: these
tests pin the lax.cond-gated update in train/loop.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model
from chaorec_tpu.train.loop import Trainer


def _lattice_cfg():
    return Config(Model="LATTICE", batch_size=32, dim_E=16,
                  feature_embed=16, learning_rate=1e-3, reg_weight=1e-4,
                  n_layers=1, mm_layers=1, ii_topk=5, lambda_coeff=0.8,
                  num_epoch=1, seed=7)


def test_gated_subtree_updates_once_per_epoch(tiny_dataset):
    """After one multi-batch epoch the gated Adam state has count == 1
    (one rebuild batch) while the main state counted every batch; the
    gated moments therefore never decayed on the zero-grad batches."""
    cfg = _lattice_cfg()
    model = build_model(cfg, tiny_dataset)
    assert model.epoch0_params  # the model under test declares the gate
    tr = Trainer(model, tiny_dataset, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tr.init_opt_state(params)
    main_state, gate_state = opt_state  # pair schema

    params, opt_state, _, loss = tr.train_epoch(
        params, opt_state, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(loss))
    main_state, gate_state = opt_state
    n_batches = tiny_dataset.train_edges.shape[0] // cfg.batch_size
    assert n_batches >= 2

    def adam_count(state):
        counts = [np.asarray(l) for l in jax.tree.leaves(state)
                  if np.asarray(l).dtype == np.int32
                  and np.asarray(l).ndim == 0]
        assert counts
        return int(max(counts))

    assert adam_count(gate_state) == 1
    assert adam_count(main_state) == n_batches


def test_gated_params_frozen_off_batch0(tiny_dataset):
    """Stepping the jitted epoch body on a NON-rebuild batch leaves the
    gated subtree bit-identical (torch skips no-grad params), while the
    always-on embeddings move."""
    cfg = _lattice_cfg()
    model = build_model(cfg, tiny_dataset)
    tr = Trainer(model, tiny_dataset, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tr.init_opt_state(params)

    before = {k: np.asarray(params[k]).copy() for k in model.epoch0_params}
    params, opt_state, _, _ = tr.train_epoch(
        params, opt_state, jax.random.PRNGKey(1), 0)

    # batch 0 rebuilt the graph: the gated subtree must have moved once
    moved = any(
        not np.array_equal(before[k], np.asarray(params[k]))
        for k in model.epoch0_params)
    assert moved

    # Manually run one more epoch whose batches we relabel as index >= 1:
    # the gated subtree must stay bit-identical through every step. The
    # cheap proxy via the public API: a second epoch moves them again
    # (its batch 0 rebuilds), so instead pin per-step behavior with the
    # sharded step, which takes an explicit batch.index.
    from chaorec_tpu.models.base import Batch
    from chaorec_tpu.parallel.mesh import (
        init_stateful_opt_state,
        make_mesh,
        make_sharded_stateful_step,
    )

    model2 = build_model(cfg, tiny_dataset)
    p = model2.init_params(jax.random.PRNGKey(0))
    mstate = model2.init_state(jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    step = make_sharded_stateful_step(model2, opt, make_mesh(1))
    rs = np.random.default_rng(3)
    b = 32
    batch1 = Batch(
        jnp.asarray(rs.integers(0, tiny_dataset.num_user, b), jnp.int32),
        jnp.asarray(rs.integers(0, tiny_dataset.num_item, b), jnp.int32),
        jnp.asarray(rs.integers(0, tiny_dataset.num_item, b), jnp.int32),
        jnp.ones((b,), jnp.float32), jnp.int32(1), None,
    )
    os0 = init_stateful_opt_state(model2, opt, p)
    gate_before = {k: np.asarray(p[k]).copy() for k in model2.epoch0_params}
    p2, os1, _, _ = step(p, os0, mstate, batch1, jax.random.PRNGKey(4))
    for k in model2.epoch0_params:
        np.testing.assert_array_equal(gate_before[k], np.asarray(p2[k]))
    # moments untouched as well
    for a, b_ in zip(jax.tree.leaves(os0[1]), jax.tree.leaves(os1[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # and the always-on embeddings did move
    assert not np.array_equal(np.asarray(p["user_embedding"]),
                              np.asarray(p2["user_embedding"]))


@pytest.mark.parametrize("model_name", ["LATTICE", "MICRO"])
def test_epoch0_models_declare_build_only_params(tiny_dataset, model_name):
    """Every name in epoch0_params really is rebuild-only: its gradient
    is exactly zero on a batch with index != 0."""
    cfg = Config(Model=model_name, batch_size=32, dim_E=16,
                 feature_embed=16, learning_rate=1e-3, reg_weight=1e-4,
                 n_layers=1, mm_layers=1, ii_topk=5, lambda_coeff=0.8,
                 ssl_temp=0.5, ssl_alpha=0.1, num_epoch=1, seed=7)
    model = build_model(cfg, tiny_dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    mstate = model.init_state(jax.random.PRNGKey(1))
    from chaorec_tpu.models.base import Batch

    rs = np.random.default_rng(5)
    b = 32
    batch = Batch(
        jnp.asarray(rs.integers(0, tiny_dataset.num_user, b), jnp.int32),
        jnp.asarray(rs.integers(0, tiny_dataset.num_item, b), jnp.int32),
        jnp.asarray(rs.integers(0, tiny_dataset.num_item, b), jnp.int32),
        jnp.ones((b,), jnp.float32), jnp.int32(3), None,
    )
    grads = jax.grad(
        lambda pr: model.loss_stateful(pr, mstate, batch,
                                       jax.random.PRNGKey(2))[0])(params)
    for k in model.epoch0_params:
        assert float(jnp.max(jnp.abs(grads[k]))) == 0.0, k
    # sanity: a non-gated param does get gradient
    assert float(jnp.max(jnp.abs(grads["item_embedding"]))) > 0.0
