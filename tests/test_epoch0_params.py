"""Rebuild-gated optimizer semantics (base.py epoch0_params).

LATTICE/MICRO only give their feature tables / trs projections / modal
weights gradients on each epoch's FIRST batch (the carried item graph is
detached otherwise, reference train_and_evaluate.py:98-103 +
Model/LATTICE.py:137-158). The reference pins torch 1.11, where
``zero_grad()`` defaults to ``set_to_none=False``: after batch 0's
backward populates ``.grad``, every later batch re-zeroes the tensor and
Adam KEEPS stepping the subtree with g = 0 — momentum-decay drift plus a
per-batch step-count increment. These tests pin that the trainer's
gated-update-plus-closed-form-tail (train/loop.py + ops/adam_tail.py)
matches a literal every-step Adam with zero gradients, and that the
sharded per-batch path reproduces it ungated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model
from chaorec_tpu.ops.adam_tail import tree_zero_grad_adam_tail
from chaorec_tpu.train.loop import _ADAM_B1, _ADAM_B2, _ADAM_EPS, Trainer


def _lattice_cfg():
    return Config(Model="LATTICE", batch_size=32, dim_E=16,
                  feature_embed=16, learning_rate=1e-3, reg_weight=1e-4,
                  n_layers=1, mm_layers=1, ii_topk=5, lambda_coeff=0.8,
                  num_epoch=1, seed=7)


def test_gate_count_tracks_every_batch(tiny_dataset):
    """The gated subtree's torch step count increments on EVERY batch
    (zero-grad batches included), exactly like the main Adam state."""
    cfg = _lattice_cfg()
    model = build_model(cfg, tiny_dataset)
    assert model.epoch0_params
    tr = Trainer(model, tiny_dataset, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tr.init_opt_state(params)

    params, opt_state, _, loss = tr.train_epoch(
        params, opt_state, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(loss))
    main_state, (gmu, gnu, gcount, glr) = opt_state
    n_batches = tiny_dataset.train_edges.shape[0] // cfg.batch_size
    assert n_batches >= 2
    assert int(gcount) == n_batches

    main_counts = [np.asarray(l) for l in jax.tree.leaves(main_state)
                   if np.asarray(l).dtype == np.int32
                   and np.asarray(l).ndim == 0]
    assert int(max(main_counts)) == n_batches

    params, opt_state, _, _ = tr.train_epoch(
        params, opt_state, jax.random.PRNGKey(2), 1)
    assert int(opt_state[1][2]) == 2 * n_batches


def test_gated_params_drift_off_batch0(tiny_dataset):
    """After one epoch the gated subtree has moved MORE than one real
    update's worth: the zero-grad tail applied n_batches-1 further
    momentum-decay steps (torch 1.11 set_to_none=False)."""
    cfg = _lattice_cfg()
    model = build_model(cfg, tiny_dataset)
    tr = Trainer(model, tiny_dataset, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tr.init_opt_state(params)
    before = {k: np.asarray(params[k]).copy() for k in model.epoch0_params}

    params, opt_state, _, _ = tr.train_epoch(
        params, opt_state, jax.random.PRNGKey(1), 0)
    _, (gmu, gnu, gcount, glr) = opt_state

    # Reconstruct the post-batch-0 value from the end-of-epoch state by
    # UNDOING the closed-form tail (run the tail forward from the
    # rolled-back moments and check it lands on the published params).
    n_tail = int(gcount) - 1
    assert n_tail >= 1
    mu0 = {k: np.asarray(gmu[k]) / (_ADAM_B1 ** n_tail)
           for k in model.epoch0_params}
    nu0 = {k: np.asarray(gnu[k]) / (_ADAM_B2 ** n_tail)
           for k in model.epoch0_params}
    # the tail moved the params: p_end != p_after_batch0 for a subtree
    # with nonzero batch-0 gradient
    moved_by_tail = False
    for k in ("image_trs_w", "text_trs_w"):
        p_end = np.asarray(params[k])
        # invert: p_after_batch0 = p_end + lr * mu0 * S  => differs from
        # p_end whenever mu0 != 0
        if np.abs(mu0[k]).max() > 0:
            tail_p, _, _ = tree_zero_grad_adam_tail(
                {k: jnp.asarray(p_end)}, {k: jnp.asarray(mu0[k])},
                {k: jnp.asarray(nu0[k])}, jnp.int32(1), n_tail,
                float(glr), _ADAM_B1, _ADAM_B2, _ADAM_EPS)
            assert not np.array_equal(p_end, np.asarray(tail_p[k]))
            moved_by_tail = True
    assert moved_by_tail
    # and the subtree moved overall from init
    assert any(not np.array_equal(before[k], np.asarray(params[k]))
               for k in model.epoch0_params)


def test_gate_plus_tail_matches_literal_zero_grad_adam():
    """The loop.py scheme (real Adam update on batch 0 + closed-form
    tail) == a literal optax adam stepping EVERY batch where batches
    1..N-1 carry zero gradients — the torch 1.11 trajectory."""
    rng = np.random.default_rng(0)
    shapes = {"w": (7, 5), "b": (5,)}
    p0 = {k: jnp.asarray(rng.normal(size=s), jnp.float32)
          for k, s in shapes.items()}
    g0 = {k: jnp.asarray(rng.normal(size=s), jnp.float32)
          for k, s in shapes.items()}
    lr, n_batches = 1e-3, 9

    # literal torch-1.11 loop: adam over every batch, g=0 off batch 0
    adam = optax.adam(lr, b1=_ADAM_B1, b2=_ADAM_B2, eps=_ADAM_EPS)
    st = adam.init(p0)
    p_ref = p0
    zeros = jax.tree.map(jnp.zeros_like, g0)
    for i in range(2 * n_batches):  # two epochs
        g = g0 if i % n_batches == 0 else zeros
        up, st = adam.update(g, st, p_ref)
        p_ref = optax.apply_updates(p_ref, up)

    # gated scheme: manual adam on batch 0, tail for the rest, twice
    p = p0
    mu = jax.tree.map(jnp.zeros_like, p0)
    nu = jax.tree.map(jnp.zeros_like, p0)
    count = 0
    for _ in range(2):
        count += 1
        t = float(count)
        new_p, new_mu, new_nu = {}, {}, {}
        for k in p:
            m = _ADAM_B1 * mu[k] + (1 - _ADAM_B1) * g0[k]
            v = _ADAM_B2 * nu[k] + (1 - _ADAM_B2) * g0[k] * g0[k]
            mhat = m / (1 - _ADAM_B1 ** t)
            vhat = v / (1 - _ADAM_B2 ** t)
            new_p[k] = p[k] - lr * mhat / (jnp.sqrt(vhat) + _ADAM_EPS)
            new_mu[k], new_nu[k] = m, v
        p, mu, nu = new_p, new_mu, new_nu
        p, mu, nu = tree_zero_grad_adam_tail(
            p, mu, nu, jnp.int32(count), n_batches - 1, lr,
            _ADAM_B1, _ADAM_B2, _ADAM_EPS)
        count += n_batches - 1

    for k in p:
        np.testing.assert_allclose(
            np.asarray(p[k]), np.asarray(p_ref[k]), rtol=2e-5, atol=1e-7)


def test_sharded_step_is_ungated(tiny_dataset):
    """The per-batch sharded path applies plain Adam to ALL params: on a
    batch with index != 0 the gated subtree still drifts (zero-grad
    momentum requires a warm moment, so prime it with a batch-0 step)."""
    from chaorec_tpu.models.base import Batch
    from chaorec_tpu.parallel.mesh import (
        init_stateful_opt_state,
        make_mesh,
        make_sharded_stateful_step,
    )

    cfg = _lattice_cfg()
    model = build_model(cfg, tiny_dataset)
    p = model.init_params(jax.random.PRNGKey(0))
    mstate = model.init_state(jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    step = make_sharded_stateful_step(model, opt, make_mesh(1))
    rs = np.random.default_rng(3)
    b = 32

    def mk_batch(index):
        return Batch(
            jnp.asarray(rs.integers(0, tiny_dataset.num_user, b), jnp.int32),
            jnp.asarray(rs.integers(0, tiny_dataset.num_item, b), jnp.int32),
            jnp.asarray(rs.integers(0, tiny_dataset.num_item, b), jnp.int32),
            jnp.ones((b,), jnp.float32), jnp.int32(index), None,
        )

    os0 = init_stateful_opt_state(model, opt, p)
    p1, os1, mstate, _ = step(p, os0, mstate, mk_batch(0),
                              jax.random.PRNGKey(4))
    gate_after_0 = {k: np.asarray(p1[k]).copy() for k in model.epoch0_params}
    p2, os2, mstate, _ = step(p1, os1, mstate, mk_batch(1),
                              jax.random.PRNGKey(5))
    drifted = any(
        not np.array_equal(gate_after_0[k], np.asarray(p2[k]))
        for k in ("image_trs_w", "text_trs_w"))
    assert drifted  # torch 1.11: zero-grad Adam still moves warm params


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
