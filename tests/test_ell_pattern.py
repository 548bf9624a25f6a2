"""EllPattern (fixed topology, traced weights) vs segment-op oracles.

The GAT-family propagation (GRCN Model/GRCN.py:21-45, MGAT) needs
per-step edge weights over a fixed graph; EllPattern lowers both the
forward and the VJP to gathers. These tests pin exact agreement with
jax.ops.segment_sum in forward, x-grad, and w-grad, including rows that
overflow the ELL cap and empty rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.ops.ell import EllPattern


def _random_graph(rng, num_rows, num_cols, e):
    rows = rng.integers(0, num_rows, size=e)
    # skew: pile half the edges onto row 0 to force overflow past the cap
    rows[: e // 2] = 0
    cols = rng.integers(0, num_cols, size=e)
    return rows.astype(np.int64), cols.astype(np.int64)


@pytest.mark.fast
def test_weighted_matvec_matches_segment_sum():
    rng = np.random.default_rng(0)
    num_rows, num_cols, e, d = 37, 23, 500, 8
    rows, cols = _random_graph(rng, num_rows, num_cols, e)
    p = EllPattern.from_coo(rows, cols, num_rows, num_cols)
    assert p.ov_col.shape[0] > 0  # the skewed row really overflows

    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(num_cols, d)).astype(np.float32))
    got = p.weighted_matvec(w, x)
    want = jax.ops.segment_sum(w[:, None] * x[jnp.asarray(cols)],
                               jnp.asarray(rows), num_segments=num_rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    rs = p.weighted_rowsum(w)
    want_rs = jax.ops.segment_sum(w, jnp.asarray(rows),
                                  num_segments=num_rows)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(want_rs),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_weighted_matvec_grads_match_autodiff_reference():
    rng = np.random.default_rng(1)
    num_rows, num_cols, e, d = 29, 31, 400, 4
    rows, cols = _random_graph(rng, num_rows, num_cols, e)
    p = EllPattern.from_coo(rows, cols, num_rows, num_cols)
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(num_cols, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(num_rows, d)).astype(np.float32))

    def ours(w, x):
        return jnp.sum(p.weighted_matvec(w, x) * tgt)

    def ref(w, x):
        agg = jax.ops.segment_sum(w[:, None] * x[jnp.asarray(cols)],
                                  jnp.asarray(rows),
                                  num_segments=num_rows)
        return jnp.sum(agg * tgt)

    gw, gx = jax.grad(ours, argnums=(0, 1))(w, x)
    rw, rx = jax.grad(ref, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)

    def ours_rs(w):
        return jnp.sum(p.weighted_rowsum(w) * tgt[:, 0])

    def ref_rs(w):
        return jnp.sum(jax.ops.segment_sum(
            w, jnp.asarray(rows), num_segments=num_rows) * tgt[:, 0])

    np.testing.assert_allclose(np.asarray(jax.grad(ours_rs)(w)),
                               np.asarray(jax.grad(ref_rs)(w)),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_pattern_roundtrips_as_pytree():
    rng = np.random.default_rng(2)
    rows, cols = _random_graph(rng, 11, 13, 60)
    p = EllPattern.from_coo(rows, cols, 11, 13)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    p2 = jax.tree_util.tree_unflatten(treedef, leaves)
    w = jnp.asarray(rng.normal(size=60).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(13, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(p.weighted_matvec(w, x)),
                                  np.asarray(p2.weighted_matvec(w, x)))
