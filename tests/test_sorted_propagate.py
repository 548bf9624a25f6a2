"""sorted_two_way_propagate == edge_propagate, values AND gradients.

The two-way layout exists purely so that per-batch dropout views (NGCF,
SGL) never emit an XLA scatter; the math must be identical to the
straightforward edge-space propagation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.graphs.dropout import (
    bernoulli_keep,
    build_two_way_arrays,
    edge_propagate,
    masked_edge_weights,
    sorted_masked_edge_weights,
    sorted_two_way_propagate,
)


@pytest.fixture(scope="module")
def problem():
    rs = np.random.default_rng(0)
    nu, ni, e = 37, 29, 400
    edges = np.unique(
        np.stack([rs.integers(0, nu, e), rs.integers(0, ni, e)], 1), axis=0
    )
    order = np.argsort(edges[:, 0], kind="stable")
    edge_u = jnp.asarray(edges[order, 0], jnp.int32)
    edge_i = jnp.asarray(edges[order, 1], jnp.int32)
    xu = jnp.asarray(rs.standard_normal((nu, 8)), jnp.float32)
    xi = jnp.asarray(rs.standard_normal((ni, 8)), jnp.float32)
    keep = bernoulli_keep(jax.random.PRNGKey(3), edge_u.shape[0], 0.8)
    return nu, ni, edge_u, edge_i, xu, xi, keep


@pytest.mark.parametrize("self_loops", [False, True])
def test_sorted_masked_weights_match(problem, self_loops):
    nu, ni, edge_u, edge_i, xu, xi, keep = problem
    arrs = build_two_way_arrays(edge_u, edge_i)
    w_ref, su_ref, si_ref = masked_edge_weights(
        edge_u, edge_i, keep, nu, ni, self_loops=self_loops)
    w, su, si = sorted_masked_edge_weights(
        keep, arrs, nu, ni, self_loops=self_loops)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-6)
    if self_loops:
        np.testing.assert_allclose(np.asarray(su), np.asarray(su_ref),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(si), np.asarray(si_ref),
                                   rtol=1e-6)


def test_forward_matches_edge_propagate(problem):
    nu, ni, edge_u, edge_i, xu, xi, keep = problem
    arrs = build_two_way_arrays(edge_u, edge_i)
    w, _, _ = masked_edge_weights(edge_u, edge_i, keep, nu, ni)
    ref_u, ref_i = edge_propagate(edge_u, edge_i, w, xu, xi, nu, ni)
    got_u, got_i = sorted_two_way_propagate(w, xu, xi, arrs)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_autodiff_reference(problem):
    nu, ni, edge_u, edge_i, xu, xi, keep = problem
    arrs = build_two_way_arrays(edge_u, edge_i)
    w0, _, _ = masked_edge_weights(edge_u, edge_i, keep, nu, ni)

    def loss_ref(w, xu, xi):
        a, b = edge_propagate(edge_u, edge_i, w, xu, xi, nu, ni)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(b) * 0.5)

    def loss_new(w, xu, xi):
        a, b = sorted_two_way_propagate(w, xu, xi, arrs)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(b) * 0.5)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(w0, xu, xi)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(w0, xu, xi)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_bf16_cast_close_to_fp32(problem):
    nu, ni, edge_u, edge_i, xu, xi, keep = problem
    arrs = build_two_way_arrays(edge_u, edge_i)
    w, _, _ = masked_edge_weights(edge_u, edge_i, keep, nu, ni)
    f_u, f_i = sorted_two_way_propagate(w, xu, xi, arrs)
    b_u, b_i = sorted_two_way_propagate(w, xu, xi, arrs, jnp.bfloat16)
    # bf16 has ~3 decimal digits; fp32 accumulation keeps the rest
    np.testing.assert_allclose(np.asarray(b_u), np.asarray(f_u),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(b_i), np.asarray(f_i),
                               rtol=2e-2, atol=2e-2)
