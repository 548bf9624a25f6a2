"""Graph library tests: normalized adjacency + propagation paths agree."""

import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.graphs.knn import build_knn_graph, build_sim
from chaorec_tpu.graphs.norm_adj import build_norm_adj

pytestmark = pytest.mark.fast


def _numpy_reference_propagate(edges, num_user, num_item, x_u, x_i, eps=1e-7):
    """Oracle: symmetric-normalized scatter-add, LightGCNConv semantics
    (Model/LightGCN.py:28-43 over the undirected bipartite edge set)."""
    du = np.bincount(edges[:, 0], minlength=num_user).astype(np.float64)
    di = np.bincount(edges[:, 1], minlength=num_item).astype(np.float64)
    w = 1.0 / np.sqrt((du[edges[:, 0]] + eps) * (di[edges[:, 1]] + eps))
    new_u = np.zeros_like(x_u)
    new_i = np.zeros_like(x_i)
    for (u, i), ww in zip(edges, w):
        new_u[u] += ww * x_i[i]
        new_i[i] += ww * x_u[u]
    return new_u, new_i


@pytest.mark.parametrize("use_dense", [True, False])
def test_propagate_matches_oracle(tiny_dataset, use_dense):
    ds = tiny_dataset
    rs = np.random.default_rng(3)
    x_u = rs.normal(size=(ds.num_user, 16)).astype(np.float32)
    x_i = rs.normal(size=(ds.num_item, 16)).astype(np.float32)
    g = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item, use_dense=use_dense)
    got_u, got_i = g.propagate(jnp.asarray(x_u), jnp.asarray(x_i))
    want_u, want_i = _numpy_reference_propagate(
        ds.train_edges, ds.num_user, ds.num_item, x_u, x_i
    )
    np.testing.assert_allclose(np.asarray(got_u), want_u, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=2e-4, atol=2e-5)


def test_dense_and_segment_paths_agree(tiny_dataset):
    ds = tiny_dataset
    rs = np.random.default_rng(4)
    x_u = jnp.asarray(rs.normal(size=(ds.num_user, 8)).astype(np.float32))
    x_i = jnp.asarray(rs.normal(size=(ds.num_item, 8)).astype(np.float32))
    gd = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item, use_dense=True)
    gs = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item, use_dense=False)
    du, di = gd.propagate(x_u, x_i)
    su, si = gs.propagate(x_u, x_i)
    np.testing.assert_allclose(np.asarray(du), np.asarray(su), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(di), np.asarray(si), rtol=1e-4, atol=1e-5)


def test_knn_graph_topk_neighbors():
    rs = np.random.default_rng(5)
    feats = jnp.asarray(rs.normal(size=(40, 12)).astype(np.float32))
    g = build_knn_graph(feats, topk=5)
    assert g.indices.shape == (40, 5)
    sim = np.asarray(build_sim(feats))
    for n in range(40):
        got = set(np.asarray(g.indices[n]).tolist())
        want = set(np.argsort(-sim[n])[:5].tolist())
        # top-k ties can reorder; require >= 4/5 agreement
        assert len(got & want) >= 4

    # Propagation = weighted neighbor sum.
    x = jnp.asarray(rs.normal(size=(40, 6)).astype(np.float32))
    out = np.asarray(g.propagate(x))
    n = 7
    want = sum(
        float(g.weights[n, j]) * np.asarray(x[int(g.indices[n, j])])
        for j in range(5)
    )
    np.testing.assert_allclose(out[n], want, rtol=1e-4, atol=1e-5)


def test_gather_weighted_sum_grads_match_naive():
    """Custom sorted-segment-sum VJP == autodiff of the naive einsum."""
    import jax
    import jax.numpy as jnp
    from chaorec_tpu.graphs.knn import gather_weighted_sum

    rs = np.random.default_rng(9)
    n_x, n, k, d = 17, 11, 4, 6
    x = jnp.asarray(rs.standard_normal((n_x, d)).astype(np.float32))
    w = jnp.asarray(rs.standard_normal((n, k)).astype(np.float32))
    idx = jnp.asarray(rs.integers(0, n_x, (n, k)).astype(np.int32))
    g = jnp.asarray(rs.standard_normal((n, d)).astype(np.float32))

    def naive(x, w):
        return jnp.einsum("nk,nkd->nd", w, x[idx])

    out = gather_weighted_sum(x, w, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive(x, w)),
                               rtol=1e-6)
    f_custom = lambda x, w: jnp.vdot(gather_weighted_sum(x, w, idx), g)
    f_naive = lambda x, w: jnp.vdot(naive(x, w), g)
    gx_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(x, w)
    gx_n, gw_n = jax.grad(f_naive, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n), rtol=1e-5)
