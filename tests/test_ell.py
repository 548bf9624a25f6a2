"""ELL spmm vs dense oracle: forward, VJP, overflow, learned-graph path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.graphs.norm_adj import build_norm_adj
from chaorec_tpu.ops.ell import (
    EllMatrix,
    auto_cap,
    ell_from_coo,
    ell_rows_matvec,
    topk_sym_norm_ell,
)

pytestmark = pytest.mark.fast


def _random_coo(rs, num_rows, num_cols, nnz):
    src = rs.integers(0, num_rows, nnz)
    dst = rs.integers(0, num_cols, nnz)
    w = rs.standard_normal(nnz).astype(np.float32)
    return src, dst, w


def _dense(src, dst, w, num_rows, num_cols):
    a = np.zeros((num_rows, num_cols), np.float32)
    np.add.at(a, (src, dst), w)
    return a


def test_ell_matvec_matches_dense_with_overflow(rng):
    num_rows, num_cols, d = 60, 45, 8
    src, dst, w = _random_coo(rng, num_rows, num_cols, 400)
    a = EllMatrix.from_coo(src, dst, w, num_rows, num_cols, cap=8)
    assert a.ov_dst.shape[0] > 0  # cap low enough to force overflow
    x = rng.standard_normal((num_cols, d)).astype(np.float32)
    dense = _dense(src, dst, w, num_rows, num_cols)
    np.testing.assert_allclose(
        np.asarray(a.matvec(jnp.asarray(x))), dense @ x, rtol=1e-5, atol=1e-5
    )
    # transposed orientation
    y = rng.standard_normal((num_rows, d)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(a.t.matvec(jnp.asarray(y))), dense.T @ y,
        rtol=1e-5, atol=1e-5,
    )


def test_ell_matvec_vjp_is_transpose(rng):
    num_rows, num_cols, d = 30, 22, 4
    src, dst, w = _random_coo(rng, num_rows, num_cols, 150)
    a = EllMatrix.from_coo(src, dst, w, num_rows, num_cols, cap=8)
    dense = _dense(src, dst, w, num_rows, num_cols)
    x = jnp.asarray(rng.standard_normal((num_cols, d)).astype(np.float32))

    def f(x):
        return (a.matvec(x) ** 2).sum()

    grad = jax.grad(f)(x)
    expected = 2 * dense.T @ (dense @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-4, atol=1e-4)


def test_ell_under_jit_as_pytree(rng):
    src, dst, w = _random_coo(rng, 16, 12, 50)
    a = EllMatrix.from_coo(src, dst, w, 16, 12)
    x = jnp.asarray(rng.standard_normal((12, 4)).astype(np.float32))
    jitted = jax.jit(lambda a, x: a.matvec(x))
    np.testing.assert_allclose(
        np.asarray(jitted(a, x)), np.asarray(a.matvec(x)), rtol=1e-6
    )


def test_auto_cap_cost_model():
    # 990 degree-1 rows + 10 degree-100 rows: padding everyone to 100
    # costs 100k gathered slots; K=8 costs 8k + overflow on 920 edges.
    deg = np.array([1] * 990 + [100] * 10)
    assert auto_cap(deg) == 8
    # huge overflow penalty forces max-degree padding
    assert auto_cap(deg, overflow_factor=1e6) == 104
    # uniform degree: K == degree rounded up to the sublane multiple
    assert auto_cap(np.full(100, 13)) == 16


def test_ell_from_coo_rank_placement():
    src = np.array([0, 0, 0, 2, 2])
    dst = np.array([5, 6, 7, 1, 2])
    w = np.ones(5, np.float32)
    idx, wm, ov_s, ov_d, ov_w = ell_from_coo(src, dst, w, 3, cap=2)
    assert idx.shape == (3, 8)  # cap rounds up to sublane multiple
    assert set(idx[0, :3].tolist()) == {5, 6, 7}
    assert wm[1].sum() == 0
    assert ov_s.shape == (4,) and ov_s[-1] == 0  # CSR ptr, empty overflow
    assert ov_d.shape[0] == 0


def test_graph_ell_path_matches_segment(rng, tiny_dataset):
    ds = tiny_dataset
    g_seg = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item,
                           use_dense=False, use_ell=False)
    g_ell = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item,
                           use_dense=False, use_ell=True)
    assert g_ell.ell is not None
    xu = jnp.asarray(rng.standard_normal((ds.num_user, 16)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((ds.num_item, 16)).astype(np.float32))
    u1, i1 = g_seg.propagate(xu, xi)
    u2, i2 = g_ell.propagate(xu, xi)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-4, atol=1e-5)


def test_topk_sym_norm_and_rows_matvec(rng):
    n, k, d = 20, 4, 6
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = f @ f.T
    vals, idx = jax.lax.top_k(jnp.asarray(sim), k)
    nv, ni = topk_sym_norm_ell(vals, idx)
    # Dense oracle: the reference's compute_normalized_laplacian
    # (Model/LATTICE.py:50-56) scales BOTH sides by row-sum degrees.
    a = np.zeros((n, n), np.float32)
    a[np.arange(n)[:, None], np.asarray(idx)] = np.asarray(vals)
    rd = np.maximum(a.sum(1), 1e-7) ** -0.5
    norm = a * rd[:, None] * rd[None, :]
    x = rng.standard_normal((n, d)).astype(np.float32)
    out = ell_rows_matvec(nv, ni, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), norm @ x, rtol=1e-4, atol=1e-5)

    # gradient flows through vals (learned-graph requirement)
    gv = jax.grad(lambda v: (ell_rows_matvec(v, ni, jnp.asarray(x)) ** 2).sum())(nv)
    assert np.isfinite(np.asarray(gv)).all() and np.abs(np.asarray(gv)).sum() > 0


def test_lattice_ell_item_adj_matches_dense_formula(rng, tiny_dataset):
    """LATTICE's ELL item_adj == the reference's dense mix formula."""
    import jax

    from chaorec_tpu.models.lattice import (
        LATTICE, dense_knn_sim, dense_norm_laplacian,
    )

    ds = tiny_dataset
    g = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item,
                       use_dense=True)
    m = LATTICE(ds.num_user, ds.num_item, g, jnp.asarray(ds.v_feat),
                jnp.asarray(ds.t_feat), 16, 16, 1e-3, 1, 1, 5, 0.3)
    params = m.init_params(jax.random.PRNGKey(0))
    vals, idx = m._build_item_adj(params)
    n = ds.num_item
    mat = np.zeros((n, n), np.float32)
    np.add.at(
        mat,
        (np.repeat(np.arange(n), idx.shape[1]), np.asarray(idx).ravel()),
        np.asarray(vals).ravel(),
    )
    w = jax.nn.softmax(params["modal_weight"])
    learned = dense_norm_laplacian(
        w[0] * dense_knn_sim(params["v_feat"] @ params["image_trs_w"].T
                             + params["image_trs_b"], 5)
        + w[1] * dense_knn_sim(params["t_feat"] @ params["text_trs_w"].T
                               + params["text_trs_b"], 5)
    )
    original = w[0] * dense_norm_laplacian(dense_knn_sim(jnp.asarray(ds.v_feat), 5)) \
        + w[1] * dense_norm_laplacian(dense_knn_sim(jnp.asarray(ds.t_feat), 5))
    expected = (1 - 0.3) * np.asarray(learned) + 0.3 * np.asarray(original)
    np.testing.assert_allclose(mat, expected, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# seg_sum / seg_gather: scatter-free segmented reduction (MHRec attention)
# ---------------------------------------------------------------------------

def test_seg_sum_matches_scatter_and_grads(rng):
    from chaorec_tpu.ops.ell import (build_segment_transpose, seg_gather,
                                     seg_sum)

    rs = np.random.default_rng(7)
    m, n, d = 513, 37, 5
    idx = jnp.asarray(rs.integers(0, n, m), jnp.int32)
    vals = jnp.asarray(rs.standard_normal((m, d)), jnp.float32)
    perm, ptr = build_segment_transpose(idx, n)

    ref = jnp.zeros((n, d)).at[idx].add(vals)
    got = seg_sum(vals, idx, perm, ptr)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # 1-D values path
    v1 = jnp.asarray(rs.standard_normal(m), jnp.float32)
    ref1 = jnp.zeros((n,)).at[idx].add(v1)
    np.testing.assert_allclose(seg_sum(v1, idx, perm, ptr), ref1,
                               rtol=1e-5, atol=1e-5)

    # custom VJP == autodiff of the scatter formulation
    def f_new(v):
        return jnp.sum(jnp.sin(seg_sum(v, idx, perm, ptr)))

    def f_ref(v):
        return jnp.sum(jnp.sin(jnp.zeros((n, d)).at[idx].add(v)))

    np.testing.assert_allclose(jax.grad(f_new)(vals), jax.grad(f_ref)(vals),
                               rtol=1e-5, atol=1e-5)

    # seg_gather fwd == take; bwd == segment-sum of cotangents
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    np.testing.assert_allclose(seg_gather(x, idx, perm, ptr), x[idx])

    def g_new(x):
        return jnp.sum(jnp.cos(seg_gather(x, idx, perm, ptr)))

    def g_ref(x):
        return jnp.sum(jnp.cos(x[idx]))

    np.testing.assert_allclose(jax.grad(g_new)(x), jax.grad(g_ref)(x),
                               rtol=1e-5, atol=1e-5)


def test_mhrec_hyper_attn_scatter_free_matches_reference(rng):
    """The layout-based _hyper_attn must equal the direct scatter
    formulation (value and gradient)."""
    from chaorec_tpu.models.mhrec import MHRec

    rs = np.random.default_rng(3)
    nu, ni, e, he, k = 11, 17, 8, 29, 4
    num_nodes = nu + ni
    model = MHRec.__new__(MHRec)
    model.num_user, model.num_item = nu, ni
    model.num_nodes = num_nodes

    h_nodes = jnp.asarray(rs.integers(0, num_nodes, (he, k)), jnp.int32)
    x = jnp.asarray(rs.standard_normal((num_nodes, e)), jnp.float32)
    a = jnp.asarray(rs.standard_normal((2 * e, 1)) * 0.1, jnp.float32)
    layout = model.build_layout(h_nodes)

    def scatter_ref(a, x):
        edge_emb = jnp.sum(x[h_nodes], axis=1)
        xi = x[h_nodes]
        ej = jnp.broadcast_to(edge_emb[:, None, :], xi.shape)
        es = (jnp.concatenate([xi, ej], axis=-1) @ a)[..., 0]
        e_exp = jnp.exp(es)
        flat = h_nodes.reshape(-1)
        sums = jnp.zeros((num_nodes,)).at[flat].add(e_exp.reshape(-1))
        alpha = e_exp / (sums[h_nodes] + 1e-16)
        msg = (alpha[..., None] * ej).reshape(-1, e)
        return jnp.zeros_like(x).at[flat].add(msg)

    got = model._hyper_attn(a, h_nodes, layout, x)
    ref = scatter_ref(a, x)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    ga, gx = jax.grad(
        lambda a, x: jnp.sum(model._hyper_attn(a, h_nodes, layout, x) ** 2),
        argnums=(0, 1))(a, x)
    ra, rx = jax.grad(
        lambda a, x: jnp.sum(scatter_ref(a, x) ** 2), argnums=(0, 1))(a, x)
    # tolerance scaled to the gradient's magnitude: fp32 prefix-sum
    # reordering leaves ~1e-5-relative noise on near-zero entries
    for g, r in ((ga, ra), (gx, rx)):
        scale = float(jnp.abs(r).max())
        np.testing.assert_allclose(g, r, rtol=1e-3, atol=2e-5 * scale)

    # bf16 message path (graph_compute_dtype knob): scores/softmax stay
    # fp32, only the (M, D) slot traffic drops to bf16 — values track the
    # fp32 reference within bf16 resolution, gradients stay finite and
    # directionally aligned.
    model.sample_dtype = jnp.bfloat16
    got16 = model._hyper_attn(a, h_nodes, layout, x)
    assert got16.dtype == x.dtype
    np.testing.assert_allclose(got16, ref, rtol=2e-2, atol=2e-2)
    ga16, gx16 = jax.grad(
        lambda a, x: jnp.sum(model._hyper_attn(a, h_nodes, layout, x) ** 2),
        argnums=(0, 1))(a, x)
    for g, r in ((ga16, ra), (gx16, rx)):
        assert bool(jnp.all(jnp.isfinite(g)))
        cos = jnp.sum(g * r) / (
            jnp.linalg.norm(g) * jnp.linalg.norm(r) + 1e-12)
        assert float(cos) > 0.999


def test_seg_prop_matches_segment_sum_and_grad():
    """The seg_gather/seg_sum propagation used by AdaGCL/GRADE/DCCF/DGCF
    must match jax.ops.segment_sum in value AND gradient (the r2 NaN
    incident came from feeding its output into rsqrt — that usage is now
    banned, but the message-propagation equivalence itself is pinned
    here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chaorec_tpu.ops.ell import build_segment_transpose, seg_gather, seg_sum

    rs = np.random.default_rng(3)
    n, e, d = 37, 250, 12
    src = jnp.asarray(rs.integers(0, n, e))
    dst = jnp.asarray(rs.integers(0, n, e))
    w = jnp.asarray(rs.standard_normal(e), jnp.float32)
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    ps, rps = build_segment_transpose(src, n)
    pd, rpd = build_segment_transpose(dst, n)

    def new(x_, w_):
        return seg_sum(w_[:, None] * seg_gather(x_, src, ps, rps),
                       dst, pd, rpd)

    def old(x_, w_):
        return jax.ops.segment_sum(w_[:, None] * x_[src], dst,
                                   num_segments=n)

    np.testing.assert_allclose(np.asarray(new(x, w)), np.asarray(old(x, w)),
                               rtol=2e-5, atol=2e-5)
    gn = jax.grad(lambda x_, w_: jnp.sum(new(x_, w_) ** 2), argnums=(0, 1))(x, w)
    go = jax.grad(lambda x_, w_: jnp.sum(old(x_, w_) ** 2), argnums=(0, 1))(x, w)
    for a, b in zip(gn, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# seg_sum numerics rule (ops/ell.py CAVEAT, VERDICT r2 item 8)
#
# A segment's sum under ``seg_sum`` is the difference of two global fp32
# prefix values, so its ABSOLUTE error scales with the global running
# total — for NON-NEGATIVE values (degrees, exp-sums) the total grows
# linearly and a downstream ``rsqrt``/division amplifies the error.
# These tests (a) pin that error model so the rule stays evidence-backed,
# and (b) fail if the rsqrt/softmax-denominator call sites that commit
# ef0dbc9 moved to ``jax.ops.segment_sum`` are ever re-routed.
# ---------------------------------------------------------------------------


def _nonneg_reduction(n_edges=300_000, n_seg=4096, seed=11):
    rs = np.random.default_rng(seed)
    idx = jnp.asarray(np.sort(rs.integers(0, n_seg, n_edges)), jnp.int32)
    vals = jnp.asarray(rs.uniform(0.5, 1.5, n_edges), jnp.float32)
    exact = np.zeros(n_seg, np.float64)
    np.add.at(exact, np.asarray(idx), np.asarray(vals, np.float64))
    return idx, vals, exact, n_seg


def test_seg_sum_caveat_error_model_holds():
    """Non-negative reductions: seg_sum's error is orders of magnitude
    above segment_sum's at 3e5-edge scale. If this ever FAILS because
    seg_sum got accurate, the CAVEAT (and the guard below) can be
    re-evaluated — until then the rule stands on measurement."""
    from chaorec_tpu.ops.ell import build_segment_transpose, seg_sum

    idx, vals, exact, n_seg = _nonneg_reduction()
    perm, ptr = build_segment_transpose(idx, n_seg)
    via_scan = np.asarray(seg_sum(vals, idx, perm, ptr), np.float64)
    via_scatter = np.asarray(
        jax.ops.segment_sum(vals, idx, num_segments=n_seg), np.float64)

    err_scan = np.abs(via_scan - exact).max()
    err_scatter = np.abs(via_scatter - exact).max()
    # segment_sum accumulates per segment (~75 values) — stays tiny.
    assert err_scatter < 1e-3, err_scatter
    # the prefix trick's error rides the ~3e5 global total.
    assert err_scan > 10 * err_scatter, (err_scan, err_scatter)


def test_adagcl_g2_renorm_degree_sums_stay_accurate():
    """Functional guard on the real AdaGCL._g2_renorm code path at a
    scale where routing the degree sum through seg_sum visibly breaks
    d**-0.5 (netfilx-scale edge counts). Self-calibrating: the evil
    (seg_sum-routed) variant is computed alongside and must violate the
    tolerance that the production path meets."""
    from types import SimpleNamespace

    from chaorec_tpu.models.adagcl import AdaGCL
    from chaorec_tpu.ops.ell import build_segment_transpose, seg_sum

    rs = np.random.default_rng(3)
    n_nodes, n_edges = 30_000, 300_000
    src = jnp.asarray(rs.integers(0, n_nodes, n_edges), jnp.int32)
    dst = jnp.asarray(rs.integers(0, n_nodes, n_edges), jnp.int32)
    mask = jnp.asarray(rs.uniform(0.3, 1.0, n_edges), jnp.float32)
    fake = SimpleNamespace(src=src, dst=dst, n_nodes=n_nodes)

    got = np.asarray(AdaGCL._g2_renorm(fake, mask), np.float64)

    d = np.zeros(n_nodes, np.float64)
    np.add.at(d, np.asarray(dst), np.asarray(mask, np.float64))
    dis = np.clip((d + 1e-6) ** -0.5, 0.0, 10.0)
    oracle = np.asarray(mask, np.float64) * dis[np.asarray(src)] * dis[np.asarray(dst)]

    tol = 1e-4  # max |renormalized weight| error allowed through rsqrt
    assert np.abs(got - oracle).max() < tol

    # Evil re-route: the same site with the degree sum on seg_sum. It
    # must *fail* the tolerance, proving the guard above discriminates.
    perm, ptr = build_segment_transpose(dst, n_nodes)
    d_scan = seg_sum(mask, dst, perm, ptr) + 1e-6
    dis_scan = jnp.clip(d_scan ** -0.5, 0.0, 10.0)
    evil = np.asarray(mask * dis_scan[src] * dis_scan[dst], np.float64)
    assert np.abs(evil - oracle).max() > tol, (
        "seg_sum became accurate enough here — re-evaluate the CAVEAT")


def test_denominator_call_sites_source_guard():
    """The softmax/exp-sum denominators re-routed in ef0dbc9 must keep
    using jax.ops.segment_sum (scatter of scalars — cheap and accurate);
    only zero-mean (M, D) message reductions ride seg_sum."""
    import inspect
    import re

    from chaorec_tpu.models.adagcl import AdaGCL
    from chaorec_tpu.models.mgat import MGAT
    from chaorec_tpu.models.mhrec import MHRec
    from chaorec_tpu.ops import edge_softmax

    bare_seg_sum = re.compile(r"(?<!segment_)\bseg_sum\s*\(")

    src = inspect.getsource(AdaGCL._g2_renorm)
    assert "jax.ops.segment_sum" in src
    assert not bare_seg_sum.search(src)

    src = inspect.getsource(edge_softmax.segment_softmax)
    assert "jax.ops.segment_sum" in src
    assert not bare_seg_sum.search(src)

    # MGAT's attention weights come from segment_softmax (above).
    assert "segment_softmax" in inspect.getsource(MGAT._gat)

    # MHRec._hyper_attn legitimately uses seg_sum for the (M, D) message
    # reduction; the scalar e_exp denominator must stay on segment_sum.
    src = inspect.getsource(MHRec._hyper_attn)
    m = re.search(r"jax\.ops\.segment_sum\(\s*\n?\s*e_exp", src)
    assert m, "MHRec softmax denominator no longer on jax.ops.segment_sum"


def test_lattice_dense_bf16_item_graph_matches_ell(rng, tiny_dataset):
    """The GUME dense-bf16 crossover applied to LATTICE's learned (I, I)
    propagation (VERDICT r2 item 5): the dense-mode model's build +
    forward equal the exact ELL-fp32 path to bf16 tolerance."""
    import jax

    from chaorec_tpu.models.lattice import LATTICE

    ds = tiny_dataset
    g = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item,
                       use_dense=True)
    args = (ds.num_user, ds.num_item, g, jnp.asarray(ds.v_feat),
            jnp.asarray(ds.t_feat), 16, 16, 1e-3, 1, 1, 5, 0.3)
    m_ell = LATTICE(*args, compute_dtype="float32")
    m_dense = LATTICE(*args, compute_dtype="bfloat16")
    assert not m_ell.dense_items and m_dense.dense_items

    params = m_ell.init_params(jax.random.PRNGKey(0))
    adj_e = m_ell._build_item_adj(params)
    adj_d = m_dense._build_item_adj(params)
    assert adj_d.dtype == jnp.bfloat16

    fu_e, fi_e = m_ell._forward(params, adj_e)
    fu_d, fi_d = m_dense._forward(params, adj_d)
    np.testing.assert_allclose(np.asarray(fu_d), np.asarray(fu_e),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fi_d), np.asarray(fi_e),
                               rtol=2e-2, atol=2e-2)

    # gradients still flow into the projections through the dense build
    def loss_d(pp):
        fu, fi = m_dense._forward(pp, m_dense._build_item_adj(pp))
        return jnp.sum(fu ** 2) + jnp.sum(fi ** 2)

    g_d = jax.grad(loss_d)(params)
    assert float(jnp.abs(g_d["image_trs_w"]).max()) > 0.0
    assert float(jnp.abs(g_d["modal_weight"]).max()) > 0.0


def test_ellp_edge_primitives_match_plain_indexing():
    """ellp_pair_inner / ellp_row_expand / ellp_col_expand (the GRCN
    scatter-free attention algebra) must equal plain advanced indexing
    in value AND gradient."""
    from chaorec_tpu.ops.ell import (EllPattern, ellp_col_expand,
                                     ellp_pair_inner, ellp_row_expand)

    rs = np.random.default_rng(11)
    n, e, d = 37, 180, 16
    rows = rs.integers(0, n, e)
    cols = rs.integers(0, n, e)
    p = EllPattern.from_coo(rows, cols, n, n)
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    vals = jnp.asarray(rs.standard_normal(n), jnp.float32)
    g_e = jnp.asarray(rs.standard_normal(e), jnp.float32)
    rj, cj = jnp.asarray(rows), jnp.asarray(cols)

    # pair_inner: value + x-gradient
    np.testing.assert_allclose(
        ellp_pair_inner(p, x), jnp.sum(x[rj] * x[cj], axis=1),
        rtol=1e-5, atol=1e-5)
    got = jax.grad(lambda x_: jnp.sum(ellp_pair_inner(p, x_) * g_e))(x)
    want = jax.grad(
        lambda x_: jnp.sum(jnp.sum(x_[rj] * x_[cj], 1) * g_e))(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # row/col expand: value + vals-gradient
    for fn, idx in ((ellp_row_expand, rj), (ellp_col_expand, cj)):
        np.testing.assert_allclose(fn(p, vals), vals[idx],
                                   rtol=1e-6, atol=1e-6)
        got = jax.grad(lambda v: jnp.sum(fn(p, v) * g_e))(vals)
        want = jax.grad(lambda v: jnp.sum(v[idx] * g_e))(vals)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grcn_scatter_free_forward_matches_plain():
    """GRCN's rewritten _cgcn + gated edge weights must equal the plain
    advanced-indexing formulation (value and a full-loss gradient)."""
    from chaorec_tpu.models.grcn import GRCN
    from chaorec_tpu.graphs.norm_adj import build_norm_adj

    rs = np.random.default_rng(5)
    nu, ni, e = 13, 19, 60
    edges = np.stack([rs.integers(0, nu, e),
                      rs.integers(0, ni, e)], 1)
    edges = np.unique(edges, axis=0)
    g = build_norm_adj(jnp.asarray(edges), nu, ni, use_dense=False)
    v_feat = jnp.asarray(rs.standard_normal((ni, 24)), jnp.float32)
    t_feat = jnp.asarray(rs.standard_normal((ni, 12)), jnp.float32)
    m = GRCN(nu, ni, g, v_feat, t_feat, 8, 8, 1e-3, 0.0, 3)
    params = m.init_params(jax.random.PRNGKey(0))

    def plain_forward(params):
        pat = m.pat

        def cgcn(mod, feat):
            f = jax.nn.leaky_relu(
                feat @ params[f"{mod}_mlp_w"].T + params[f"{mod}_mlp_b"],
                0.01)
            from chaorec_tpu.ops.losses import l2norm
            x = jnp.concatenate(
                [l2norm(params[f"{mod}_preference"]), l2norm(f)], 0)
            inner = jnp.sum(x[pat.rows] * x[pat.cols], axis=1)
            ee = jnp.exp(inner)
            denom = jnp.zeros(
                (m.n_nodes,), jnp.float32).at[pat.rows].add(ee)
            alpha = ee / jnp.maximum(denom, 1e-16)[pat.rows]
            out = jnp.zeros_like(x).at[pat.rows].add(
                alpha[:, None] * x[pat.cols])
            return x + jax.nn.leaky_relu(out, 0.01), alpha

        v_rep, av = cgcn("v", v_feat)
        t_rep, at = cgcn("t", t_feat)
        conf = params["model_specific_conf"][pat.cols]
        w_edge = jax.nn.relu(
            jnp.max(jnp.stack([av, at], 1) * conf, axis=1))
        from chaorec_tpu.ops.losses import l2norm
        x = l2norm(params["id_embedding"])
        x1 = jax.nn.leaky_relu(
            jnp.zeros_like(x).at[pat.rows].add(
                w_edge[:, None] * x[pat.cols]), 0.01)
        x2 = jax.nn.leaky_relu(
            jnp.zeros_like(x).at[pat.rows].add(
                w_edge[:, None] * x1[pat.cols]), 0.01)
        rep = jnp.concatenate([x + x1 + x2, v_rep, t_rep], 1)
        return rep[:nu], rep[nu:]

    fu, fi = m.forward(params)
    ru, ri = plain_forward(params)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(ru),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(ri),
                               rtol=2e-5, atol=2e-5)

    def l_new(pp):
        a, b = m.forward(pp)
        return jnp.sum(a ** 2) + jnp.sum(jnp.sin(b))

    def l_ref(pp):
        a, b = plain_forward(pp)
        return jnp.sum(a ** 2) + jnp.sum(jnp.sin(b))

    gn = jax.grad(l_new)(params)
    gr = jax.grad(l_ref)(params)
    for k in gr:
        scale = max(float(jnp.abs(gr[k]).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gn[k]), np.asarray(gr[k]),
            rtol=1e-3, atol=2e-5 * scale, err_msg=k)


def test_grcn_packed_cgcn_matches_unfused(rng):
    """The lane-packed v/t CGCN path (_cgcn_packed over a (N, 2D) table,
    ellp_pair_inner_grouped / ellp_matvec_grouped) must reproduce the
    per-modality _cgcn values, alphas, losses, and gradients."""
    import numpy as np

    from chaorec_tpu.graphs.norm_adj import BipartiteGraph
    from chaorec_tpu.models.base import Batch
    from chaorec_tpu.models.grcn import GRCN

    rs = np.random.RandomState(0)
    nu, ni, e, dc = 40, 30, 180, 8
    eu = rs.randint(0, nu, e).astype(np.int32)
    ei = rs.randint(0, ni, e).astype(np.int32)
    from chaorec_tpu.graphs.norm_adj import build_norm_adj

    g = build_norm_adj(np.stack([eu, ei], 1), nu, ni)
    vf = jnp.asarray(rs.normal(size=(ni, 12)).astype(np.float32))
    tf = jnp.asarray(rs.normal(size=(ni, 6)).astype(np.float32))
    model = GRCN(nu, ni, g, vf, tf, dim_E=8, dim_C=dc, reg_weight=1e-3,
                 dropout=0.0, num_routing=2)
    params = model.init_params(jax.random.PRNGKey(1))
    keep2 = jnp.ones((2 * e,), jnp.float32)

    vr0, av0 = model._cgcn(params, "v", vf, keep2)
    tr0, at0 = model._cgcn(params, "t", tf, keep2)
    vr1, tr1, av1, at1 = model._cgcn_packed(params, keep2)
    np.testing.assert_allclose(vr1, vr0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tr1, tr0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(av1, av0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(at1, at0, rtol=1e-5, atol=1e-6)

    batch = Batch(jnp.asarray(rs.randint(0, nu, 16)),
                  jnp.asarray(rs.randint(0, ni, 16)),
                  jnp.asarray(rs.randint(0, ni, 16)),
                  jnp.ones((16,), jnp.float32))

    def loss_with(packed):
        model._packed = packed
        return lambda p: model.loss(p, batch, None)

    l0, g0 = jax.value_and_grad(loss_with(False))(params)
    l1, g1 = jax.value_and_grad(loss_with(True))(params)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for k in g0:
        scale = float(jnp.abs(g0[k]).max()) + 1e-12
        np.testing.assert_allclose(
            g1[k], g0[k], rtol=1e-4, atol=1e-5 * scale, err_msg=k)
