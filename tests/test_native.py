"""Native host runtime (libchaorec_host) vs numpy-fallback parity.

Every native entry point must produce exactly what its numpy fallback
produces (same dtypes, same stable orderings, same deterministic RNG
streams), so callers can treat the two paths as interchangeable.
"""

import numpy as np
import pytest

from chaorec_tpu import native

pytestmark = pytest.mark.fast


def _random_bipartite(rng, num_user=97, num_item=53, e=600):
    edges = np.stack(
        [rng.integers(0, num_user, e), rng.integers(0, num_item, e)], axis=1
    ).astype(np.int32)
    return np.unique(edges, axis=0)


def _csr_from_edges(edges, num_user):
    order = np.argsort(edges[:, 0], kind="stable")
    items = edges[order, 1].astype(np.int32)
    counts = np.bincount(edges[:, 0], minlength=num_user)
    indptr = np.zeros(num_user + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    # sort within rows for binary-search use
    for u in range(num_user):
        items[indptr[u] : indptr[u + 1]].sort()
    return indptr, items


needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed"
)


@needs_native
def test_build_adj_matches_numpy():
    rng = np.random.default_rng(0)
    edges = _random_bipartite(rng)
    nu, ni = 97, 53
    got = native.build_adj(edges, nu, ni)

    du = np.bincount(edges[:, 0], minlength=nu).astype(np.float32)
    di = np.bincount(edges[:, 1], minlength=ni).astype(np.float32)
    w = (
        1.0 / np.sqrt((du[edges[:, 0]] + np.float32(1e-7)) * (di[edges[:, 1]] + np.float32(1e-7)))
    ).astype(np.float32)
    order_u = np.argsort(edges[:, 0], kind="stable").astype(np.int32)
    order_i = np.argsort(edges[:, 1], kind="stable").astype(np.int32)

    np.testing.assert_array_equal(got[0], du)
    np.testing.assert_array_equal(got[1], di)
    np.testing.assert_allclose(got[2], w, rtol=1e-6)
    np.testing.assert_array_equal(got[3], order_u)
    np.testing.assert_array_equal(got[4], order_i)


@needs_native
def test_build_adj_rejects_out_of_range():
    edges = np.array([[0, 99]], np.int32)
    with pytest.raises(ValueError):
        native.build_adj(edges, 4, 5)


@needs_native
def test_fill_dense_matches_scatter_add():
    rng = np.random.default_rng(1)
    edges = _random_bipartite(rng, 41, 29, 300)
    du, di, w, order_u, order_i = native.build_adj(edges, 41, 29)
    r = native.fill_dense(edges, order_u, w, 41, 29, n_threads=4)
    ref = np.zeros((41, 29), np.float32)
    np.add.at(ref, (edges[:, 0], edges[:, 1]), w)
    np.testing.assert_allclose(r, ref, rtol=1e-6)


@needs_native
@pytest.mark.parametrize("sort_rows", [False, True])
def test_pad_ragged(sort_rows):
    rng = np.random.default_rng(2)
    rows = [rng.integers(0, 1000, rng.integers(0, 9)).astype(np.int32) for _ in range(37)]
    indptr = np.zeros(38, np.int64)
    np.cumsum([len(r) for r in rows], out=indptr[1:])
    values = np.concatenate(rows) if rows else np.zeros(0, np.int32)
    out, lens = native.pad_ragged(indptr, values, width=6, fill=-7,
                                  sort_rows=sort_rows, n_threads=3)
    assert out.shape == (37, 6)
    for i, r in enumerate(rows):
        n = min(len(r), 6)
        assert lens[i] == n
        exp = np.sort(r[:n]) if sort_rows else r[:n]
        np.testing.assert_array_equal(out[i, :n], exp)
        assert (out[i, n:] == -7).all()


@needs_native
@pytest.mark.parametrize("weighted", [False, True])
def test_uu_topk_matches_fallback(weighted, monkeypatch):
    rng = np.random.default_rng(3)
    edges = _random_bipartite(rng, 60, 25, 400)
    user_indptr, user_items = _csr_from_edges(edges, 60)
    item_indptr, item_users = _csr_from_edges(edges[:, ::-1], 25)

    ids_n, w_n = native.uu_topk(user_indptr, user_items, item_indptr,
                                item_users, 60, k=5, weighted=weighted)
    monkeypatch.setenv("CHAOREC_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    ids_p, w_p = native.uu_topk(user_indptr, user_items, item_indptr,
                                item_users, 60, k=5, weighted=weighted)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_allclose(w_n, w_p, rtol=1e-6)


@needs_native
def test_uu_topk_brute_force_small():
    # 4 users, items: u0={0,1}, u1={1,2}, u2={0,1,2}, u3={5}
    edges = np.array(
        [[0, 0], [0, 1], [1, 1], [1, 2], [2, 0], [2, 1], [2, 2], [3, 5]],
        np.int32,
    )
    user_indptr, user_items = _csr_from_edges(edges, 4)
    item_indptr, item_users = _csr_from_edges(edges[:, ::-1], 6)
    ids, w = native.uu_topk(user_indptr, user_items, item_indptr, item_users,
                            4, k=2, weighted=False)
    # raw co counts: co(0,2)=2, co(0,1)=1 ; co(1,2)=2 ; u3 isolated
    np.testing.assert_array_equal(ids[0], [2, 1])
    np.testing.assert_array_equal(w[0], [2.0, 1.0])
    np.testing.assert_array_equal(ids[3], [-1, -1])


@needs_native
def test_sample_negatives_matches_fallback_and_avoids_history(monkeypatch):
    rng = np.random.default_rng(4)
    edges = _random_bipartite(rng, 30, 12, 200)
    indptr, items = _csr_from_edges(edges, 30)
    users = rng.integers(0, 30, 500).astype(np.int32)

    neg_n = native.sample_negatives(indptr, items, users, 12, seed=99,
                                    n_threads=4)
    # avoid-history property (num_item=12 small => near-certain within 64 tries
    # for users with < 12 items)
    for s, u in enumerate(users):
        hist = items[indptr[u] : indptr[u + 1]]
        if len(hist) < 12:
            assert neg_n[s] not in hist

    monkeypatch.setenv("CHAOREC_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    neg_p = native.sample_negatives(indptr, items, users[:50], 12, seed=99)
    np.testing.assert_array_equal(neg_n[:50], neg_p)


def test_user_cooccurrence_sparse_matches_dense():
    """The native sparse path and the MXU dense path agree on neighbor sets
    and counts (order may differ only among equal-count ties)."""
    from chaorec_tpu.graphs.user_graph import build_user_cooccurrence

    rng = np.random.default_rng(7)
    edges = np.unique(
        np.stack([rng.integers(0, 40, 500), rng.integers(0, 30, 500)], 1), axis=0
    ).astype(np.int32)
    idx_d, cnt_d, len_d = build_user_cooccurrence(edges, 40, 30, topk=8)
    idx_s, cnt_s, len_s = build_user_cooccurrence(
        edges, 40, 30, topk=8, dense_threshold=0
    )
    np.testing.assert_array_equal(len_d, len_s)
    for u in range(40):
        n = len_d[u]
        np.testing.assert_allclose(
            np.sort(cnt_d[u, :n]), np.sort(cnt_s[u, :n]), rtol=1e-6
        )
        # per distinct count value, the neighbor *sets* must agree
        d = {}
        for i, c in zip(idx_d[u, :n], cnt_d[u, :n]):
            d.setdefault(float(c), set()).add(int(i))
        s = {}
        for i, c in zip(idx_s[u, :n], cnt_s[u, :n]):
            s.setdefault(float(c), set()).add(int(i))
        # boundary tie-groups may be truncated differently; compare
        # non-boundary groups exactly and boundary group by size
        min_c = float(cnt_d[u, :n].min()) if n else None
        for c, mem in d.items():
            if c == min_c:
                assert len(mem) == len(s[c])
            else:
                assert mem == s[c]
