"""Golden tests: vectorized metrics vs the reference's per-user semantics.

The oracle below reimplements, in plain Python, exactly the formulas of the
reference's metrics.py:13-57 (natural-log NDCG discount, MAP divided by
len(test_list), hit-rate as set-intersection boolean) and the aggregation
of utils.gene_metrics (utils.py:112-139, average over all rows).
"""

import math

import numpy as np
import pytest

from chaorec_tpu.eval.metrics import compute_metrics

pytestmark = pytest.mark.fast


# ---- oracle: reference semantics (metrics.py:13-57) ----
def _precision(ranked, truth, k):
    return len(set(ranked[:k]) & set(truth)) / k


def _recall(ranked, truth, k):
    if len(truth) == 0:
        return 0
    return len(set(ranked[:k]) & set(truth)) / len(truth)


def _ndcg(ranked, truth, k):
    if not truth:
        return 0
    idcg = sum(1.0 / math.log(i + 2) for i in range(min(len(truth), k)))
    dcg = sum(
        1.0 / math.log(i + 2) for i, item in enumerate(ranked[:k]) if item in truth
    )
    return dcg / idcg


def _hit(ranked, truth, k):
    return int(bool(set(ranked[:k]) & set(truth)))


def _map(ranked, truth, k):
    if not truth:
        return 0
    scores, hits = 0.0, 0
    for i, item in enumerate(ranked[:k]):
        if item in truth:
            hits += 1
            scores += hits / (i + 1)
    return scores / len(truth)


def _oracle(rank_rows, truths, k_list):
    n = len(rank_rows)
    out = {k: dict.fromkeys(["precision", "recall", "ndcg", "hit_rate", "map"], 0.0)
           for k in k_list}
    for ranked, truth in zip(rank_rows, truths):
        for k in k_list:
            out[k]["precision"] += _precision(ranked, truth, k)
            out[k]["recall"] += _recall(ranked, truth, k)
            out[k]["ndcg"] += _ndcg(ranked, truth, k)
            out[k]["hit_rate"] += _hit(ranked, truth, k)
            out[k]["map"] += _map(ranked, truth, k)
    for k in k_list:
        for m in out[k]:
            out[k][m] /= n
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_match_reference_semantics(seed):
    rs = np.random.default_rng(seed)
    n_users, n_items, topk = 200, 500, 50
    k_list = [5, 10, 20]

    rank = np.stack([rs.permutation(n_items)[:topk] for _ in range(n_users)])
    truths = []
    for u in range(n_users):
        L = int(rs.integers(0, 8))  # includes empty-truth users
        truths.append(list(rs.choice(n_items, size=L, replace=False)))
    max_p = max(1, max(len(t) for t in truths))
    pos = np.full((n_users, max_p), -1, dtype=np.int32)
    lens = np.zeros(n_users, dtype=np.int32)
    for u, t in enumerate(truths):
        pos[u, : len(t)] = t
        lens[u] = len(t)

    got = compute_metrics(rank, np.arange(n_users), pos, lens, k_list)
    want = _oracle([r.tolist() for r in rank], truths, k_list)

    for k in k_list:
        for m in want[k]:
            assert got[k][m] == pytest.approx(want[k][m], abs=1e-6), (k, m)


def test_gene_metrics_pair_matches_single_calls(tiny_dataset):
    """The fused val+test fetch returns exactly what two gene_metrics
    calls return."""
    import jax.numpy as jnp
    import numpy as np

    from chaorec_tpu.eval.metrics import gene_metrics, gene_metrics_pair

    rs = np.random.default_rng(3)
    rank = jnp.asarray(
        rs.integers(tiny_dataset.num_user,
                    tiny_dataset.num_user + tiny_dataset.num_item,
                    size=(tiny_dataset.num_user, 20)))
    ks = [5, 10, 20]
    v, t = gene_metrics_pair(tiny_dataset, rank, ks)
    v_ref = gene_metrics(tiny_dataset, rank, ks, "val")
    t_ref = gene_metrics(tiny_dataset, rank, ks, "test")
    assert v == v_ref
    assert t == t_ref


def test_dense_mask_ranking_matches_scatter():
    """_rank_chunk_dense_mask == _rank_chunk for the same history."""
    import jax.numpy as jnp
    from chaorec_tpu.eval.ranking import (
        _rank_chunk, _rank_chunk_dense_mask, mask_and_topk,
        mask_and_topk_dense,
    )

    rs = np.random.default_rng(5)
    nu, ni, d, h = 30, 25, 8, 6
    ue = jnp.asarray(rs.standard_normal((nu, d)).astype(np.float32))
    ie = jnp.asarray(rs.standard_normal((ni, d)).astype(np.float32))
    hist = np.full((nu, h), ni, np.int32)
    seen = np.zeros((nu, ni), np.uint8)
    for u in range(nu):
        items = rs.choice(ni, size=rs.integers(0, h), replace=False)
        hist[u, : len(items)] = np.sort(items)
        seen[u, items] = 1
    a = _rank_chunk(ue, ie, jnp.asarray(hist), 10, nu)
    b = _rank_chunk_dense_mask(ue, ie, jnp.asarray(seen), 10, nu)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    scores = jnp.asarray(rs.standard_normal((nu, ni)).astype(np.float32))
    c = mask_and_topk(scores, jnp.asarray(hist), 10, nu, -np.inf)
    e = mask_and_topk_dense(scores, jnp.asarray(seen), 10, nu, -np.inf)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(e))
