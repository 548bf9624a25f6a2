"""Homograph row serving vs the reference's dense COO construction.

Oracle: ``dataload.py:275-304`` builds ``sp.coo_matrix((1.0, (u, nbr)))``
over every (node, neighbour) pair and serves ``toarray()`` rows —
duplicate entries SUM. ``homograph_rows`` must reproduce those rows
without ever materialising the N×N matrix.
"""

import numpy as np
import pytest
import scipy.sparse as sp

jnp = pytest.importorskip("jax.numpy")

from chaorec_tpu.data.homograph import homograph_batches, homograph_rows


def _reference_dense(neighbors: np.ndarray, n: int) -> np.ndarray:
    rows, cols = [], []
    for u in range(neighbors.shape[0]):
        for nbr in neighbors[u]:
            rows.append(u)
            cols.append(int(nbr))
    m = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n)
    )
    return m.toarray()


def test_rows_match_reference_coo_dense():
    rng = np.random.default_rng(0)
    n, k = 37, 5
    neighbors = rng.integers(0, n, size=(n, k)).astype(np.int32)
    # Force duplicate neighbours in some rows (replacement padding,
    # utils.py:154-178): duplicates must SUM like duplicate COO entries.
    neighbors[3] = 7
    neighbors[10, :2] = neighbors[10, 2]

    want = _reference_dense(neighbors, n)
    idx = np.arange(n, dtype=np.int32)
    got = np.asarray(homograph_rows(jnp.asarray(neighbors), jnp.asarray(idx), n))
    np.testing.assert_array_equal(got, want)
    assert got[3, 7] == k  # duplicates summed


def test_batches_cover_all_nodes_with_padded_tail():
    rng = np.random.default_rng(1)
    n, k, bs = 23, 4, 8
    neighbors = rng.integers(0, n, size=(n, k)).astype(np.int32)
    want = _reference_dense(neighbors, n)

    seen = np.zeros(n, bool)
    for rows, idx, valid in homograph_batches(neighbors, bs):
        assert rows.shape == (bs, n)
        idx = np.asarray(idx)[:valid]
        np.testing.assert_array_equal(np.asarray(rows)[:valid], want[idx])
        seen[idx] = True
    assert seen.all()


def test_subset_rows_gather():
    rng = np.random.default_rng(2)
    n, k = 50, 3
    neighbors = rng.integers(0, n, size=(n, k)).astype(np.int32)
    want = _reference_dense(neighbors, n)
    idx = np.array([0, 49, 17, 17], np.int32)  # repeated ids allowed
    got = np.asarray(homograph_rows(jnp.asarray(neighbors), jnp.asarray(idx), n))
    np.testing.assert_array_equal(got, want[idx])
