"""User-user co-interaction graph (DualGNN/DRAGON/COHESION/MHRec family).

Replaces the reference's offline O(U^2) Python double loop
(dualgnn-gen-u-u-matrix.py:20-50) with chunked MXU matmuls: co-interaction
counts are exactly ``B B^T`` rows for the binary interaction matrix B, so
each user-chunk is one (C, I) @ (I, U) matmul + top-k. Top-200 neighbors
with their counts are kept, matching the script's truncation
(dualgnn-gen-u-u-matrix.py:90-103).

Also provides the per-epoch ``topk_sample`` equivalent (utils.py:154-178,
Model/DualGNN.py:319-358): fixed-shape (U, k) neighbor indices + per-row
softmax(count) weights, padding short rows by resampling their own
neighbors, zero rows getting zero weights.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_user_cooccurrence(
    edges: np.ndarray,
    num_user: int,
    num_item: int,
    topk: int = 200,
    row_chunk: int = 4096,
    dense_threshold: int = 1_500_000_000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (indices (U, topk) int32, counts (U, topk) float32,
    lengths (U,) int32 = number of nonzero co-interaction neighbors kept).

    Two paths: device MXU matmul over the dense interaction matrix for
    catalogs where B fits (all reference datasets except electronics), and
    the native sparse-intersection path (chaorec_tpu/native ch_uu_topk,
    O(sum_i d_i^2) work, O(U) memory per thread) above the threshold."""
    if num_user * num_item > dense_threshold:
        return _build_user_cooccurrence_sparse(edges, num_user, topk)
    b = np.zeros((num_user, num_item), np.float32)
    b[edges[:, 0], edges[:, 1]] = 1.0
    bj = jnp.asarray(b)
    topk = min(topk, num_user - 1)  # +1 below for the self entry
    idx_out = np.zeros((num_user, topk), np.int32)
    cnt_out = np.zeros((num_user, topk), np.float32)

    # b passed as an argument, never closed over: a closure would embed
    # the (U, I) dense matrix into the lowered HLO as a constant (1.76 GB
    # on sports - oversized compile payloads on the remote-compile path)
    chunk_top = jax.jit(
        lambda block, mat: jax.lax.top_k(
            jnp.dot(block, mat.T, preferred_element_type=jnp.float32),
            topk + 1,  # +1 to drop self
        )
    )

    for start in range(0, num_user, row_chunk):
        end = min(start + row_chunk, num_user)
        vals, idx = chunk_top(bj[start:end], bj)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        # drop self-matches (self always has max count for its own row)
        rows = np.arange(start, end)[:, None]
        self_mask = idx == rows
        # shift left past the self entry
        keep = ~self_mask
        for r in range(end - start):
            k_idx = idx[r][keep[r]][:topk]
            k_val = vals[r][keep[r]][:topk]
            idx_out[start + r, : len(k_idx)] = k_idx
            cnt_out[start + r, : len(k_val)] = k_val
    lengths = (cnt_out > 0).sum(axis=1).astype(np.int32)
    # zero out counts/indices past the nonzero prefix (top-k is sorted desc)
    mask = np.arange(topk)[None, :] < lengths[:, None]
    idx_out = np.where(mask, idx_out, 0)
    cnt_out = np.where(mask, cnt_out, 0.0)
    return idx_out, cnt_out, lengths


def _build_user_cooccurrence_sparse(
    edges: np.ndarray, num_user: int, topk: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native sparse co-interaction top-k; same output contract as the
    dense path (raw counts, self excluded, desc order)."""
    from chaorec_tpu import native

    num_item = int(edges[:, 1].max()) + 1
    topk = min(topk, num_user - 1)

    def csr(pairs, n):
        order = np.argsort(pairs[:, 0], kind="stable")
        vals = np.ascontiguousarray(pairs[order, 1], np.int32)
        counts = np.bincount(pairs[:, 0], minlength=n)
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=indptr[1:])
        return indptr, vals

    user_indptr, user_items = csr(edges, num_user)
    item_indptr, item_users = csr(edges[:, ::-1], num_item)
    ids, w = native.uu_topk(user_indptr, user_items, item_indptr, item_users,
                            num_user, topk, weighted=False)
    lengths = (ids >= 0).sum(axis=1).astype(np.int32)
    ids = np.where(ids >= 0, ids, 0).astype(np.int32)
    return ids, w.astype(np.float32), lengths


def topk_sample(
    indices: np.ndarray,
    counts: np.ndarray,
    lengths: np.ndarray,
    k: int,
    rs: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-epoch (U, k) neighbor sample + softmax(count) weights.

    Reference semantics (Model/DualGNN.py:319-358): take the first
    min(len, k) stored neighbors; rows shorter than k are padded by
    resampling their own neighbors; empty rows get index 0 and ZERO
    weights (their weight-matrix row is never written).
    """
    num_user = indices.shape[0]
    out_idx = np.zeros((num_user, k), np.int32)
    out_w = np.zeros((num_user, k), np.float32)
    lens = np.minimum(lengths, k)
    for u in range(num_user):
        n = int(lens[u])
        if n == 0:
            continue
        ii = indices[u, :n]
        cc = counts[u, :n]
        if n < k:
            extra = rs.integers(0, n, size=k - n)
            ii = np.concatenate([ii, ii[extra]])
            cc = np.concatenate([cc, cc[extra]])
        out_idx[u] = ii[:k]
        e = np.exp(cc[:k] - cc[:k].max())
        out_w[u] = e / e.sum()
    return out_idx, out_w
