"""kNN similarity graphs (modality item-item / user-user graphs).

Single TPU-native replacement for the ~10 copy-pasted builders in the
reference: ``build_sim`` / ``build_knn_neighbourhood`` /
``compute_normalized_laplacian`` (Model/FREEDOM.py:111-140,
Model/LATTICE.py:46-75, Model/MGCN.py:16-70, Model/SMORE.py:19-88,
Model/COHESION.py:217-239, Model/GUME.py:22-91).

TPU-first: the similarity matrix is a normalized-feature matmul (MXU), the
top-k per row is ``jax.lax.top_k``, and the resulting fixed-degree graph is
kept in ELL layout — neighbor indices (N, k) + weights (N, k) — so one
propagation step is a gather plus a weighted sum over a static k axis (no
scatter at all). Row-normalization follows the reference's symmetric
laplacian over the kNN graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_weighted_sum(x: jnp.ndarray, weights: jnp.ndarray,
                        indices: jnp.ndarray) -> jnp.ndarray:
    """out[n] = sum_j weights[n, j] * x[indices[n, j]].

    Forward is a gather + small einsum. The custom backward replaces
    XLA's duplicate-serializing scatter-add for d_x (measured 13 GiB/s on
    TPU) with a sort + ``indices_are_sorted`` segment-sum over the
    (N*k, D) contribution rows — same values, an order of magnitude
    faster for the ELL graphs' N*k ~ 10^5 rows."""
    return jnp.einsum("nk,nkd->nd", weights, x[indices])


def _gws_fwd(x, weights, indices):
    return gather_weighted_sum(x, weights, indices), (x, weights, indices)


def _gws_bwd(res, g):
    x, weights, indices = res
    n, k = indices.shape
    dw = jnp.einsum("nd,nkd->nk", g, x[indices])
    contrib = (weights[:, :, None] * g[:, None, :]).reshape(n * k, -1)
    flat = indices.reshape(-1)
    order = jnp.argsort(flat)
    dx = jax.ops.segment_sum(
        contrib[order], flat[order], num_segments=x.shape[0],
        indices_are_sorted=True,
    )
    return dx, dw, None


gather_weighted_sum.defvjp(_gws_fwd, _gws_bwd)


def build_sim(features: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity matrix (Model/FREEDOM.py:117-120 ``build_sim``)."""
    norm = features / (jnp.linalg.norm(features, axis=1, keepdims=True) + 1e-12)
    return jnp.dot(norm, norm.T, preferred_element_type=jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ELLGraph:
    """Fixed-degree graph: per-row top-k neighbors + weights."""

    indices: jnp.ndarray  # (N, k) int32
    weights: jnp.ndarray  # (N, k) float32

    def tree_flatten(self):
        return (self.indices, self.weights), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def k(self) -> int:
        return int(self.indices.shape[1])

    def propagate(self, x: jnp.ndarray) -> jnp.ndarray:
        """out[n] = sum_j weights[n, j] * x[indices[n, j]] — gather + sum
        (sorted-segment-sum backward, see gather_weighted_sum)."""
        return gather_weighted_sum(x, self.weights, self.indices)


@partial(jax.jit, static_argnames=("topk", "norm"))
def _knn_from_sim(sim: jnp.ndarray, topk: int, norm: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    vals, idx = jax.lax.top_k(sim, topk)
    n = sim.shape[0]
    if norm == "ref_laplacian":
        # Reference compute_normalized_laplacian (Model/FREEDOM.py:122-129)
        # uses the ROW sum for both ends — every row sums to k, so each
        # edge weight is exactly 1/k (kept bit-faithful).
        w = jnp.full(idx.shape, 1.0 / topk, jnp.float32)
    elif norm == "sym":
        # True symmetric laplacian: column degree counts in-edges.
        col_deg = jnp.zeros((n,), jnp.float32).at[idx.reshape(-1)].add(1.0)
        row_deg = jnp.full((n,), float(topk), jnp.float32)
        w = (row_deg[:, None] ** -0.5) * (jnp.maximum(col_deg, 1.0)[idx] ** -0.5)
    else:  # "row_softmax_values": LATTICE-style row-normalized similarities
        w = vals / (jnp.sum(vals, axis=1, keepdims=True) + 1e-12)
    return idx.astype(jnp.int32), w.astype(jnp.float32)


def build_knn_graph(
    features: jnp.ndarray,
    topk: int = 10,
    norm: str = "sym",
    row_chunk: int = 4096,
) -> ELLGraph:
    """Build a kNN graph from item/user features.

    norm: "ref_laplacian" (FREEDOM-family 1/k quirk), "sym" (true
    symmetric laplacian), "row_softmax_values" (LATTICE row-normalized
    similarity weights).

    For large N the full N x N similarity is computed in row chunks so peak
    memory is O(row_chunk * N); each chunk is one MXU matmul + top_k.
    """
    feats = features / (jnp.linalg.norm(features, axis=1, keepdims=True) + 1e-12)
    n = feats.shape[0]
    if n <= row_chunk:
        return ELLGraph(*_knn_from_sim(
            jnp.dot(feats, feats.T, preferred_element_type=jnp.float32),
            topk, norm,
        ))

    idx_chunks = []
    val_chunks = []
    for start in range(0, n, row_chunk):
        block = feats[start : start + row_chunk]
        sim = jnp.dot(block, feats.T, preferred_element_type=jnp.float32)
        v, i = jax.lax.top_k(sim, topk)
        idx_chunks.append(i.astype(jnp.int32))
        val_chunks.append(v)
    idx = jnp.concatenate(idx_chunks, axis=0)
    vals = jnp.concatenate(val_chunks, axis=0)
    if norm == "ref_laplacian":
        w = jnp.full(idx.shape, 1.0 / topk, jnp.float32)
    elif norm == "sym":
        col_deg = jnp.zeros((n,), jnp.float32).at[idx.reshape(-1)].add(1.0)
        w = (float(topk) ** -0.5) * (jnp.maximum(col_deg, 1.0)[idx] ** -0.5)
    else:
        w = vals / (jnp.sum(vals, axis=1, keepdims=True) + 1e-12)
    return ELLGraph(idx, w.astype(jnp.float32))
