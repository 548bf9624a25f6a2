"""On-device graph augmentation: edge dropout with renormalization.

Replaces the reference's per-batch scipy subgraph rebuilds (SGL
``create_adj_mat``, Model/SGL.py:63-121; NGCF's ``dropout_adj``,
Model/NGCF.py:41-44) — host round-trips rebuilding CSR matrices inside the
training loop — with a jit-compatible dense rebuild: bernoulli keep mask
over the edge list, degrees recomputed by segment-sum on the kept edges,
and a scatter into a dense (U, I) operator that feeds the MXU propagation
path. Shapes stay static (the mask zeroes weights, never drops entries).

The reference drops each *directed* edge independently; we use one shared
mask for both directions (symmetric dropout). Statistically this halves
the Bernoulli granularity but preserves the keep rate and the renormalized
degree distribution; documented as an accepted deviation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_user", "num_item", "self_loops"))
def masked_dense_r(
    edge_u: jnp.ndarray,  # (E,) user ids
    edge_i: jnp.ndarray,  # (E,) item ids (0-based)
    keep: jnp.ndarray,  # (E,) float {0,1} keep mask
    num_user: int,
    num_item: int,
    self_loops: bool = False,
    eps: float = 1e-7,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Renormalized dense R' over the kept edges.

    Returns (dense_r, self_u, self_i): propagation is
      new_u = R' @ x_i (+ self_u * x_u), new_i = R'.T @ x_u (+ self_i * x_i).
    Degrees are recomputed on the kept subgraph, matching the reference's
    post-dropout renormalization (Model/SGL.py:110-121,
    Model/LayerGCN.py:94-104).
    """
    du = jax.ops.segment_sum(keep, edge_u, num_segments=num_user)
    di = jax.ops.segment_sum(keep, edge_i, num_segments=num_item)
    if self_loops:
        du = du + 1.0
        di = di + 1.0
    w = keep * jax.lax.rsqrt((du[edge_u] + eps) * (di[edge_i] + eps))
    dense = jnp.zeros((num_user, num_item), jnp.float32).at[edge_u, edge_i].add(w)
    if self_loops:
        return dense, 1.0 / (du + eps), 1.0 / (di + eps)
    return dense, None, None


def bernoulli_keep(rng: jax.Array, num_edges: int, keep_prob: float) -> jnp.ndarray:
    return jax.random.bernoulli(rng, keep_prob, (num_edges,)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("num_user", "num_item", "self_loops"))
def masked_edge_weights(
    edge_u: jnp.ndarray,
    edge_i: jnp.ndarray,
    keep: jnp.ndarray,
    num_user: int,
    num_item: int,
    self_loops: bool = False,
    eps: float = 1e-7,
):
    """Edge-space twin of masked_dense_r: same post-dropout renormalized
    weights, no dense operator.

    The dense rebuild costs O(U*I) writes per call — fine for per-EPOCH
    pruning (FREEDOM/LayerGCN/POWERec), wasteful for per-BATCH views (SGL
    rebuilds two views every step, Model/SGL.py:140-147). Here the view
    costs O(E) and propagation runs as segment-sums over the kept edges.
    Returns (w, self_u, self_i)."""
    du = jax.ops.segment_sum(keep, edge_u, num_segments=num_user)
    di = jax.ops.segment_sum(keep, edge_i, num_segments=num_item)
    if self_loops:
        du = du + 1.0
        di = di + 1.0
    w = keep * jax.lax.rsqrt((du[edge_u] + eps) * (di[edge_i] + eps))
    if self_loops:
        return w, 1.0 / (du + eps), 1.0 / (di + eps)
    return w, None, None


def edge_propagate(edge_u, edge_i, w, xu, xi, num_user: int, num_item: int):
    """One symmetric hop over weighted edges (u-sorted edge list)."""
    new_u = jax.ops.segment_sum(
        w[:, None] * xi[edge_i], edge_u, num_segments=num_user,
        indices_are_sorted=True)
    new_i = jax.ops.segment_sum(
        w[:, None] * xu[edge_u], edge_i, num_segments=num_item)
    return new_u, new_i
