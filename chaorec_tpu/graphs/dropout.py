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
    """One symmetric hop over weighted edges (u-sorted edge list).

    NOTE: the item-side reduce is an UNSORTED segment_sum (scatter-add on
    TPU) and autodiff of the gathers emits unsorted scatters too. A
    scatter-free alternative exists (:func:`sorted_two_way_propagate`)
    but MEASURED SLOWER for NGCF's per-batch layers on TPU (1.74 s vs
    1.31 s epochs, r4 — see the note in models/ngcf.py): its backward
    pays 4-6 row gathers where autodiff's unsorted scatters cost about
    the same as gathers. NGCF/SGL therefore keep this autodiff path."""
    new_u = jax.ops.segment_sum(
        w[:, None] * xi[edge_i], edge_u, num_segments=num_user,
        indices_are_sorted=True)
    new_i = jax.ops.segment_sum(
        w[:, None] * xu[edge_u], edge_i, num_segments=num_item)
    return new_u, new_i


def _stw_primal(w, xu, xi, arrs, cast):
    u_by_u, i_by_u, u_by_i, i_by_i, perm, _ = arrs
    nu, ni = xu.shape[0], xi.shape[0]
    mu = (w[:, None] * xi.astype(cast)[i_by_u]).astype(jnp.float32)
    new_u = jax.ops.segment_sum(mu, u_by_u, num_segments=nu,
                                indices_are_sorted=True)
    mi = (w[perm][:, None] * xu.astype(cast)[u_by_i]).astype(jnp.float32)
    new_i = jax.ops.segment_sum(mi, i_by_i, num_segments=ni,
                                indices_are_sorted=True)
    return new_u, new_i


def _zero_cot(x):
    import numpy as np

    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def sorted_two_way_propagate(w, xu, xi, arrs, cast=jnp.float32):
    """Symmetric hop with per-batch edge weights, scatter-free in BOTH
    directions (forward and gradient).

    ``w`` is the (E,) edge-weight vector in u-sorted order; ``arrs`` is
    the static tuple ``(u_by_u, i_by_u, u_by_i, i_by_i, perm, inv_perm)``
    where ``perm`` reorders u-sorted edge slots into i-sorted ones
    (``u_by_i == u_by_u[perm]``) and ``inv_perm`` is its inverse. With
    both orders available, every reduce — the two forward aggregations
    AND the three gradient aggregations (d xu, d xi, d w) — is a SORTED
    ``segment_sum`` or a gather; no XLA scatter is ever emitted.

    MEASURED r4 (NGCF/beauty, v5e): 1.74 s epochs vs 1.31 s for plain
    autodiff over :func:`edge_propagate` — on TPU an unsorted
    scatter-add costs about the same as a row gather, and this backward
    does 4-6 (E, D) gathers where autodiff does 2 gathers + 2 scatters.
    Kept for workloads where scatters genuinely dominate (and as the
    measured record of the experiment); NOT used by NGCF/SGL. ``cast``
    (e.g. bfloat16) halves the gather traffic; accumulation stays fp32.
    """
    return _stw_primal(w, xu, xi, arrs, cast)


def _stw_fwd(w, xu, xi, arrs, cast):
    return _stw_primal(w, xu, xi, arrs, cast), (w, xu, xi, arrs)


def _stw_bwd(cast, res, g):
    w, xu, xi, arrs = res
    u_by_u, i_by_u, u_by_i, i_by_i, perm, inv_perm = arrs
    gu, gi = g
    nu, ni = xu.shape[0], xi.shape[0]
    gu_c, gi_c = gu.astype(cast), gi.astype(cast)
    xu_c, xi_c = xu.astype(cast), xi.astype(cast)
    wi = w[perm]
    # d xi[j] = sum_{e: i_e=j} w_e * gu[u_e]  (i-sorted reduce)
    d_xi = jax.ops.segment_sum(
        (wi[:, None] * gu_c[u_by_i]).astype(jnp.float32), i_by_i,
        num_segments=ni, indices_are_sorted=True).astype(xi.dtype)
    # d xu[v] = sum_{e: u_e=v} w_e * gi[i_e]  (u-sorted reduce)
    d_xu = jax.ops.segment_sum(
        (w[:, None] * gi_c[i_by_u]).astype(jnp.float32), u_by_u,
        num_segments=nu, indices_are_sorted=True).astype(xu.dtype)
    # d w_e = xi[i_e].gu[u_e] + xu[u_e].gi[i_e]  (pure gathers)
    d_w = (jnp.sum(xi_c[i_by_u] * gu_c[u_by_u], axis=1)
           + jnp.sum(xu_c[u_by_u] * gi_c[i_by_u], axis=1)
           ).astype(w.dtype)
    return d_w, d_xu, d_xi, tuple(_zero_cot(a) for a in arrs)


sorted_two_way_propagate.defvjp(_stw_fwd, _stw_bwd)


def sorted_masked_edge_weights(keep, arrs, num_user: int, num_item: int,
                               self_loops: bool = False, eps: float = 1e-7):
    """masked_edge_weights on the two-way layout: both degree reductions
    are sorted segment_sums. Returns ``(w, self_u, self_i)`` with w in
    u-sorted order (feed straight into sorted_two_way_propagate)."""
    u_by_u, i_by_u, u_by_i, i_by_i, perm, _ = arrs
    du = jax.ops.segment_sum(keep, u_by_u, num_segments=num_user,
                             indices_are_sorted=True)
    di = jax.ops.segment_sum(keep[perm], i_by_i, num_segments=num_item,
                             indices_are_sorted=True)
    if self_loops:
        du = du + 1.0
        di = di + 1.0
    w = keep * jax.lax.rsqrt((du[u_by_u] + eps) * (di[i_by_u] + eps))
    if self_loops:
        return w, 1.0 / (du + eps), 1.0 / (di + eps)
    return w, None, None


def build_two_way_arrays(edge_u, edge_i):
    """Host-side static layout for :func:`sorted_two_way_propagate`:
    the u-sorted edge list plus its i-sorted reorder. Returns jnp int32
    constants ``(u_by_u, i_by_u, u_by_i, i_by_i, perm, inv_perm)``."""
    import numpy as np

    eu = np.asarray(edge_u, dtype=np.int64)
    ei = np.asarray(edge_i, dtype=np.int64)
    order_u = np.argsort(eu, kind="stable")
    eu, ei = eu[order_u], ei[order_u]
    perm = np.argsort(ei, kind="stable")
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(perm.shape[0])
    return tuple(
        jnp.asarray(a, jnp.int32)
        for a in (eu, ei, eu[perm], ei[perm], perm, inv_perm)
    )
