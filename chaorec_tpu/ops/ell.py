"""ELL-layout sparse propagation: the core spmm kernel library.

The reference's graph propagation runs on torch-scatter's dynamic COO
scatter CUDA kernels (BasicGCN.py:21-59, Model/LightGCN.py:21-46).  XLA
has no efficient dynamic scatter: ``jax.ops.segment_sum`` lowers to a
sort + scatter pipeline that runs at a few GiB/s on TPU.  This module
replaces the *scatter* with a *dense reduction* by re-laying the graph
out in ELL (padded-neighbor-list) form at build time:

    idx  : (R, K) int32   column ids of the first K neighbors per row
    w    : (R, K) float   edge weights, 0 in padding slots
    out[r] = sum_k w[r, k] * x[idx[r, k]]        -- gather + K-axis reduce

Rows with degree > K spill their remaining edges into a row-sorted
overflow reduced by prefix-sum + CSR-pointer gathers (``cs[ptr[r+1]] -
cs[ptr[r]]``) — scatter-free end to end, so the whole matvec (forward
AND custom VJP) lowers to gathers, reductions and one cumsum; no
sort/scatter pipeline anywhere.

Degree skew is why the cap exists: padding every row to the max degree
(238 on microlens items vs p50=10) would waste ~20x the edge storage
and, worse, the gather bandwidth (see ``auto_cap``).

Both orientations of a graph are stored (by-row and by-column), so the
VJP of one direction's spmm **is the other direction's forward**: for
``y = A x`` (A fixed), ``dx = A^T g`` — no transposes or scatters in the
backward pass either.  See ``EllMatrix.t``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def auto_cap(deg: np.ndarray, overflow_factor: float = 4.0) -> int:
    """Cost-minimizing ELL width K (multiple of 8) under degree skew.

    The dominant runtime cost of the ELL path is XLA's random row-gather
    (measured ~50 GB/s on v5e vs 816 GB/s HBM), and every slot — padding
    included — is gathered. So the right objective is NOT "spill few
    edges" (that alone chose K=32/112 on microlens against mean degrees
    4.5/15, wasting ~7x the gather bandwidth on padding); it is

        minimize  R*K  +  overflow_factor * sum(max(deg - K, 0))

    gathered-row work for the padded block plus the per-edge cost of the
    sorted-COO overflow (an edge there pays a gather AND a scatter-reduce
    slot, hence the >1 factor). On microlens this picks K=8 (users) and
    K=16 (items): ~3.3x less gather traffic than the spill-1% rule.
    """
    deg = np.asarray(deg, np.int64)
    if deg.size == 0 or deg.max() == 0:
        return 8
    best_k, best_cost = 8, None
    for k in range(8, int(deg.max()) + 8, 8):
        cost = deg.size * k + overflow_factor * int(
            np.maximum(deg - k, 0).sum())
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        elif cost > 1.5 * best_cost:
            break  # convex-ish in k; far past the minimum
    return best_k


def ell_from_coo(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_rows: int,
    cap: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack COO edges (out[src] += w * x[dst]) into ELL + sorted overflow.

    Returns ``(idx, wmat, ov_ptr, ov_dst, ov_w)`` where ``idx``/``wmat``
    are (num_rows, K) with K = min(cap, max_degree) rounded up to a
    multiple of 8 (sublane alignment), padding slots pointing at column 0
    with weight 0; ``ov_ptr`` is a (num_rows+1,) CSR row-pointer into the
    row-sorted overflow pair ``(ov_dst, ov_w)``.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float32)
    order = np.argsort(src, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    deg = np.bincount(src, minlength=num_rows)
    max_deg = int(deg.max()) if deg.size else 0
    k = max_deg if cap is None else min(cap, max_deg)
    k = max(8, -(-k // 8) * 8) if k else 8

    # Position of each edge within its row (0-based rank).
    starts = np.zeros(num_rows + 1, np.int64)
    np.cumsum(deg, out=starts[1:])
    rank = np.arange(src.size) - starts[src]

    idx = np.zeros((num_rows, k), np.int32)
    wmat = np.zeros((num_rows, k), np.float32)
    in_ell = rank < k
    idx[src[in_ell], rank[in_ell]] = dst[in_ell]
    wmat[src[in_ell], rank[in_ell]] = w[in_ell]

    ov = ~in_ell
    ov_src = src[ov]
    # Row-pointer (CSR-style) offsets into the sorted overflow: the
    # overflow reduce is then cumsum + two gathers per row — NO scatter.
    ov_ptr = np.zeros(num_rows + 1, np.int64)
    np.cumsum(np.bincount(ov_src, minlength=num_rows), out=ov_ptr[1:])
    return (idx, wmat, ov_ptr.astype(np.int32), dst[ov].astype(np.int32),
            w[ov])


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class EllMatrix:
    """A fixed-sparsity matrix in ELL + overflow layout, both orientations.

    ``matvec(x)`` computes ``A @ x`` for x of shape (num_cols, D);
    ``t`` is the transposed view sharing the same buffers, so
    ``A.t.matvec`` is ``A^T @ x`` and also serves as ``matvec``'s VJP.
    """

    num_rows: int
    num_cols: int
    # row-oriented (A @ x)
    idx: jnp.ndarray        # (R, K)
    w: jnp.ndarray          # (R, K)
    ov_ptr: jnp.ndarray     # (R+1,) CSR row pointers into the overflow
    ov_dst: jnp.ndarray     # (O,) sorted by row
    ov_w: jnp.ndarray       # (O,)
    # column-oriented (A^T @ x)
    t_idx: jnp.ndarray      # (C, Kt)
    t_w: jnp.ndarray        # (C, Kt)
    t_ov_ptr: jnp.ndarray
    t_ov_dst: jnp.ndarray
    t_ov_w: jnp.ndarray

    def tree_flatten(self):
        leaves = (self.idx, self.w, self.ov_ptr, self.ov_dst, self.ov_w,
                  self.t_idx, self.t_w, self.t_ov_ptr, self.t_ov_dst,
                  self.t_ov_w)
        return leaves, (self.num_rows, self.num_cols)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], *leaves)

    @classmethod
    def from_coo(cls, src, dst, w, num_rows: int, num_cols: int,
                 cap: Optional[int] = None,
                 cap_t: Optional[int] = None) -> "EllMatrix":
        idx, wm, os_, od, ow = ell_from_coo(src, dst, w, num_rows, cap)
        ti, tw, tos, tod, tow = ell_from_coo(dst, src, w, num_cols, cap_t)
        return cls(
            num_rows, num_cols,
            jnp.asarray(idx), jnp.asarray(wm), jnp.asarray(os_),
            jnp.asarray(od), jnp.asarray(ow),
            jnp.asarray(ti), jnp.asarray(tw), jnp.asarray(tos),
            jnp.asarray(tod), jnp.asarray(tow),
        )

    @property
    def t(self) -> "EllMatrix":
        return EllMatrix(
            self.num_cols, self.num_rows,
            self.t_idx, self.t_w, self.t_ov_ptr, self.t_ov_dst, self.t_ov_w,
            self.idx, self.w, self.ov_ptr, self.ov_dst, self.ov_w,
        )

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x for x: (num_cols, D) -> (num_rows, D), fp32 accumulation."""
        return _ell_matvec(self, x)


def _ell_apply(idx, w, ov_ptr, ov_dst, ov_w, num_rows, x):
    """Primal ELL+overflow apply (differentiable wrt x by custom VJP).

    The overflow (rows whose degree exceeds the ELL cap, row-sorted) is
    reduced WITHOUT any scatter: prefix-sum the messages along the edge
    axis, then each row's contribution is ``cs[ptr[r+1]] - cs[ptr[r]]``
    — two gathers, running at gather speed with no sort/scatter
    pipeline. (fp32 prefix sums: the cancellation error across a ~100k-
    edge overflow stays ~1e-6 relative for unit-scale messages.)
    """
    gathered = jnp.take(x, idx, axis=0)           # (R, K, D)
    out = jnp.einsum(
        "rk,rkd->rd", w, gathered,
        preferred_element_type=jnp.float32,
    )
    if ov_dst.shape[0]:
        msgs = ov_w[:, None] * jnp.take(x, ov_dst, axis=0)   # (O, D)
        cs = jnp.cumsum(msgs.astype(jnp.float32), axis=0)
        cs = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], 0)
        out = out + cs[ov_ptr[1:]] - cs[ov_ptr[:-1]]
    return out.astype(jnp.float32)


@jax.custom_vjp
def _ell_matvec(a: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    return _ell_apply(a.idx, a.w, a.ov_ptr, a.ov_dst, a.ov_w, a.num_rows, x)


def _ell_matvec_fwd(a, x):
    return _ell_matvec(a, x), a


def _zero_cot(x):
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _ell_matvec_bwd(a, g):
    # d/dx (A x) = A^T g: the transposed orientation's forward — a gather
    # + reduce again, never a scatter. A is a fixed graph: its weight
    # buffers get zero cotangents (learned-graph spmm uses
    # ell_rows_matvec, which differentiates through vals).
    zeros = jax.tree.map(_zero_cot, a)
    return zeros, _ell_apply(
        a.t_idx, a.t_w, a.t_ov_ptr, a.t_ov_dst, a.t_ov_w, a.num_cols, g
    )


_ell_matvec.defvjp(_ell_matvec_fwd, _ell_matvec_bwd)


# ---------------------------------------------------------------------------
# Top-k similarity graphs in ELL form (LATTICE/MICRO learned adjacency).
# ---------------------------------------------------------------------------

def topk_sym_norm_ell(
    sim_topk_vals: jnp.ndarray,
    sim_topk_idx: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Value-weighted D^-1/2 A D^-1/2 of a top-k kNN graph kept in
    (vals, idx) form — never materializing the (N, N) adjacency.

    Matches the reference's build_knn_neighbourhood +
    compute_normalized_laplacian pipeline (Model/LATTICE.py:46-75)
    exactly: since every off-top-k entry is zero, row i's degree is just
    ``vals[i].sum()``, and the reference scales column j by the *row*
    degree of row j (its D is built from row sums of the asymmetric
    top-k-masked matrix), so both factors come from one row-sum vector —
    a gather, no scatter.

    Differentiable wrt ``vals`` (the LATTICE learned graph flows gradients
    through the similarity weights).
    """
    row_deg = sim_topk_vals.sum(axis=1)                       # (N,)
    d = jax.lax.rsqrt(jnp.maximum(row_deg, 1e-7))
    return sim_topk_vals * d[:, None] * d[sim_topk_idx], sim_topk_idx


def knn_topk_ell(feats: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity top-k graph as (vals, idx) — build_sim +
    build_knn_neighbourhood (Model/LATTICE.py:44-61) without keeping the
    dense masked (N, N) matrix. Traceable (used under jit for learned
    graphs) and differentiable wrt ``feats`` through top_k's gather VJP.
    """
    f = feats * jax.lax.rsqrt(
        jnp.maximum((feats * feats).sum(-1, keepdims=True), 1e-24)
    )
    sim = jnp.dot(f, f.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(sim, k)


def knn_topk_ell_host(feats, k: int, chunk: int = 8192
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Init-time chunked top-k cosine graph: (vals, idx) without ever
    holding the full (N, N) similarity (electronics' 51901 items would be
    a 10.8 GB dense sim). Row chunks of the sim are built and reduced on
    device, results land on host."""
    f = np.asarray(feats, np.float32)
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    fd = jnp.asarray(f)
    n = f.shape[0]
    chunk_topk = jax.jit(
        lambda rows, all_: jax.lax.top_k(
            jnp.dot(rows, all_.T, preferred_element_type=jnp.float32), k
        )
    )
    vals = np.empty((n, k), np.float32)
    idx = np.empty((n, k), np.int32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        v, i = chunk_topk(fd[s:e], fd)
        vals[s:e] = np.asarray(v)
        idx[s:e] = np.asarray(i)
    return vals, idx


def topk_sym_norm_host(vals: np.ndarray, idx: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Host/numpy twin of ``topk_sym_norm_ell`` for init-time graphs."""
    d = np.maximum(vals.sum(1), 1e-7) ** -0.5
    return (vals * d[:, None] * d[idx]).astype(np.float32), idx


def ell_union_max(a_vals, a_idx, b_vals, b_idx
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Elementwise maximum of two ELL graphs (SMORE's fusion adjacency,
    Model/SMORE.py:19-88) as a new padded ELL pair. Host-side scipy; rows
    of the union have at most K_a + K_b nonzeros."""
    import scipy.sparse as sp

    n = a_vals.shape[0]

    def csr(vals, idx):
        rows = np.repeat(np.arange(n), idx.shape[1])
        return sp.csr_matrix(
            (np.asarray(vals, np.float64).ravel(),
             (rows, np.asarray(idx).ravel())),
            shape=(n, n),
        )

    m = csr(a_vals, a_idx).maximum(csr(b_vals, b_idx)).tocoo()
    idx, vals, _, _, _ = ell_from_coo(
        m.row, m.col, m.data.astype(np.float32), n, cap=None
    )
    return vals, idx


def build_segment_transpose(indices: jnp.ndarray, num_segments: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device transpose layout for scatter-free segmented reduction.

    For a flat index vector (e.g. the flattened node slots of a rebuilt
    hypergraph incidence), returns ``(perm, ptr)`` such that
    ``indices[perm]`` is sorted and ``ptr`` is the (num_segments+1,) CSR
    row-pointer. Computed ONCE per graph rebuild (one device sort); every
    subsequent per-step reduction becomes permute-gather + cumsum +
    pointer-gather (``segment_reduce``) — no scatter in the step program.
    """
    perm = jnp.argsort(indices)
    sorted_idx = indices[perm]
    ptr = jnp.searchsorted(sorted_idx, jnp.arange(num_segments + 1))
    return perm, ptr.astype(jnp.int32)


def _seg_sum_primal(values, flat_idx, perm, ptr):
    from chaorec_tpu.ops.pallas_scan import prefix_cumsum

    v = values[perm]
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    cs = prefix_cumsum(v)
    cs = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], 0)
    out = cs[ptr[1:]] - cs[ptr[:-1]]
    return out[:, 0] if squeeze else out


@jax.custom_vjp
def seg_sum(values: jnp.ndarray, flat_idx: jnp.ndarray, perm: jnp.ndarray,
            ptr: jnp.ndarray) -> jnp.ndarray:
    """``out[s] = sum_{j: flat_idx[j]==s} values[j]`` — scatter-free in
    BOTH directions.

    ``values`` is in original (unpermuted) order, shape (M,) or (M, D);
    ``(perm, ptr)`` come from :func:`build_segment_transpose(flat_idx)`
    (computed once per graph rebuild); output has ``ptr.shape[0] - 1``
    rows. Forward: permute-gather + prefix-sum + pointer-gather diff.
    Backward: ``d values[j] = g[flat_idx[j]]`` — a pure gather, so the
    step program's gradient never lowers to an XLA scatter.

    CAVEAT (precision model): a segment's sum is the difference of two
    global fp32 prefix values, so its ABSOLUTE error scales with the
    global running total at that point — roughly ulp(total) x O(log M),
    NOT with the segment's own magnitude — and the parallel scan is not
    even monotone for non-negative inputs (an empty segment can come
    out slightly negative). For zero-mean message tensors the running
    total is a random walk (~sqrt(M)·sigma) and the error is benign;
    for NON-NEGATIVE values (degrees, exp-sums) the total grows
    linearly and downstream ``rsqrt``/division can see errors of ~0.1
    at 1e5-edge scale. Keep such scalar reductions on
    ``jax.ops.segment_sum`` (scatter of scalars is cheap) — see
    AdaGCL._g2_renorm and MHRec's attention denominator.
    """
    return _seg_sum_primal(values, flat_idx, perm, ptr)


def _seg_sum_fwd(values, flat_idx, perm, ptr):
    stub = jnp.zeros((0,), values.dtype)  # dtype carrier for the bwd cast
    return (_seg_sum_primal(values, flat_idx, perm, ptr),
            (flat_idx, perm, ptr, stub))


def _seg_sum_bwd(res, g):
    flat_idx, perm, ptr, stub = res
    return (jnp.take(g, flat_idx, axis=0).astype(stub.dtype),
            _zero_cot(flat_idx), _zero_cot(perm), _zero_cot(ptr))


seg_sum.defvjp(_seg_sum_fwd, _seg_sum_bwd)


@jax.custom_vjp
def seg_gather(x: jnp.ndarray, flat_idx: jnp.ndarray, perm: jnp.ndarray,
               ptr: jnp.ndarray) -> jnp.ndarray:
    """``x[flat_idx]`` whose VJP is :func:`seg_sum` instead of XLA's
    scatter-add — the transposed twin of ``seg_sum``. ``ptr`` must have
    ``x.shape[0] + 1`` entries (segments over x's rows)."""
    return jnp.take(x, flat_idx, axis=0)


def _seg_gather_fwd(x, flat_idx, perm, ptr):
    stub = jnp.zeros((0,), x.dtype)
    return jnp.take(x, flat_idx, axis=0), (flat_idx, perm, ptr, stub)


def _seg_gather_bwd(res, g):
    flat_idx, perm, ptr, stub = res
    return (_seg_sum_primal(g, flat_idx, perm, ptr).astype(stub.dtype),
            _zero_cot(flat_idx), _zero_cot(perm), _zero_cot(ptr))


seg_gather.defvjp(_seg_gather_fwd, _seg_gather_bwd)


def _sews_primal(edge_emb, alpha, perm, edge_perm, ptr):
    from chaorec_tpu.ops.pallas_scan import prefix_cumsum

    v = (alpha.reshape(-1)[perm][:, None]
         * jnp.take(edge_emb, edge_perm, axis=0)).astype(jnp.float32)
    cs = prefix_cumsum(v)
    cs = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], 0)
    return cs[ptr[1:]] - cs[ptr[:-1]]


@jax.custom_vjp
def seg_edge_weighted_sum(edge_emb: jnp.ndarray, alpha: jnp.ndarray,
                          flat_idx: jnp.ndarray, perm: jnp.ndarray,
                          edge_perm: jnp.ndarray, ptr: jnp.ndarray
                          ) -> jnp.ndarray:
    """``out[s] = sum_{(e,k): flat_idx[k*He+e]==s} alpha[k*He+e] * edge_emb[e]``
    without materializing a (He*K, D) message tensor and with
    scatter-free gradients — the fused message aggregation of
    hypergraph attention (MHRec, Model/MHRec.py:37-89).

    ``flat_idx`` is the COLUMN-MAJOR flattened (He, K) incidence
    (``h_nodes.T.reshape(-1)``: all slot-0 nodes, then all slot-1
    nodes, ...), ``alpha`` the matching (He*K,) flat weights, ``(perm,
    ptr)`` from :func:`build_segment_transpose(flat_idx)`, and
    ``edge_perm = perm % He`` (per-rebuild constant). Column-major slot
    order keeps every per-slot quantity a plain 1-D (M,) array or a fat
    (He, D) slice — no (He, K) arrays anywhere, whose 2-wide lane axis
    would be tile-padded to 128 on TPU (a ~60x memory inflation per
    elementwise pass at K=2). Forward: one He-row gather in segment
    order fused with the weight multiply into the prefix-sum. Backward
    (both pure gathers, no XLA scatter):
    ``d edge_emb[e] = sum_k alpha[k*He+e] * g[flat_idx[k*He+e]]``,
    ``d alpha[k*He+e] = edge_emb[e] . g[flat_idx[k*He+e]]``.

    Precision model matches :func:`seg_sum` (global fp32 prefix sums):
    fine for zero-mean message tensors, do NOT use for non-negative
    scalar reductions.
    """
    return _sews_primal(edge_emb, alpha, perm, edge_perm, ptr)


def _sews_fwd(edge_emb, alpha, flat_idx, perm, edge_perm, ptr):
    return (_sews_primal(edge_emb, alpha, perm, edge_perm, ptr),
            (edge_emb, alpha, flat_idx, perm, edge_perm, ptr))


def _sews_bwd(res, g):
    edge_emb, alpha, flat_idx, perm, edge_perm, ptr = res
    he, d = edge_emb.shape
    k = alpha.shape[0] // he
    # Column-major slot blocks: slot j of every edge is the contiguous
    # row range [j*He, (j+1)*He) — the per-slot terms unroll over k as
    # fat (He, D) slices and 1-D concats, never materializing an
    # (He, K) array (K=2 lanes would tile-pad to 128 on TPU).
    g_tk = jnp.take(g, flat_idx, axis=0).astype(jnp.float32)
    a32 = alpha.astype(jnp.float32)
    e32 = edge_emb.astype(jnp.float32)
    d_edge = jnp.zeros((he, d), jnp.float32)
    d_alpha = []
    for j in range(k):
        gj = g_tk[j * he:(j + 1) * he]
        d_edge = d_edge + a32[j * he:(j + 1) * he, None] * gj
        d_alpha.append(jnp.sum(e32 * gj, axis=1))
    return (d_edge.astype(edge_emb.dtype),
            jnp.concatenate(d_alpha).astype(alpha.dtype),
            _zero_cot(flat_idx), _zero_cot(perm),
            _zero_cot(edge_perm), _zero_cot(ptr))


seg_edge_weighted_sum.defvjp(_sews_fwd, _sews_bwd)


def ell_rows_matvec(vals: jnp.ndarray, idx: jnp.ndarray,
                    x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = sum_k vals[r,k] * x[idx[r,k]] for a square top-k graph.

    Pure-ELL spmm with no overflow (every row has exactly K slots);
    differentiable wrt both ``vals`` and ``x`` through XLA's gather —
    used where the graph itself is learned (LATTICE item adjacency:
    gradients flow into the modal weights through ``vals``).
    """
    return jnp.einsum(
        "rk,rkd->rd", vals, jnp.take(x, idx, axis=0),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Fixed-topology / traced-weights propagation (GAT-family: GRCN, MGAT).
# ---------------------------------------------------------------------------

def ell_pattern_from_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    num_rows: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack COO edge IDs (not weights) into ELL + sorted overflow.

    Twin of :func:`ell_from_coo` for graphs whose WEIGHTS are traced
    per-step values (GAT attention, learned edge gates): each padded
    slot records which edge fills it, so a step can gather the current
    weight vector into the layout (``w_pad[eid]``) instead of baking
    weights at build time. Returns ``(idx, eid, ov_ptr, ov_col,
    ov_eid)``; padding slots have ``eid == num_edges`` (the sentinel row
    of the zero-padded weight vector) and ``idx == 0``.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    e_total = rows.size
    order = np.argsort(rows, kind="stable")
    r_s, c_s, id_s = rows[order], cols[order], order
    deg = np.bincount(r_s, minlength=num_rows)
    k = auto_cap(deg)

    starts = np.zeros(num_rows + 1, np.int64)
    np.cumsum(deg, out=starts[1:])
    rank = np.arange(e_total) - starts[r_s]

    idx = np.zeros((num_rows, k), np.int32)
    eid = np.full((num_rows, k), e_total, np.int32)  # sentinel = pad
    in_ell = rank < k
    idx[r_s[in_ell], rank[in_ell]] = c_s[in_ell]
    eid[r_s[in_ell], rank[in_ell]] = id_s[in_ell]

    ov = ~in_ell
    ov_ptr = np.zeros(num_rows + 1, np.int64)
    np.cumsum(np.bincount(r_s[ov], minlength=num_rows), out=ov_ptr[1:])
    return (idx, eid, ov_ptr.astype(np.int32), c_s[ov].astype(np.int32),
            id_s[ov].astype(np.int32))


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class EllPattern:
    """Fixed sparsity pattern whose edge weights are per-step traced
    values — the GAT-family propagation layout.

    ``weighted_matvec(w_edge, x)[r] = sum_{e: rows[e]==r} w_edge[e] *
    x[cols[e]]`` and ``weighted_rowsum(w_edge)[r] = sum_{e: rows[e]==r}
    w_edge[e]``; both lower to gathers + dense reductions in the forward
    AND the backward (the x-cotangent is the transposed orientation's
    gather-reduce; the w-cotangent is two edge-space row gathers) — no
    scatter anywhere, which on v5e is the difference between ~140 GB/s
    (random row gather) and ~25 GB/s (unsorted scatter-add), see
    parity_logs/gather_rates.txt.
    """

    num_rows: int
    num_cols: int
    num_edges: int
    # row orientation
    idx: jnp.ndarray        # (R, K) col of each slot
    eid: jnp.ndarray        # (R, K) edge id, num_edges = padding
    ov_ptr: jnp.ndarray     # (R+1,)
    ov_col: jnp.ndarray     # (O,)
    ov_eid: jnp.ndarray     # (O,)
    # column orientation (the x-VJP / A^T apply)
    t_idx: jnp.ndarray
    t_eid: jnp.ndarray
    t_ov_ptr: jnp.ndarray
    t_ov_col: jnp.ndarray
    t_ov_eid: jnp.ndarray
    # original endpoints, for the w-cotangent
    rows: jnp.ndarray       # (E,)
    cols: jnp.ndarray       # (E,)

    def tree_flatten(self):
        leaves = (self.idx, self.eid, self.ov_ptr, self.ov_col, self.ov_eid,
                  self.t_idx, self.t_eid, self.t_ov_ptr, self.t_ov_col,
                  self.t_ov_eid, self.rows, self.cols)
        return leaves, (self.num_rows, self.num_cols, self.num_edges)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*aux, *leaves)

    @classmethod
    def from_coo(cls, rows, cols, num_rows: int, num_cols: int
                 ) -> "EllPattern":
        i, e, op, oc, oe = ell_pattern_from_coo(rows, cols, num_rows)
        ti, te, top, toc, toe = ell_pattern_from_coo(cols, rows, num_cols)
        return cls(
            num_rows, num_cols, int(np.asarray(rows).size),
            jnp.asarray(i), jnp.asarray(e), jnp.asarray(op),
            jnp.asarray(oc), jnp.asarray(oe),
            jnp.asarray(ti), jnp.asarray(te), jnp.asarray(top),
            jnp.asarray(toc), jnp.asarray(toe),
            jnp.asarray(np.asarray(rows, np.int32)),
            jnp.asarray(np.asarray(cols, np.int32)),
        )

    def weighted_matvec(self, w_edge: jnp.ndarray, x: jnp.ndarray
                        ) -> jnp.ndarray:
        return _ellp_matvec(self, w_edge, x)

    def weighted_rowsum(self, w_edge: jnp.ndarray) -> jnp.ndarray:
        return _ellp_rowsum(self, w_edge)


def _ellp_apply(idx, eid, ov_ptr, ov_col, ov_eid, w_pad, x):
    w = jnp.take(w_pad, eid)                      # (R, K), pads read 0
    out = jnp.einsum("rk,rkd->rd", w, jnp.take(x, idx, axis=0),
                     preferred_element_type=jnp.float32)
    if ov_col.shape[0]:
        msgs = jnp.take(w_pad, ov_eid)[:, None] * jnp.take(x, ov_col, axis=0)
        cs = jnp.cumsum(msgs.astype(jnp.float32), axis=0)
        cs = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], 0)
        out = out + cs[ov_ptr[1:]] - cs[ov_ptr[:-1]]
    return out.astype(jnp.float32)


def _pad_w(w_edge):
    return jnp.concatenate([w_edge.astype(jnp.float32),
                            jnp.zeros((1,), jnp.float32)])


@jax.custom_vjp
def _ellp_matvec(p: EllPattern, w_edge: jnp.ndarray, x: jnp.ndarray
                 ) -> jnp.ndarray:
    return _ellp_apply(p.idx, p.eid, p.ov_ptr, p.ov_col, p.ov_eid,
                       _pad_w(w_edge), x)


def _ellp_matvec_fwd(p, w_edge, x):
    return _ellp_matvec(p, w_edge, x), (p, w_edge, x)


def _ellp_matvec_bwd(res, g):
    p, w_edge, x = res
    dx = _ellp_apply(p.t_idx, p.t_eid, p.t_ov_ptr, p.t_ov_col, p.t_ov_eid,
                     _pad_w(w_edge), g)
    dw = jnp.sum(jnp.take(g, p.rows, axis=0) * jnp.take(x, p.cols, axis=0),
                 axis=1).astype(w_edge.dtype)
    return jax.tree.map(_zero_cot, p), dw, dx.astype(x.dtype)


_ellp_matvec.defvjp(_ellp_matvec_fwd, _ellp_matvec_bwd)


def _ellp_rowsum_primal(p, w_pad):
    out = jnp.sum(jnp.take(w_pad, p.eid), axis=1)
    if p.ov_col.shape[0]:
        cs = jnp.cumsum(jnp.take(w_pad, p.ov_eid))
        cs = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
        out = out + cs[p.ov_ptr[1:]] - cs[p.ov_ptr[:-1]]
    return out


@jax.custom_vjp
def _ellp_rowsum(p: EllPattern, w_edge: jnp.ndarray) -> jnp.ndarray:
    return _ellp_rowsum_primal(p, _pad_w(w_edge))


def _ellp_rowsum_fwd(p, w_edge):
    return _ellp_rowsum(p, w_edge), (p, w_edge)


def _ellp_rowsum_bwd(res, g):
    p, w_edge = res
    return (jax.tree.map(_zero_cot, p),
            jnp.take(g, p.rows).astype(w_edge.dtype))


_ellp_rowsum.defvjp(_ellp_rowsum_fwd, _ellp_rowsum_bwd)


# ---------------------------------------------------------------------------
# Scatter-free edge-space primitives on an EllPattern (GAT-family steps).
#
# Plain advanced indexing in the attention algebra — x[pat.rows],
# x[pat.cols], denom[pat.rows], conf[src] — autodiffs to UNSORTED
# scatter-adds (~25 GB/s on v5e vs ~140 GB/s gathers,
# parity_logs/gather_rates.txt). These wrappers keep the forward a plain
# gather and route every cotangent through the pattern's gather-reduce
# orientations instead.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def ellp_pair_inner(p: EllPattern, x: jnp.ndarray) -> jnp.ndarray:
    """``inner[e] = <x[rows[e]], x[cols[e]]>`` (the GAT attention logit
    on a fixed topology, Model/GRCN.py:100-107) with a scatter-free
    x-cotangent: ``dx = A(g) x + A^T(g) x`` where A(g) is the pattern's
    weighted adjacency with the incoming cotangent as edge weights."""
    return jnp.sum(jnp.take(x, p.rows, axis=0) * jnp.take(x, p.cols, axis=0),
                   axis=1)


def _ellp_pair_inner_fwd(p, x):
    return ellp_pair_inner(p, x), (p, x)


def _ellp_pair_inner_bwd(res, g):
    p, x = res
    gp = _pad_w(g)
    dx = (_ellp_apply(p.idx, p.eid, p.ov_ptr, p.ov_col, p.ov_eid, gp, x)
          + _ellp_apply(p.t_idx, p.t_eid, p.t_ov_ptr, p.t_ov_col,
                        p.t_ov_eid, gp, x))
    return jax.tree.map(_zero_cot, p), dx.astype(x.dtype)


ellp_pair_inner.defvjp(_ellp_pair_inner_fwd, _ellp_pair_inner_bwd)


@jax.custom_vjp
def ellp_row_expand(p: EllPattern, vals: jnp.ndarray) -> jnp.ndarray:
    """``vals[p.rows]`` (broadcast a per-ROW scalar to its edges) whose
    cotangent is the pattern's rowsum gather-reduce, not a scalar
    scatter-add."""
    return jnp.take(vals, p.rows)


def _ellp_row_expand_fwd(p, vals):
    return ellp_row_expand(p, vals), (p, vals)


def _ellp_row_expand_bwd(res, g):
    p, vals = res
    return (jax.tree.map(_zero_cot, p),
            _ellp_rowsum_primal(p, _pad_w(g)).astype(vals.dtype))


ellp_row_expand.defvjp(_ellp_row_expand_fwd, _ellp_row_expand_bwd)


def _ellp_colsum_primal(p, w_pad):
    out = jnp.sum(jnp.take(w_pad, p.t_eid), axis=1)
    if p.t_ov_col.shape[0]:
        cs = jnp.cumsum(jnp.take(w_pad, p.t_ov_eid))
        cs = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
        out = out + cs[p.t_ov_ptr[1:]] - cs[p.t_ov_ptr[:-1]]
    return out


@jax.custom_vjp
def ellp_col_expand(p: EllPattern, vals: jnp.ndarray) -> jnp.ndarray:
    """``vals[p.cols]`` (broadcast a per-COLUMN scalar to its edges, e.g.
    a per-source-node confidence) whose cotangent rides the transpose
    orientation's gather-reduce."""
    return jnp.take(vals, p.cols)


def _ellp_col_expand_fwd(p, vals):
    return ellp_col_expand(p, vals), (p, vals)


def _ellp_col_expand_bwd(res, g):
    p, vals = res
    return (jax.tree.map(_zero_cot, p),
            _ellp_colsum_primal(p, _pad_w(g)).astype(vals.dtype))


ellp_col_expand.defvjp(_ellp_col_expand_fwd, _ellp_col_expand_bwd)


# ---------------------------------------------------------------------------
# Lane-grouped (packed) edge primitives.
#
# A (N, 64) fp32 table tiles to (8, 128) on TPU: the minor axis pads
# 64 -> 128 and every row gather reads 2x the useful bytes. GAT-family
# models with G parallel towers over the SAME topology (GRCN's v/t CGCN
# branches, Model/GRCN.py:89-121) can pack the towers' tables into one
# (N, G*64) array whose rows are fully utilized, halving edge-pass HBM
# traffic at G=2. These primitives apply per-group edge weights to the
# packed lanes with the same gather-reduce VJP scheme as the 1-D
# EllPattern ops above.
# ---------------------------------------------------------------------------


def _ellp_apply_grouped(idx, eid, ov_ptr, ov_col, ov_eid, w_pad, x,
                        groups: int):
    """``out[r, g*D:(g+1)*D] = sum_{slots} w_pad[eid, g] * x[col, g*D:..]``
    with w_pad (E+1, G) (pad row zero) and x (N, G*D) lane-packed."""
    d = x.shape[1] // groups
    w = jnp.take(w_pad, eid, axis=0)                  # (R, K, G)
    ga = jnp.take(x, idx, axis=0)                     # (R, K, G*D)
    wl = jnp.repeat(w, d, axis=2)                     # broadcast, fused
    out = jnp.einsum("rkd,rkd->rd", wl, ga,
                     preferred_element_type=jnp.float32)
    if ov_col.shape[0]:
        wo = jnp.repeat(jnp.take(w_pad, ov_eid, axis=0), d, axis=1)
        msgs = wo * jnp.take(x, ov_col, axis=0)
        cs = jnp.cumsum(msgs.astype(jnp.float32), axis=0)
        cs = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], 0)
        out = out + cs[ov_ptr[1:]] - cs[ov_ptr[:-1]]
    return out.astype(jnp.float32)


def _pad_w_grouped(w_edge):
    return jnp.concatenate(
        [w_edge.astype(jnp.float32),
         jnp.zeros((1, w_edge.shape[1]), jnp.float32)], axis=0)


@jax.custom_vjp
def ellp_matvec_grouped(p: EllPattern, w_edge: jnp.ndarray,
                        x: jnp.ndarray) -> jnp.ndarray:
    """Grouped weighted matvec: ``w_edge`` (E, G), ``x`` (N, G*D)
    lane-packed; group g's weights apply to lanes [g*D, (g+1)*D)."""
    return _ellp_apply_grouped(p.idx, p.eid, p.ov_ptr, p.ov_col, p.ov_eid,
                               _pad_w_grouped(w_edge), x, w_edge.shape[1])


def _ellp_matvec_grouped_fwd(p, w_edge, x):
    return ellp_matvec_grouped(p, w_edge, x), (p, w_edge, x)


def _ellp_matvec_grouped_bwd(res, g):
    p, w_edge, x = res
    groups = w_edge.shape[1]
    d = x.shape[1] // groups
    dx = _ellp_apply_grouped(p.t_idx, p.t_eid, p.t_ov_ptr, p.t_ov_col,
                             p.t_ov_eid, _pad_w_grouped(w_edge), g, groups)
    prod = jnp.take(g, p.rows, axis=0) * jnp.take(x, p.cols, axis=0)
    dw = jnp.sum(prod.reshape(prod.shape[0], groups, d), axis=2)
    return (jax.tree.map(_zero_cot, p), dw.astype(w_edge.dtype),
            dx.astype(x.dtype))


ellp_matvec_grouped.defvjp(_ellp_matvec_grouped_fwd,
                           _ellp_matvec_grouped_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def ellp_pair_inner_grouped(p: EllPattern, x: jnp.ndarray,
                            groups: int) -> jnp.ndarray:
    """``inner[e, g] = <x[rows[e], lanes_g], x[cols[e], lanes_g]>`` on a
    lane-packed (N, G*D) table — G attention logits from ONE pair of
    packed row gathers instead of G narrow (half-wasted) ones."""
    prod = (jnp.take(x, p.rows, axis=0) * jnp.take(x, p.cols, axis=0))
    return jnp.sum(prod.reshape(prod.shape[0], groups,
                                x.shape[1] // groups), axis=2)


def _ellp_pair_inner_grouped_fwd(p, x, groups):
    return ellp_pair_inner_grouped(p, x, groups), (p, x)


def _ellp_pair_inner_grouped_bwd(groups, res, g):
    p, x = res
    gp = _pad_w_grouped(g)
    dx = (_ellp_apply_grouped(p.idx, p.eid, p.ov_ptr, p.ov_col, p.ov_eid,
                              gp, x, groups)
          + _ellp_apply_grouped(p.t_idx, p.t_eid, p.t_ov_ptr, p.t_ov_col,
                                p.t_ov_eid, gp, x, groups))
    return jax.tree.map(_zero_cot, p), dx.astype(x.dtype)


ellp_pair_inner_grouped.defvjp(_ellp_pair_inner_grouped_fwd,
                               _ellp_pair_inner_grouped_bwd)
