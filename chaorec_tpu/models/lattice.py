"""LATTICE: learned latent item-item structure.

Reference: Model/LATTICE.py + the first-batch flag loop
(train_and_evaluate.py:98-106). Capabilities reproduced:
- frozen "original" modal graphs from the raw features at init: dense
  topk-masked similarity, value-weighted symmetric laplacian
  (Model/LATTICE.py:44-61,100-106);
- learned graph rebuilt on the FIRST batch of every epoch from the
  *projected* features with gradients flowing into image_trs/text_trs and
  the softmax modal_weight; remaining batches reuse the stored graph
  detached (Model/LATTICE.py:117-135 build_item_graph flag) — realized
  here with the stateful protocol + ``lax.cond`` on ``batch.index``;
- item_adj = (1-lambda_coeff) * learned + lambda_coeff * original-mix;
  h = item_adj^mm_layers @ item_emb; LightGCN U-I propagation mean of
  layers 0..n; item output += L2-normalized h (Model/LATTICE.py:137-151);
- BPR(+1e-5) + mean reg on final embeddings (Model/LATTICE.py:153-177).

The dense I x I graphs are exact (the reference materializes them too);
all similarity/topk/laplacian work is MXU matmuls + top_k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.ell import ell_rows_matvec, knn_topk_ell, topk_sym_norm_ell
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


def _chunked_gram(a: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """``(a @ a.T)`` in a's dtype, built in row chunks so the fp32
    accumulation transient is (chunk, N) instead of (N, N) — an (U, U)
    fp32 intermediate would be 8.6 GB on microlens."""
    n = a.shape[0]
    f = jax.jit(lambda rows, full: jnp.dot(
        rows, full.T, preferred_element_type=jnp.float32
    ).astype(full.dtype))
    out = [f(a[s:min(s + chunk, n)], a) for s in range(0, n, chunk)]
    return jnp.concatenate(out, axis=0)


def dense_knn_sim(feats: jnp.ndarray, topk: int) -> jnp.ndarray:
    """build_sim + build_knn_neighbourhood (Model/LATTICE.py:44-61):
    cosine similarity with all but each row's top-k zeroed (values kept)."""
    sim = jnp.dot(l2norm(feats), l2norm(feats).T,
                  preferred_element_type=jnp.float32)
    kth = jax.lax.top_k(sim, topk)[0][:, -1:]
    return jnp.where(sim >= kth, sim, 0.0)


def dense_norm_laplacian(adj: jnp.ndarray) -> jnp.ndarray:
    """Value-weighted D^-1/2 A D^-1/2 (Model/LATTICE.py:50-56)."""
    rowsum = jnp.sum(adj, axis=-1)
    d = jnp.where(rowsum > 0, rowsum ** -0.5, 0.0)
    return adj * d[:, None] * d[None, :]


class LATTICE(RecModel):
    name = "LATTICE"
    stateful = True
    # Gradients reach these ONLY through the batch-0 item-graph rebuild
    # (the carried graph is detached otherwise, Model/LATTICE.py:137-158);
    # off batch 0 they get torch 1.11's zero-grad Adam drift via the
    # closed-form tail — see base.py epoch0_params.
    epoch0_params = ("v_feat", "t_feat", "image_trs_w", "image_trs_b",
                     "text_trs_w", "text_trs_b", "modal_weight")
    # graph rebuilt only on batch 0: batches 1..N-1 scan with the
    # carried state as an invariant (no per-step state copy, loop.py)
    frozen_state_epoch = True

    # dense (I, I) bf16 item-graph budget: beyond this the carried state
    # stays in ELL (vals, idx) form (microlens 14079 items = 396 MB bf16)
    DENSE_ITEM_BYTES = int(1.5e9)

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, feat_embed_dim, reg_weight, n_layers,
                 mm_layers, ii_topk, lambda_coeff,
                 compute_dtype: str = "float32"):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.feat_embed_dim = feat_embed_dim
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.mm_layers = mm_layers
        self.topk = ii_topk
        self.lambda_coeff = lambda_coeff
        self._v_init = v_feat
        self._t_init = t_feat
        # GUME crossover applied to the learned (I, I) propagation
        # (VERDICT r2 item 5; ref Model/LATTICE.py:137-177): XLA's
        # row-gather is transaction-bound (~50-200 GB/s on v5e) while a
        # dense bf16 MXU matmul streams the (I, I) graph at full HBM
        # rate — at rec-catalog sizes the dense matrix read (396 MB bf16
        # on microlens) beats the (I, 4K) gather. Carried item_adj state
        # becomes the dense bf16 matrix; fp32 config keeps the exact ELL
        # path (same crossover switch as graphs/norm_adj.py).
        self.dense_items = (
            compute_dtype == "bfloat16"
            and num_item * num_item * 2 <= self.DENSE_ITEM_BYTES
        )
        if self.dense_items:
            self.image_original_d = dense_norm_laplacian(
                dense_knn_sim(v_feat, ii_topk)).astype(jnp.bfloat16)
            self.text_original_d = dense_norm_laplacian(
                dense_knn_sim(t_feat, ii_topk)).astype(jnp.bfloat16)
        else:
            # Frozen "original" modal graphs in ELL (vals, idx) form:
            # top-k cosine rows, value-weighted D^-1/2 A D^-1/2
            # (Model/LATTICE.py:44-61,100-106) — the (I, I) similarity
            # exists only transiently inside top_k at init; per-step
            # propagation reads (I, K), not (I, I).
            self.image_original = topk_sym_norm_ell(
                *knn_topk_ell(v_feat, ii_topk))
            self.text_original = topk_sym_norm_ell(
                *knn_topk_ell(t_feat, ii_topk))

        # ---- Row-mode block operators (FREEDOM's _rows pattern): R is
        # FIXED for LATTICE, so R^T, R R^T and R^T R precompute ONCE at
        # init and every frozen-graph training step touches only the
        # batch's rows — final_u[b] = (E_u[b] + (R E_i)[b] +
        # (R R^T E_u)[b])/3 — instead of streaming the full (U, I)
        # operator n_layers x fwd+bwd per batch (the measured ~20 ms/
        # batch dense-HBM floor of the full-propagation step on
        # microlens). Batch 0 (the graph rebuild, gradients into the trs
        # projections) keeps the full forward.
        self._rt = None
        self._rrt = None
        self._rtr = None
        r = graph.dense_r
        row_bytes = ((num_user * num_user + num_item * num_item) * 2
                     if r is not None else 1 << 62)
        if (graph.use_dense and r is not None and n_layers in (1, 2)
                and mm_layers == 1 and row_bytes <= int(6e9)):
            self._rt = jnp.transpose(r)
            if n_layers == 2:
                self._rrt = _chunked_gram(r)          # R R^T (U, U)
                self._rtr = _chunked_gram(self._rt)   # R^T R (I, I)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 4)
        vw, vb = torch_linear_init(ks[2], self.feat_embed_dim, self._v_init.shape[1])
        tw, tb = torch_linear_init(ks[3], self.feat_embed_dim, self._t_init.shape[1])
        return {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "v_feat": self._v_init, "t_feat": self._t_init,
            "image_trs_w": vw, "image_trs_b": vb,
            "text_trs_w": tw, "text_trs_b": tb,
            "modal_weight": jnp.asarray([0.5, 0.5], jnp.float32),
        }

    def _original_mix(self, w):
        """λ-scaled modal-weighted originals as one ELL block (duplicate
        (row, col) slots across blocks simply sum in matvec — identical to
        adding the dense matrices)."""
        iv, ii = self.image_original
        tv, ti = self.text_original
        return (jnp.concatenate([w[0] * iv, w[1] * tv], 1),
                jnp.concatenate([ii, ti], 1))

    def init_state(self, rng: jax.Array):
        # item_adj buffer; epoch's first batch overwrites it (the value
        # is never consumed — batch 0 of epoch 1 rebuilds), only the
        # carried shape/dtype matter.
        w = jax.nn.softmax(jnp.asarray([0.5, 0.5]))
        if self.dense_items:
            return (w[0].astype(jnp.bfloat16) * self.image_original_d
                    + w[1].astype(jnp.bfloat16) * self.text_original_d)
        # ELL shape (I, 4K): learned block (2K slots) + original block
        # (2K slots); the learned block is zero-weighted padding so the
        # carried shape is identical to _build_item_adj's output.
        ov, oi = self._original_mix(w)
        return (jnp.concatenate([jnp.zeros_like(ov), ov], 1),
                jnp.concatenate([oi, oi], 1))

    def _build_item_adj(self, params: Params):
        """Learned + original item graph, all in ELL (vals, idx) form.

        Dense equivalent (Model/LATTICE.py:117-135):
        ``(1-λ) norm(w0 knn(img) + w1 knn(txt)) + λ (w0 orig_i + w1
        orig_t)``.  The learned sum's sparsity pattern is the union of the
        two modal top-k patterns, so its ELL form is the concatenation of
        both (vals, idx) blocks; normalization then needs only row sums
        (topk_sym_norm_ell), and gradients flow into the trs projections
        through top_k's gather VJP exactly as through the dense where().
        """
        image_feats = params["v_feat"] @ params["image_trs_w"].T + params["image_trs_b"]
        text_feats = params["t_feat"] @ params["text_trs_w"].T + params["text_trs_b"]
        w = jax.nn.softmax(params["modal_weight"])
        if self.dense_items:
            # dense formula (Model/LATTICE.py:117-135); the (I, I) fp32
            # intermediates are first-batch-only transients, the carried
            # result is bf16
            learned = dense_norm_laplacian(
                w[0] * dense_knn_sim(image_feats, self.topk)
                + w[1] * dense_knn_sim(text_feats, self.topk))
            orig = (w[0] * self.image_original_d.astype(jnp.float32)
                    + w[1] * self.text_original_d.astype(jnp.float32))
            adj = ((1.0 - self.lambda_coeff) * learned
                   + self.lambda_coeff * orig)
            return adj.astype(jnp.bfloat16)
        sv, si = knn_topk_ell(image_feats, self.topk)
        tv, ti = knn_topk_ell(text_feats, self.topk)
        lv, li = topk_sym_norm_ell(
            jnp.concatenate([w[0] * sv, w[1] * tv], 1),
            jnp.concatenate([si, ti], 1),
        )
        ov, oi = self._original_mix(w)
        return (jnp.concatenate([(1.0 - self.lambda_coeff) * lv,
                                 self.lambda_coeff * ov], 1),
                jnp.concatenate([li, oi], 1))

    def _forward(self, params: Params, item_adj):
        h = params["item_embedding"]
        if self.dense_items:
            for _ in range(self.mm_layers):
                h = jnp.dot(item_adj, h.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        else:
            vals, idx = item_adj
            for _ in range(self.mm_layers):
                h = ell_rows_matvec(vals, idx, h)
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = xu, xi
        for _ in range(self.n_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s + l2norm(h)

    def _rows(self, params: Params, item_adj, users, items):
        """Batch rows of the final embeddings via the init-time block
        operators — exact same math as _forward + gather (n_layers<=2,
        mm_layers==1, frozen item_adj)."""
        xu, xi = params["user_embedding"], params["item_embedding"]
        dt = self.graph.dense_r.dtype
        xu_c, xi_c = xu.astype(dt), xi.astype(dt)
        u = xu[users] + jnp.dot(self.graph.dense_r[users], xi_c,
                                preferred_element_type=jnp.float32)
        i = xi[items] + jnp.dot(self._rt[items], xu_c,
                                preferred_element_type=jnp.float32)
        if self.n_layers == 2:
            u = u + jnp.dot(self._rrt[users], xu_c,
                            preferred_element_type=jnp.float32)
            i = i + jnp.dot(self._rtr[items], xi_c,
                            preferred_element_type=jnp.float32)
        s = 1.0 / (self.n_layers + 1)
        if self.dense_items:
            h_rows = jnp.dot(item_adj[items], xi.astype(item_adj.dtype),
                             preferred_element_type=jnp.float32)
        else:
            from chaorec_tpu.graphs.knn import gather_weighted_sum

            vals, idx = item_adj
            h_rows = gather_weighted_sum(xi, vals[items], idx[items])
        return u * s, i * s + l2norm(h_rows)

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        # The WHOLE loss sits under the rebuild cond, not just the graph
        # choice: in the frozen branch item_adj is a stop_gradient
        # constant, so its VJP never materializes the (I, I) cotangent
        # (793 MB fp32 on microlens) that a graph-level cond would form
        # on EVERY step to feed the batch-0 branch's build VJP.
        def _loss_with(item_adj):
            fu, fi = self._forward(params, item_adj)
            u = fu[batch.users]
            pos = fi[batch.pos_items]
            neg = fi[batch.neg_items]
            w = batch.weights
            total = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w,
                             eps=1e-5)
            total = total + emb_l2_reg(self.reg_weight, (u, pos, neg), w)
            return total, jax.lax.stop_gradient(item_adj)

        def _loss_rows(item_adj):
            # frozen-graph fast path: batch rows only (see _rows)
            b = batch.pos_items.shape[0]
            items = jnp.concatenate([batch.pos_items, batch.neg_items])
            u, both = self._rows(params, item_adj, batch.users, items)
            pos, neg = both[:b], both[b:]
            w = batch.weights
            total = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w,
                             eps=1e-5)
            total = total + emb_l2_reg(self.reg_weight, (u, pos, neg), w)
            return total, item_adj

        frozen = (_loss_rows if self._rt is not None else
                  lambda adj: _loss_with(adj))
        return jax.lax.cond(
            batch.index == 0,
            lambda: _loss_with(self._build_item_adj(params)),
            lambda: frozen(jax.lax.stop_gradient(state)),
        )

    def embeddings_stateful(self, params: Params, state):
        return self._forward(params, state)
