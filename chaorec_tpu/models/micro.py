"""MICRO: LATTICE + modality-fusion contrastive alignment.

Reference: Model/MICRO.py. Capabilities reproduced:
- per-modality graphs: frozen original kNN laplacians + learned graphs
  rebuilt on the FIRST batch of each epoch from projected features, mixed
  per modality as (1-lambda)*learned + lambda*original
  (Model/MICRO.py:193-210; stateful + batch.index cond);
- **single-propagation quirk kept**: the reference's n_ii_layer loop body
  never feeds back (``self.image_item_embeds = mm(adj, image_item_embeds)``
  with an unchanged loop variable, Model/MICRO.py:214-218) so each modal
  view is exactly one propagation of the item table;
- attention fusion: shared query MLP (Linear-tanh-Linear(1)) -> softmax
  over modalities; item output += normalized fused h
  (Model/MICRO.py:220-232);
- contrastive: full-catalog InfoNCE (refl + between denominators) between
  each modal view and the fused h over ALL items, mean
  (Model/MICRO.py:170-191), weight ssl_alpha;
- BPR(+1e-5) + mean reg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.ell import ell_rows_matvec, knn_topk_ell, topk_sym_norm_ell
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


def full_catalog_cl(z1, z2, tau, fast: bool = False):
    """mean_i -log( e(s(z1_i,z2_i)/t) / (sum_j e(s(z1_i,z1_j)/t) +
    sum_j e(s(z1_i,z2_j)/t) - e(s(z1_i,z1_i)/t)) )  (Model/MICRO.py:170-191).

    ``fast`` (gated on cfg.graph_compute_dtype == "bfloat16", the same
    knob as the multimodal towers) evaluates the denominator in the LOG
    domain through one streaming logsumexp over the concatenated
    catalog [z1; z2] (ops/losses.catalog_logsumexp → the Pallas
    flash-style kernel on TPU): sum_j e(s(i,z1_j)) + sum_j e(s(i,z2_j))
    = e(lse_i), and the self term is removed stably via
    log1p(-e(s_ii - lse_i)). The (I, I) refl/betw exponential matrices —
    four catalog-sized HBM materializations per step in the direct
    form — never exist. ``fast=False`` keeps the reference's exact fp32
    formulation (MMSSL's batch-sized calls also use it — at (B, B) size
    the direct form is already cheap)."""
    n1, n2 = l2norm(z1), l2norm(z2)
    pos_s = jnp.sum(n1 * n2, axis=1) / tau
    if fast:
        from chaorec_tpu.ops.losses import catalog_logsumexp

        lse = catalog_logsumexp(n1, jnp.concatenate([n1, n2], 0), tau)
        self_s = jnp.sum(n1 * n1, axis=1) / tau
        log_denom = lse + jnp.log1p(-jnp.exp(self_s - lse))
        return jnp.mean(-jnp.log(jnp.exp(pos_s - log_denom) + 1e-12))
    refl = jnp.exp(jnp.dot(n1, n1.T, preferred_element_type=jnp.float32) / tau)
    betw = jnp.exp(jnp.dot(n1, n2.T, preferred_element_type=jnp.float32) / tau)
    denom = refl.sum(1) + betw.sum(1) - jnp.diagonal(refl)
    return jnp.mean(-jnp.log(jnp.exp(pos_s) / denom + 1e-12))


class MICRO(RecModel):
    name = "MICRO"
    stateful = True
    # Gradients reach these ONLY through the batch-0 modal-graph rebuild
    # (Model/MICRO.py:118-137; the carried ELL graphs are detached off
    # batch 0); off batch 0 they get torch 1.11's zero-grad Adam drift
    # via the closed-form tail — see base.py epoch0_params.
    epoch0_params = ("v_feat", "t_feat", "image_trs_w", "image_trs_b",
                     "text_trs_w", "text_trs_b")
    # graph rebuilt only on batch 0: batches 1..N-1 scan with the
    # carried state as an invariant (no per-step state copy, loop.py)
    frozen_state_epoch = True

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, n_layers, reg_weight, ii_topk, mm_layers,
                 ssl_temp, lambda_coeff, ssl_alpha,
                 compute_dtype: str = "bfloat16"):
        super().__init__(num_user, num_item)
        # ELL carried graph state stays fp32-exact; the gate only routes
        # the full-catalog InfoNCE through the streaming log-domain path
        # (Pallas LSE on TPU — no (I, I) exponential materialization).
        self.cl_fast = compute_dtype == "bfloat16"
        self.graph = graph
        self.dim_E = dim_E
        self.n_ui_layers = n_layers
        self.reg_weight = reg_weight
        self.topk = ii_topk
        self.tau = ssl_temp
        self.lambda_coeff = lambda_coeff
        self.beta = ssl_alpha
        self._v_init = v_feat
        self._t_init = t_feat
        # Frozen modal graphs in ELL (vals, idx) form — see LATTICE: the
        # dense (I, I) similarity exists only transiently inside top_k.
        self.image_original = topk_sym_norm_ell(*knn_topk_ell(v_feat, ii_topk))
        self.text_original = topk_sym_norm_ell(*knn_topk_ell(t_feat, ii_topk))

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 7)
        vw, vb = torch_linear_init(ks[2], self.dim_E, self._v_init.shape[1])
        tw, tb = torch_linear_init(ks[3], self.dim_E, self._t_init.shape[1])
        q1w, q1b = torch_linear_init(ks[4], self.dim_E, self.dim_E)
        q2w, _ = torch_linear_init(ks[5], 1, self.dim_E)
        return {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "v_feat": self._v_init, "t_feat": self._t_init,
            "image_trs_w": vw, "image_trs_b": vb,
            "text_trs_w": tw, "text_trs_b": tb,
            "query_w1": q1w, "query_b1": q1b, "query_w2": q2w,
        }

    def init_state(self, rng: jax.Array):
        # Carried modal ELL graphs; shapes match _build_adjs' output
        # ((I, 2K): zero-weighted learned block + original block).
        def padded(orig):
            ov, oi = orig
            return (jnp.concatenate([jnp.zeros_like(ov), ov], 1),
                    jnp.concatenate([oi, oi], 1))

        return padded(self.image_original), padded(self.text_original)

    def _build_adjs(self, params: Params):
        """Per-modality learned + original graphs in ELL form.

        Dense equivalent (Model/MICRO.py:118-137): ``(1-λ) norm(knn(proj))
        + λ orig`` per modality — the sum of two top-k graphs is the
        concatenation of their (vals, idx) blocks (duplicate slots sum in
        matvec, exactly like adding dense matrices)."""
        image_feats = params["v_feat"] @ params["image_trs_w"].T + params["image_trs_b"]
        text_feats = params["t_feat"] @ params["text_trs_w"].T + params["text_trs_b"]

        def mix(feats, orig):
            lv, li = topk_sym_norm_ell(*knn_topk_ell(feats, self.topk))
            ov, oi = orig
            return (jnp.concatenate([(1 - self.lambda_coeff) * lv,
                                     self.lambda_coeff * ov], 1),
                    jnp.concatenate([li, oi], 1))

        return (mix(image_feats, self.image_original),
                mix(text_feats, self.text_original))

    def _query(self, params, x):
        h = jnp.tanh(x @ params["query_w1"].T + params["query_b1"])
        return h @ params["query_w2"].T  # (N, 1)

    def _forward(self, params: Params, adjs):
        img_adj, txt_adj = adjs
        items = params["item_embedding"]
        image_item = ell_rows_matvec(*img_adj, items)
        text_item = ell_rows_matvec(*txt_adj, items)
        att = jnp.concatenate(
            [self._query(params, image_item), self._query(params, text_item)], -1
        )
        w = jax.nn.softmax(att, axis=-1)
        h = w[:, :1] * image_item + w[:, 1:] * text_item

        xu, xi = params["user_embedding"], items
        acc_u, acc_i = xu, xi
        for _ in range(self.n_ui_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        s = 1.0 / (self.n_ui_layers + 1)
        return acc_u * s, acc_i * s + l2norm(h), image_item, text_item, h

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        adjs = jax.lax.cond(
            batch.index == 0,
            lambda: self._build_adjs(params),
            lambda: jax.tree.map(jax.lax.stop_gradient, state),
        )
        fu, fi, img_i, txt_i, h = self._forward(params, adjs)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        total = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        total = total + emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        cl = (full_catalog_cl(img_i, h, self.tau, self.cl_fast)
              + full_catalog_cl(txt_i, h, self.tau, self.cl_fast))
        return total + self.beta * cl, jax.tree.map(jax.lax.stop_gradient, adjs)

    def embeddings_stateful(self, params: Params, state):
        fu, fi, *_ = self._forward(params, state)
        return fu, fi
