"""DDRec: dual denoising with threshold-gated edge filtering.

Reference: Model/DDRec.py. Capabilities reproduced:
- fixed internals mm_layers=1, knn_k=10, mm_image_weight=0.5; frozen raw
  features with xavier-normal trs projections (Model/DDRec.py:37-60);
- modality towers over (user table, modal item features): per layer the
  edge set is filtered by thresholding the current u.i similarity of each
  edge's endpoints, degrees recomputed on the kept edges (filter_edges,
  Model/DDRec.py:116-175 — realized as a per-layer renormalized edge
  mask); layer mean incl. ego;
- **cross-step state**: the previous step's final item embedding gates
  the modal inputs through sigmoid "guide" MLPs (final_i_g_embeddings
  detached, Model/DDRec.py:105-110) — threaded via the stateful protocol;
- id tower = plain LightGCN mean; each item output += one mm-graph
  propagation (mixed 1/k kNN laplacian);
- final = concat of the three towers per side; loss = BPR(+1e-5) +
  mean reg (concat) + ssl_alpha * 4 in-batch CE terms (modal-vs-id,
  Model/DDRec.py:248-281).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.knn import ELLGraph, build_knn_graph
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.slmrec import in_batch_ce
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


class DDRec(RecModel):
    name = "DDRec"
    stateful = True
    mm_layers = 1
    knn_k = 10
    mm_image_weight = 0.5

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, feat_E, reg_weight, n_layers, ssl_temp,
                 ssl_alpha, threshold):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.feat_E = feat_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        self.threshold = threshold
        self.v_feat = v_feat  # frozen
        self.t_feat = t_feat
        k = min(self.knn_k, num_item)
        gv = build_knn_graph(v_feat, k, norm="ref_laplacian")
        gt = build_knn_graph(t_feat, k, norm="ref_laplacian")
        self.mm_graph = ELLGraph(
            jnp.concatenate([gv.indices, gt.indices], axis=1),
            jnp.concatenate(
                [self.mm_image_weight * gv.weights,
                 (1 - self.mm_image_weight) * gt.weights], axis=1,
            ),
        )

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 8)
        p = {
            "user_embedding": xavier_normal(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_normal(ks[1], (self.num_item, self.dim_E)),
            "image_trs_w": xavier_normal(ks[2], (self.feat_E, self.v_feat.shape[1])),
            "text_trs_w": xavier_normal(ks[3], (self.feat_E, self.t_feat.shape[1])),
        }
        _, p["image_trs_b"] = torch_linear_init(ks[4], self.feat_E, self.v_feat.shape[1])
        _, p["text_trs_b"] = torch_linear_init(ks[5], self.feat_E, self.t_feat.shape[1])
        for name, k in (("guide_image", ks[6]), ("guide_text", ks[7])):
            w, b = torch_linear_init(k, self.feat_E, self.feat_E)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        return p

    def init_state(self, rng: jax.Array):
        return (jnp.zeros(()), jnp.zeros((self.num_item, self.dim_E)))

    def _filtered_tower(self, xu, xi):
        """Per-layer threshold-filtered, renormalized propagation."""
        g = self.graph
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            sim = jnp.sum(cu[g.u_by_u] * ci[g.i_by_u], axis=1)
            keep = (sim >= self.threshold).astype(jnp.float32)
            du = jax.ops.segment_sum(keep, g.u_by_u, num_segments=self.num_user)
            di = jax.ops.segment_sum(keep, g.i_by_u, num_segments=self.num_item)
            w = keep * jax.lax.rsqrt(
                jnp.maximum(du[g.u_by_u] * di[g.i_by_u], 1e-12)
            )
            r = jnp.zeros((self.num_user, self.num_item), jnp.float32).at[
                g.u_by_u, g.i_by_u
            ].add(w)
            cu, ci = (
                jnp.dot(r, ci, preferred_element_type=jnp.float32),
                jnp.dot(r.T, cu, preferred_element_type=jnp.float32),
            )
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def _id_tower(self, xu, xi):
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            cu, ci = self.graph.propagate(cu, ci)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def forward(self, params: Params, state):
        has_prev, prev_items = state
        v_emb = self.v_feat @ params["image_trs_w"].T + params["image_trs_b"]
        t_emb = self.t_feat @ params["text_trs_w"].T + params["text_trs_b"]
        gate_v = jax.nn.sigmoid(v_emb @ params["guide_image_w"].T + params["guide_image_b"])
        gate_t = jax.nn.sigmoid(t_emb @ params["guide_text_w"].T + params["guide_text_b"])
        visual = jnp.where(has_prev > 0, prev_items * gate_v, v_emb)
        textual = jnp.where(has_prev > 0, prev_items * gate_t, t_emb)

        u_v, i_v = self._filtered_tower(params["user_embedding"], visual)
        u_t, i_t = self._filtered_tower(params["user_embedding"], textual)
        u_g, i_g = self._id_tower(params["user_embedding"], params["item_embedding"])

        final_i_g = i_g + self.mm_graph.propagate(i_g)
        i_v = i_v + self.mm_graph.propagate(i_v)
        i_t = i_t + self.mm_graph.propagate(i_t)

        fu = jnp.concatenate([u_g, u_v, u_t], axis=1)
        fi = jnp.concatenate([final_i_g, i_v, i_t], axis=1)
        views = (u_g, u_v, u_t, final_i_g, i_v, i_t)
        return fu, fi, views, final_i_g

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        fu, fi, (u_g, u_v, u_t, fin_i_g, i_v, i_t), final_i_g = self.forward(
            params, state
        )
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        bu, bi = batch.users, batch.pos_items
        cl = (
            in_batch_ce(l2norm(u_v[bu]), l2norm(u_g[bu]), self.ssl_temp, w)
            + in_batch_ce(l2norm(u_t[bu]), l2norm(u_g[bu]), self.ssl_temp, w)
            + in_batch_ce(l2norm(i_v[bi]), l2norm(fin_i_g[bi]), self.ssl_temp, w)
            + in_batch_ce(l2norm(i_t[bi]), l2norm(fin_i_g[bi]), self.ssl_temp, w)
        )
        new_state = (jnp.ones(()), jax.lax.stop_gradient(final_i_g))
        return bpr + reg + self.ssl_alpha * cl, new_state

    def embeddings_stateful(self, params: Params, state):
        fu, fi, _, _ = self.forward(params, state)
        return fu, fi
