"""MGCL: modality-vs-id contrastive graph CF.

Reference: Model/MGCL.py. Capabilities reproduced:
- three LightGCN towers (mean layers 0..n): (id_user, id_item),
  (v_user_table, Linear(v_feat)), (t_user_table, Linear(t_feat)) — each
  modality has its own user table (Model/MGCL.py:36-88);
- loss = sum of BPR(+1e-5) + mean reg over the three towers + ssl_alpha *
  (CE(id, v) + CE(id, t)) on normalized batch rows for users and pos
  items (in-batch negatives; Model/MGCL.py:92-167);
- ranking from the id tower only (result = id tower output,
  Model/MGCL.py:63-68,170-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.slmrec import in_batch_ce
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


class MGCL(RecModel):
    name = "MGCL"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        self.v_feat = v_feat
        self.t_feat = t_feat

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 6)
        _, vb = torch_linear_init(jax.random.fold_in(ks[4], 1), self.dim_E,
                                  self.v_feat.shape[1])
        _, tb = torch_linear_init(jax.random.fold_in(ks[5], 1), self.dim_E,
                                  self.t_feat.shape[1])
        return {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "user_embedding_v": xavier_uniform(ks[2], (self.num_user, self.dim_E)),
            "user_embedding_t": xavier_uniform(ks[3], (self.num_user, self.dim_E)),
            "image_trs_w": xavier_uniform(ks[4], (self.dim_E, self.v_feat.shape[1])),
            "image_trs_b": vb,
            "text_trs_w": xavier_uniform(ks[5], (self.dim_E, self.t_feat.shape[1])),
            "text_trs_b": tb,
            "lambda_m": jnp.asarray(0.1, jnp.float32),
        }

    def _tower(self, xu, xi):
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            cu, ci = self.graph.propagate(cu, ci)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def forward(self, params: Params):
        v_emb = self.v_feat @ params["image_trs_w"].T + params["image_trs_b"]
        t_emb = self.t_feat @ params["text_trs_w"].T + params["text_trs_b"]
        # one 3d-wide propagation serves all three towers (the shared
        # adjacency is columnwise-independent; exact per-tower results)
        au, ai = self._tower(
            jnp.concatenate([params["user_embedding"],
                             params["user_embedding_v"],
                             params["user_embedding_t"]], 1),
            jnp.concatenate([params["item_embedding"], v_emb, t_emb], 1))
        u_g, u_v, u_t = jnp.split(au, 3, 1)
        i_g, i_v, i_t = jnp.split(ai, 3, 1)
        return u_g, i_g, u_v, i_v, u_t, i_t

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        u_g, i_g, u_v, i_v, u_t, i_t = self.forward(params)
        bu, bi, bn, w = batch.users, batch.pos_items, batch.neg_items, batch.weights
        total = 0.0
        for uu, ii in ((u_g, i_g), (u_v, i_v), (u_t, i_t)):
            u, pos, neg = uu[bu], ii[bi], ii[bn]
            total = total + bpr_loss(
                jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5
            ) + emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        cl = in_batch_ce(l2norm(u_g[bu]), l2norm(u_v[bu]), self.ssl_temp, w)
        cl = cl + in_batch_ce(l2norm(u_g[bu]), l2norm(u_t[bu]), self.ssl_temp, w)
        cl = cl + in_batch_ce(l2norm(i_g[bi]), l2norm(i_v[bi]), self.ssl_temp, w)
        cl = cl + in_batch_ce(l2norm(i_g[bi]), l2norm(i_t[bi]), self.ssl_temp, w)
        return total + self.ssl_alpha * cl

    def embeddings(self, params: Params):
        u_g, i_g, *_ = self.forward(params)
        return u_g, i_g
