"""DualGNN: dual user-item / user-user graph network.

Reference: Model/DualGNN.py. Capabilities reproduced:
- per-modality GCN tower (Model/DualGNN.py:24-93): trainable user
  preference table (xavier-normal) || MLP(4d)->LeakyReLU->Linear(d) of the
  raw features, row-normalized, 2 propagation layers (sym-norm, no self
  loops), output = x + h + h1;
- weighted_sum fusion: user side = [v_rep_u | t_rep_u] (U, d, 2) x
  weight_u (U, 2, 1) with weight_u initialized to softmaxed xavier values
  (Model/DualGNN.py:141-160,171-186); item side = v_rep + t_rep;
- user-user aggregation over the co-occurrence graph: per-epoch (U, k)
  neighbor resample with softmax(count) weights (pre_epoch hook;
  Model/DualGNN.py:315-358; graphs/user_graph.py), h_u = sum_k w * rep[nbr];
- loss = BPR(+1e-5) + reg_weight * (mean v_pref[u]^2 + mean t_pref[u]^2 +
  mean weight_u^2 + mean weight_i^2) (Model/DualGNN.py:282-300).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.graphs.user_graph import build_user_cooccurrence, topk_sample
from chaorec_tpu.graphs.knn import gather_weighted_sum
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import bpr_loss, l2norm, masked_mean


class DualGNN(RecModel):
    name = "DualGNN"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, edges,
                 v_feat, t_feat, dim_E, feature_embedding, reg_weight, uu_topk):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_latent = dim_E
        self.dim_feat = feature_embedding
        self.reg_weight = reg_weight
        self.k = uu_topk
        self.v_feat = v_feat
        self.t_feat = t_feat
        uu_idx, uu_cnt, uu_len = build_user_cooccurrence(
            np.asarray(edges), num_user, num_item
        )
        self._uu = (uu_idx, uu_cnt, uu_len)
        # per-epoch sampled neighbor graph (leaves; refreshed by pre_epoch)
        rs = np.random.default_rng(0)
        idx, w = topk_sample(uu_idx, uu_cnt, uu_len, self.k, rs)
        self.user_nbr_idx = jnp.asarray(idx)
        self.user_nbr_w = jnp.asarray(w)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 8)
        d = self.dim_latent
        p = {
            "v_preference": xavier_normal(ks[0], (self.num_user, self.dim_feat)),
            "t_preference": xavier_normal(ks[1], (self.num_user, self.dim_feat)),
            "weight_u": jax.nn.softmax(
                xavier_normal(ks[2], (self.num_user, 2, 1)), axis=1
            ),
            "weight_i": jax.nn.softmax(
                xavier_normal(ks[3], (self.num_item, 2, 1)), axis=1
            ),
        }
        for mod, feat, k1, k2 in (
            ("v", self.v_feat, ks[4], ks[5]),
            ("t", self.t_feat, ks[6], ks[7]),
        ):
            w1, b1 = torch_linear_init(k1, 4 * d, feat.shape[1])
            w2, b2 = torch_linear_init(k2, d, 4 * d)
            p[f"{mod}_mlp_w1"], p[f"{mod}_mlp_b1"] = w1, b1
            p[f"{mod}_mlp_w2"], p[f"{mod}_mlp_b2"] = w2, b2
        return p

    def _towers(self, params):
        """Both modality towers through ONE 2d-wide propagation pair:
        the shared adjacency is columnwise-independent, so splitting the
        batched result gives exactly the per-tower outputs (one edge
        gather per layer instead of two — see COHESION._towers)."""
        cus, cis = [], []
        for mod, feat in (("v", self.v_feat), ("t", self.t_feat)):
            tf = jax.nn.leaky_relu(
                feat @ params[f"{mod}_mlp_w1"].T + params[f"{mod}_mlp_b1"],
                0.01)
            tf = tf @ params[f"{mod}_mlp_w2"].T + params[f"{mod}_mlp_b2"]
            x = l2norm(jnp.concatenate(
                [params[f"{mod}_preference"], tf], axis=0))
            cus.append(x[: self.num_user])
            cis.append(x[self.num_user:])
        cu = jnp.concatenate(cus, axis=1)
        ci = jnp.concatenate(cis, axis=1)
        h_u, h_i = self.graph.propagate(cu, ci)
        h1_u, h1_i = self.graph.propagate(h_u, h_i)
        au, ai = cu + h_u + h1_u, ci + h_i + h1_i
        (vu, tu), (vi, ti) = jnp.split(au, 2, 1), jnp.split(ai, 2, 1)
        return vu, vi, tu, ti

    def forward(self, params: Params):
        vu, vi, tu, ti = self._towers(params)
        item_rep = vi + ti
        stacked = jnp.stack([vu, tu], axis=2)  # (U, d, 2)
        user_rep = jnp.squeeze(
            jnp.matmul(stacked, params["weight_u"]), axis=2
        )
        h_u1 = gather_weighted_sum(user_rep, self.user_nbr_w,
                                   self.user_nbr_idx)
        return user_rep + h_u1, item_rep

    def pre_epoch(self, params, rng, epoch: int) -> None:
        rs = np.random.default_rng(epoch * 104729 + 7)
        idx, w = topk_sample(*self._uu, self.k, rs)
        self.user_nbr_idx = jnp.asarray(idx)
        self.user_nbr_w = jnp.asarray(w)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        # user-graph aggregation rows are independent: compute only the
        # batch users' rows (identical math to forward()+gather; the
        # full-table (U, 40) gather+backward dominated the step otherwise
        # — see COHESION.loss)
        vu, vi, tu, ti = self._towers(params)
        fi = vi + ti
        stacked = jnp.stack([vu, tu], axis=2)
        user_rep = jnp.squeeze(
            jnp.matmul(stacked, params["weight_u"]), axis=2
        )
        bu = batch.users
        u = user_rep[bu] + gather_weighted_sum(
            user_rep, self.user_nbr_w[bu], self.user_nbr_idx[bu])
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * (
            masked_mean(jnp.mean(params["v_preference"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["t_preference"][batch.users] ** 2, 1), w)
            + jnp.mean(params["weight_u"] ** 2)
            + jnp.mean(params["weight_i"] ** 2)
        )
        return bpr + reg

    def embeddings(self, params: Params):
        return self.forward(params)
