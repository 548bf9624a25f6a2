"""DRAGON: DualGNN towers + frozen multimodal item graph, 'cat' fusion.

Reference: Model/DRAGON.py. Capabilities reproduced (deltas vs DualGNN):
- fusion 'cat': user rep = concat of weight_u-scaled per-modality tower
  outputs (U, 2d); item rep = concat of tower item parts (I, 2d)
  (Model/DRAGON.py:282-296);
- frozen mm kNN item graph (FREEDOM-style 1/k laplacian mixed by
  mm_image_weight — builder passes lambda_coeff per main.py:284-286 slot
  order) applied n_layers times; item_rep += h_i (Model/DRAGON.py:303-310);
- user-user aggregation + per-epoch resample identical to DualGNN;
- reg: v/t preference (batch users) + weight_u means (Model/DRAGON.py:331-341).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.knn import ELLGraph, build_knn_graph, gather_weighted_sum
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.dualgnn import DualGNN
from chaorec_tpu.ops.losses import bpr_loss, masked_mean


class DRAGON(DualGNN):
    name = "DRAGON"

    def __init__(self, num_user, num_item, graph, edges, v_feat, t_feat,
                 dim_E, feature_embedding, reg_weight, n_layers, ii_topk,
                 uu_topk, mm_image_weight):
        super().__init__(num_user, num_item, graph, edges, v_feat, t_feat,
                         dim_E, feature_embedding, reg_weight, uu_topk)
        self.n_mm_layers = n_layers
        gv = build_knn_graph(v_feat, ii_topk, norm="ref_laplacian")
        gt = build_knn_graph(t_feat, ii_topk, norm="ref_laplacian")
        self.mm_graph = ELLGraph(
            jnp.concatenate([gv.indices, gt.indices], axis=1),
            jnp.concatenate(
                [mm_image_weight * gv.weights, (1 - mm_image_weight) * gt.weights], 1
            ),
        )

    def forward(self, params: Params):
        vu, vi, tu, ti = self._towers(params)
        item_rep = jnp.concatenate([vi, ti], axis=1)  # (I, 2d)
        w = params["weight_u"]  # (U, 2, 1)
        user_rep = jnp.concatenate(
            [w[:, 0] * vu, w[:, 1] * tu], axis=1
        )  # (U, 2d)
        h_u = gather_weighted_sum(user_rep, self.user_nbr_w,
                                  self.user_nbr_idx)
        user_rep = user_rep + h_u
        h_i = item_rep
        for _ in range(self.n_mm_layers):
            h_i = self.mm_graph.propagate(h_i)
        return user_rep, item_rep + h_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        # batch-rows-only user/mm-graph aggregation (see COHESION.loss)
        vu, vi, tu, ti = self._towers(params)
        item_rep = jnp.concatenate([vi, ti], axis=1)
        wq = params["weight_u"]
        user_rep = jnp.concatenate([wq[:, 0] * vu, wq[:, 1] * tu], axis=1)
        bu = batch.users
        u = user_rep[bu] + gather_weighted_sum(
            user_rep, self.user_nbr_w[bu], self.user_nbr_idx[bu])
        items2 = jnp.concatenate([batch.pos_items, batch.neg_items])
        if self.n_mm_layers == 1:
            h_rows = gather_weighted_sum(
                item_rep, self.mm_graph.weights[items2],
                self.mm_graph.indices[items2])
        else:
            h = item_rep
            for _ in range(self.n_mm_layers):
                h = self.mm_graph.propagate(h)
            h_rows = h[items2]
        both = item_rep[items2] + h_rows
        b = batch.pos_items.shape[0]
        pos, neg = both[:b], both[b:]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * (
            masked_mean(jnp.mean(params["v_preference"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["t_preference"][batch.users] ** 2, 1), w)
            + jnp.mean(params["weight_u"] ** 2)
        )
        return bpr + reg
