"""VBPR: visual BPR.

Reference: Model/VBPR.py. Capabilities reproduced:
- item representation = [id embedding (dim_E) || Linear(v_feat) (64)];
  user embedding widened to dim_E + 64 (visual_embedding is hard-coded 64
  regardless of the feature_embedding argument — Model/VBPR.py:25-37 quirk
  kept);
- the raw visual features are a *trainable* table (Embedding.from_pretrained
  freeze=False, Model/VBPR.py:35);
- BPR(+1e-5) + mean reg on the concatenated embeddings (Model/VBPR.py:49-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


class VBPR(RecModel):
    name = "VBPR"
    visual_embedding = 64  # Model/VBPR.py:25

    def __init__(self, num_user, num_item, v_feat: jnp.ndarray, dim_E,
                 feature_embedding, reg_weight):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.v_dim = int(v_feat.shape[1])
        self._v_feat_init = v_feat

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 3)
        w, b = torch_linear_init(ks[2], self.visual_embedding, self.v_dim)
        return {
            "user_embedding": xavier_uniform(
                ks[0], (self.num_user, self.dim_E + self.visual_embedding)
            ),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "v_feat": self._v_feat_init,  # trainable (freeze=False)
            "item_linear_w": xavier_uniform(
                jax.random.fold_in(ks[2], 1), (self.visual_embedding, self.v_dim)
            ),
            "item_linear_b": b,
        }

    def _item_table(self, params: Params) -> jnp.ndarray:
        vis = params["v_feat"] @ params["item_linear_w"].T + params["item_linear_b"]
        return jnp.concatenate([params["item_embedding"], vis], axis=1)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        items = self._item_table(params)
        u = params["user_embedding"][batch.users]
        pos = items[batch.pos_items]
        neg = items[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        return bpr + reg

    def embeddings(self, params: Params):
        return params["user_embedding"], self._item_table(params)
