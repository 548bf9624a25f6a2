"""BPR matrix factorization with item bias.

Reference: Model/BPR.py (class ``BPRMF``). Capabilities reproduced:
- id embeddings (xavier-normal) + zero-init item bias (Model/BPR.py:21-31);
- scores = <u, i> + b_i (Model/BPR.py:44-47);
- BPR loss = -mean(log(sigmoid(pos - neg))) with *no* epsilon
  (Model/BPR.py:58);
- regularization = reg_weight * (mean(u^2) + mean(pos^2) + mean(neg))
  — note the reference leaves the negative-item term **unsquared**
  (Model/BPR.py:60); kept bit-for-bit for parity;
- ranking scores omit the bias (Model/BPR.py:71-78 uses raw embedding
  matmul), also kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_normal
from chaorec_tpu.ops.losses import masked_mean


class BPRMF(RecModel):
    name = "BPR"

    def __init__(self, num_user: int, num_item: int, dim_E: int, reg_weight: float):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_normal(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_normal(k_i, (self.num_item, self.dim_E)),
            "item_bias": jnp.zeros((self.num_item,), jnp.float32),
        }

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        u = params["user_embedding"][batch.users]
        pos = params["item_embedding"][batch.pos_items]
        neg = params["item_embedding"][batch.neg_items]
        pos_b = params["item_bias"][batch.pos_items]
        neg_b = params["item_bias"][batch.neg_items]
        pos_scores = jnp.sum(u * pos, axis=1) + pos_b
        neg_scores = jnp.sum(u * neg, axis=1) + neg_b
        w = batch.weights
        bpr = -masked_mean(jnp.log(jax.nn.sigmoid(pos_scores - neg_scores)), w)
        # Reference quirk kept: neg term is mean(e), not mean(e^2)
        # (Model/BPR.py:60).
        reg = self.reg_weight * (
            masked_mean(jnp.mean(u ** 2, axis=1), w)
            + masked_mean(jnp.mean(pos ** 2, axis=1), w)
            + masked_mean(jnp.mean(neg, axis=1), w)
        )
        return bpr + reg

    def embeddings(self, params: Params):
        return params["user_embedding"], params["item_embedding"]
