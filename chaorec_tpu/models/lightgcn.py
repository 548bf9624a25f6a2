"""LightGCN: linear graph convolution CF.

Reference: Model/LightGCN.py. Capabilities reproduced:
- undirected symmetric-normalized propagation without self-loops or
  feature transforms (Model/LightGCN.py:21-46) — here one
  ``BipartiteGraph.propagate`` per layer (MXU dense or segment-sum path);
- final embedding = uniform mean of layer-0..n embeddings
  (Model/LightGCN.py:86-93);
- BPR loss with +1e-5 inside the log (Model/LightGCN.py:108) computed on
  the *propagated* embeddings, mean-style L2 regularization on the same
  (Model/LightGCN.py:112-121);
- ranking from the propagated tables (Model/LightGCN.py:137-162), which on
  TPU stays fused on device (eval/ranking.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from typing import Optional

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.linear_prop import CombinedLinearOp
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


class LightGCN(RecModel):
    name = "LightGCN"

    def __init__(
        self,
        num_user: int,
        num_item: int,
        graph: BipartiteGraph,
        dim_E: int,
        reg_weight: float,
        n_layers: int,
        linear_op: Optional[CombinedLinearOp] = None,
    ):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        # Precomputed mean-of-powers operator (ops/linear_prop.py): training
        # batches then touch only B rows of the propagation instead of
        # re-propagating the full graph (mathematically identical).
        self.linear_op = linear_op

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def propagate(self, params: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        u, i = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = u, i
        cur_u, cur_i = u, i
        for _ in range(self.n_layers):
            cur_u, cur_i = self.graph.propagate(cur_u, cur_i)
            acc_u = acc_u + cur_u
            acc_i = acc_i + cur_i
        scale = 1.0 / (self.n_layers + 1)
        return acc_u * scale, acc_i * scale

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        if self.linear_op is not None:
            e_u, e_i = params["user_embedding"], params["item_embedding"]
            u = self.linear_op.user_rows(batch.users, e_u, e_i)
            # one fused (2B)-row gather+matmul for pos and neg items
            b = batch.pos_items.shape[0]
            both = self.linear_op.item_rows(
                jnp.concatenate([batch.pos_items, batch.neg_items]),
                e_u, e_i)
            pos, neg = both[:b], both[b:]
        else:
            user_emb, item_emb = self.propagate(params)
            u = user_emb[batch.users]
            pos = item_emb[batch.pos_items]
            neg = item_emb[batch.neg_items]
        pos_scores = jnp.sum(u * pos, axis=1)
        neg_scores = jnp.sum(u * neg, axis=1)
        w = batch.weights
        return bpr_loss(pos_scores, neg_scores, w, eps=1e-5) + emb_l2_reg(
            self.reg_weight, (u, pos, neg), w
        )

    def embeddings(self, params: Params):
        if self.linear_op is not None:
            return self.linear_op.full(
                params["user_embedding"], params["item_embedding"]
            )
        return self.propagate(params)
