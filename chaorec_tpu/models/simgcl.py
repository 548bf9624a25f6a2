"""SimGCL: noise-perturbed contrastive graph CF.

Reference: Model/SimGCL.py. Capabilities reproduced:
- forward = mean of propagation layers 1..L (the ego layer is *excluded*:
  ``all_embeddings`` only collects post-conv embeddings,
  Model/SimGCL.py:107-124);
- perturbed forward adds per-layer noise ``sign(x) * normalize(U[0,1)) *
  eps`` with eps = 0.1 (Model/SimGCL.py:115-118, :49);
- loss = BPR(+1e-5) + reg_weight * (mean u^2 + mean pos^2)  [no neg term,
  Model/SimGCL.py:143-148] + ssl_reg * (InfoNCE_user + InfoNCE_item) over
  two independent perturbed views at the batch rows with in-batch
  negatives (Model/SimGCL.py:150-156, InfoNCE at :16-31);
- ranking from the unperturbed forward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.linear_prop import CombinedLinearOp
from chaorec_tpu.ops.losses import bpr_loss, info_nce, masked_mean


def _perturb(rng, x, eps):
    noise = jax.random.uniform(rng, x.shape, x.dtype)
    noise = noise / (jnp.linalg.norm(noise, axis=-1, keepdims=True) + 1e-12)
    return x + jnp.sign(x) * noise * eps


class SimGCL(RecModel):
    name = "SimGCL"
    eps = 0.1  # Model/SimGCL.py:49

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_reg,
                 linear_op: Optional[CombinedLinearOp] = None):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_reg = ssl_reg
        # Mean-of-layers-1..L operator (layer weights (0, 1/L, ..)):
        # accelerates the unperturbed (BPR) path.
        self.linear_op = linear_op

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def forward(self, params: Params, rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u = jnp.zeros_like(xu)
        acc_i = jnp.zeros_like(xi)
        for l in range(self.n_layers):
            xu, xi = self.graph.propagate(xu, xi)
            if rng is not None:
                rng, ku, ki = jax.random.split(rng, 3)
                xu = _perturb(ku, xu, self.eps)
                xi = _perturb(ki, xi, self.eps)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        return acc_u / self.n_layers, acc_i / self.n_layers

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        e_u, e_i = params["user_embedding"], params["item_embedding"]
        w = batch.weights
        if self.linear_op is not None:
            u = self.linear_op.user_rows(batch.users, e_u, e_i)
            pos = self.linear_op.item_rows(batch.pos_items, e_u, e_i)
            neg = self.linear_op.item_rows(batch.neg_items, e_u, e_i)
        else:
            user_emb, item_emb = self.forward(params)
            u = user_emb[batch.users]
            pos = item_emb[batch.pos_items]
            neg = item_emb[batch.neg_items]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * (
            masked_mean(jnp.mean(u ** 2, 1), w) + masked_mean(jnp.mean(pos ** 2, 1), w)
        )
        k1, k2 = jax.random.split(rng)
        u1, i1 = self.forward(params, k1)
        u2, i2 = self.forward(params, k2)
        cl = info_nce(u1[batch.users], u2[batch.users], self.ssl_temp, w) + info_nce(
            i1[batch.pos_items], i2[batch.pos_items], self.ssl_temp, w
        )
        return bpr + reg + self.ssl_reg * cl

    def embeddings(self, params: Params):
        if self.linear_op is not None:
            return self.linear_op.full(
                params["user_embedding"], params["item_embedding"]
            )
        return self.forward(params)
