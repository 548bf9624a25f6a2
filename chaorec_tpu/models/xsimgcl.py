"""XSimGCL: single-pass cross-layer contrastive graph CF.

Reference: Model/XSimGCL.py. Capabilities reproduced:
- one perturbed forward per step: final = mean of perturbed layers 1..L,
  CL view = the perturbed layer ``layer_cl`` (= 1) embedding
  (Model/XSimGCL.py:107-127; eps = 0.2, :49-50);
- loss = BPR(+1e-5) on the perturbed final + reg (user+pos only) +
  ssl_reg * (InfoNCE(final_u, cl_u) + InfoNCE(final_i, cl_i)) at batch
  rows with in-batch negatives (Model/XSimGCL.py:153-171);
- ranking from the unperturbed forward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.simgcl import _perturb
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.linear_prop import CombinedLinearOp
from chaorec_tpu.ops.losses import bpr_loss, info_nce, masked_mean


class XSimGCL(RecModel):
    name = "XSimGCL"
    eps = 0.2  # Model/XSimGCL.py:49
    layer_cl = 1  # Model/XSimGCL.py:50

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
        self.linear_op = linear_op

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def forward(self, params: Params, rng=None):
        """Returns (final_u, final_i, cl_u, cl_i)."""
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u = jnp.zeros_like(xu)
        acc_i = jnp.zeros_like(xi)
        cl_u, cl_i = xu, xi
        for l in range(self.n_layers):
            xu, xi = self.graph.propagate(xu, xi)
            if rng is not None:
                rng, ku, ki = jax.random.split(rng, 3)
                xu = _perturb(ku, xu, self.eps)
                xi = _perturb(ki, xi, self.eps)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
            if l == self.layer_cl - 1:
                cl_u, cl_i = xu, xi
        return acc_u / self.n_layers, acc_i / self.n_layers, cl_u, cl_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        w = batch.weights
        user_emb, item_emb, cl_u, cl_i = self.forward(params, rng)
        u = user_emb[batch.users]
        pos = item_emb[batch.pos_items]
        neg = item_emb[batch.neg_items]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * (
            masked_mean(jnp.mean(u ** 2, 1), w) + masked_mean(jnp.mean(pos ** 2, 1), w)
        )
        cl = info_nce(u, cl_u[batch.users], self.ssl_temp, w) + info_nce(
            pos, cl_i[batch.pos_items], self.ssl_temp, w
        )
        return bpr + reg + self.ssl_reg * cl

    def embeddings(self, params: Params):
        if self.linear_op is not None:
            return self.linear_op.full(
                params["user_embedding"], params["item_embedding"]
            )
        fu, fi, _, _ = self.forward(params)
        return fu, fi
