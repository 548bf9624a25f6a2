"""LightGODE: MF training + graph-ODE inference.

Reference: Model/LightGODE.py. Capabilities reproduced:
- training ('MF_init' strategy) is pure matrix factorization: batch user /
  pos-item embeddings row-normalized; loss = alignment + gamma *
  (uniformity(u) + uniformity(i)) / 2 where alignment = mean ||u - i||^2
  and uniformity = log mean exp(-2 * pairwise_dist^2)
  (Model/LightGODE.py:96-106,135-147);
- inference propagates the embeddings through the graph ODE
  dx/dt = A x + e (e = initial embeddings, i.e. implicit self loops) with
  a single Euler step over t = [0, t] (torchdiffeq euler on a 2-point
  grid; Model/LightGODE.py:26-35,118-126), then ranks with the ODE output
  (un-normalized, as the reference's gene_ranklist uses restore_user_e
  from get_all_embeddings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_normal
from chaorec_tpu.ops.losses import l2norm, masked_mean


def _uniformity(x, w):
    """log mean_{i<j} exp(-2 ||x_i - x_j||^2) with batch-pad masking."""
    sq = jnp.sum(x ** 2, axis=1)
    d2 = sq[:, None] - 2 * jnp.dot(x, x.T, preferred_element_type=jnp.float32) + sq[None, :]
    d2 = jnp.maximum(d2, 0.0)
    pair_w = w[:, None] * w[None, :]
    n = x.shape[0]
    iu = jnp.triu(jnp.ones((n, n), jnp.float32), k=1) * pair_w
    val = jnp.sum(jnp.exp(-2.0 * d2) * iu) / jnp.maximum(jnp.sum(iu), 1.0)
    return jnp.log(val + 1e-12)


class LightGODE(RecModel):
    name = "LightGODE"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 gamma, t):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.gamma = gamma
        self.t = t

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_normal(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_normal(k_i, (self.num_item, self.dim_E)),
        }

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        u = l2norm(params["user_embedding"][batch.users])
        i = l2norm(params["item_embedding"][batch.pos_items])
        w = batch.weights
        align = masked_mean(jnp.sum((u - i) ** 2, axis=1), w)
        uniform = self.gamma * (_uniformity(u, w) + _uniformity(i, w)) / 2.0
        return align + uniform

    def embeddings(self, params: Params):
        # single Euler step of dx/dt = A x + e over [0, t]:
        # z = x0 + t * (A x0 + x0)
        xu, xi = params["user_embedding"], params["item_embedding"]
        au, ai = self.graph.propagate(xu, xi)
        return xu + self.t * (au + xu), xi + self.t * (ai + xi)
