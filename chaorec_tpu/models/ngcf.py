"""NGCF: neural graph CF with bi-interaction messages.

Reference: Model/NGCF.py. Capabilities reproduced:
- per-layer transform ``LeakyReLU(0.2)( W1 (A x) + W2 ((A x) . x) )`` where
  A is the self-loop-added symmetric-normalized adjacency
  (Model/NGCF.py:20-82: messages ``norm * (W1 x_j + W2 (x_j * x_i))``
  scatter-added then LeakyReLU — the bi-interaction sum distributes over
  the elementwise product, so on TPU the whole layer is two MXU matmuls
  plus one fused elementwise stage; no per-edge work);
- training-time edge dropout with post-drop renormalization
  (``dropout_adj(p=dropout)``, Model/NGCF.py:41-44), symmetric-mask
  deviation documented in graphs/dropout.py;
- final embedding = SUM over layer embeddings incl. ego
  (Model/NGCF.py:116-126);
- BPR(+1e-5) + mean-style L2 on propagated embeddings
  (Model/NGCF.py:129-168).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.dropout import (
    bernoulli_keep,
    build_two_way_arrays,
    edge_propagate,
    sorted_masked_edge_weights,
)
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


class NGCF(RecModel):
    name = "NGCF"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, dropout, n_layers):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.dropout = dropout
        self.n_layers = n_layers
        # static two-way (u-sorted + i-sorted) edge layout: the per-batch
        # degree renormalization reduces sorted on both sides
        self._arrs = build_two_way_arrays(graph.u_by_u, graph.i_by_u)

    def init_params(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, 2 + 2 * self.n_layers)
        params = {
            "user_embedding": xavier_uniform(keys[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(keys[1], (self.num_item, self.dim_E)),
        }
        for l in range(self.n_layers):
            params[f"W1_{l}"] = xavier_uniform(keys[2 + 2 * l], (self.dim_E, self.dim_E))
            params[f"W2_{l}"] = xavier_uniform(keys[3 + 2 * l], (self.dim_E, self.dim_E))
        return params

    def _propagate(self, params: Params, rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Layer stack; rng!=None enables edge dropout (training path)."""
        g = self.graph
        if rng is not None and self.dropout > 0:
            keep = bernoulli_keep(rng, g.u_by_u.shape[0], 1.0 - self.dropout)
        else:
            keep = jnp.ones((g.u_by_u.shape[0],), jnp.float32)
        # Edge-space renormalized weights + O(E) propagation. MEASURED
        # r4 floor note: the per-batch dropout view rules out LightGCN's
        # cached operator, so every batch pays 3 layers of full-graph
        # edge gathers fwd+bwd at XLA's ~50 GB/s row-gather rate (see
        # ops/ell.py) — ~14 ms/batch on beauty. A scatter-free two-way
        # sorted rewrite (graphs/dropout.sorted_two_way_propagate) was
        # built and measured SLOWER (1.74 s vs 1.31 s epochs): its
        # backward does 4-6 row gathers where autodiff's unsorted
        # scatters cost ~the same as gathers on TPU, so the straight
        # edge_propagate autodiff path is kept.
        w, s_u, s_i = sorted_masked_edge_weights(
            keep, self._arrs, self.num_user, self.num_item,
            self_loops=True,
        )
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = xu, xi
        for l in range(self.n_layers):
            # A x with self loops, bipartite blocks
            pu, pi = edge_propagate(self._arrs[0], self._arrs[1], w, xu, xi,
                                    self.num_user, self.num_item)
            au = pu + s_u[:, None] * xu
            ai = pi + s_i[:, None] * xi
            w1, w2 = params[f"W1_{l}"], params[f"W2_{l}"]
            xu = jax.nn.leaky_relu(au @ w1.T + (au * xu) @ w2.T, 0.2)
            xi = jax.nn.leaky_relu(ai @ w1.T + (ai * xi) @ w2.T, 0.2)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        return acc_u, acc_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        user_emb, item_emb = self._propagate(params, rng)
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
        return self._propagate(params, rng=None)
