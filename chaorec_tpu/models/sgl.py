"""SGL: self-supervised graph learning with edge-dropout views.

Reference: Model/SGL.py. Capabilities reproduced:
- base forward: mean of layers 0..L on the full normalized graph
  (Model/SGL.py:123-136);
- two augmented views per step: edge dropout keeping (1 - ssl_ratio) of
  edges (ssl_ratio = 0.1, aug 'ed'; Model/SGL.py:48-51,96-104) with
  *post-drop renormalization* (:110-121), each propagated with the same
  mean-of-layers GCN — on TPU the subgraph operator is rebuilt on device
  (graphs/dropout.py) instead of scipy;
- ssl loss: full-catalog negatives, per-row ``logsumexp((v1 @ V2^T -
  pos)/t)``, summed (not averaged) over batch users and pos items
  (Model/SGL.py:180-208);
- total = BPR(+1e-5) + reg(mean-style, raw ego embeddings? no — raw
  embedding tables at batch rows, Model/SGL.py:210-218) + ssl_reg * ssl.
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


from chaorec_tpu.ops.losses import l2norm as _norm_rows  # zero-row safe


class SGL(RecModel):
    name = "SGL"
    ssl_ratio = 0.1  # Model/SGL.py:51

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_reg):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_reg = ssl_reg
        # two-way sorted edge layout for the per-batch view
        # renormalization (graphs/dropout.py)
        self._arrs = build_two_way_arrays(graph.u_by_u, graph.i_by_u)

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def _gcn_mean(self, xu, xi, propagate) -> Tuple[jnp.ndarray, jnp.ndarray]:
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            cu, ci = propagate(cu, ci)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def _view(self, params: Params, rng: jax.Array):
        # views are rebuilt EVERY batch (Model/SGL.py:140-147): edge-space
        # propagation costs O(E) per view vs the O(U*I) dense rebuild
        g = self.graph
        keep = bernoulli_keep(rng, g.u_by_u.shape[0], 1.0 - self.ssl_ratio)
        w, _, _ = sorted_masked_edge_weights(
            keep, self._arrs, self.num_user, self.num_item
        )

        # straight autodiff edge propagation: the sorted two-way rewrite
        # measured slower on TPU (see the r4 floor note in ngcf.py)
        def prop(xu, xi):
            return edge_propagate(self._arrs[0], self._arrs[1], w, xu, xi,
                                  self.num_user, self.num_item)

        return self._gcn_mean(
            params["user_embedding"], params["item_embedding"], prop
        )

    def _ssl_loss(self, users, items, weights, view1, view2):
        """Full-catalog InfoNCE, summed (Model/SGL.py:180-208)."""
        u1 = _norm_rows(view1[0])
        i1 = _norm_rows(view1[1])
        u2 = _norm_rows(view2[0])
        i2 = _norm_rows(view2[1])
        bu1, bu2 = u1[users], u2[users]
        bi1, bi2 = i1[items], i2[items]
        pos_u = jnp.sum(bu1 * bu2, axis=1)
        pos_i = jnp.sum(bi1 * bi2, axis=1)
        # lse((x - pos)/t) == lse(x/t) - pos/t: stream the catalog lse
        # (Pallas on TPU) and shift by the positive term afterwards.
        from chaorec_tpu.ops.losses import catalog_logsumexp

        c_u = (catalog_logsumexp(bu1, u2, self.ssl_temp)
               - pos_u / self.ssl_temp)
        c_i = (catalog_logsumexp(bi1, i2, self.ssl_temp)
               - pos_i / self.ssl_temp)
        return jnp.sum((c_u + c_i) * weights)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        w = batch.weights
        user_emb, item_emb = self._gcn_mean(
            params["user_embedding"], params["item_embedding"],
            self.graph.propagate,
        )
        u = user_emb[batch.users]
        pos = item_emb[batch.pos_items]
        neg = item_emb[batch.neg_items]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(
            self.reg_weight,
            (
                params["user_embedding"][batch.users],
                params["item_embedding"][batch.pos_items],
                params["item_embedding"][batch.neg_items],
            ),
            w,
        )
        k1, k2 = jax.random.split(rng)
        ssl = self._ssl_loss(
            batch.users, batch.pos_items, w,
            self._view(params, k1), self._view(params, k2),
        )
        return bpr + reg + self.ssl_reg * ssl

    def embeddings(self, params: Params):
        return self._gcn_mean(
            params["user_embedding"], params["item_embedding"],
            self.graph.propagate,
        )
