"""LayerGCN: layer-refined GCN with per-epoch edge pruning.

Reference: Model/LayerGCN.py. Capabilities reproduced:
- forward: per layer, weight each node's embedding by its cosine
  similarity to the ego embedding, final = SUM over layers 1..L
  (Model/LayerGCN.py:130-145);
- per-epoch pruning hook: keep (1 - dropout) of edges, alternating
  uniformly-random and multinomial-by-edge-weight selection, with
  post-prune renormalization (Model/LayerGCN.py:105-124); kept edges are
  expressed as a static-shape 0/1 mask on device;
- eval uses the *unpruned* graph (forward_adj switch,
  Model/LayerGCN.py:48-49 + train/eval call sites);
- BPR(+1e-5) on propagated, reg (mean-style) on the RAW embedding tables
  (Model/LayerGCN.py:162-169).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.dropout import masked_dense_r
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


def _cos_weighted(x, ego):
    from chaorec_tpu.ops.losses import cosine_rows

    return cosine_rows(x, ego)[:, None] * x


class LayerGCN(RecModel):
    name = "LayerGCN"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, dropout):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.dropout = dropout
        self.pruning_random = False  # Model/LayerGCN.py:51 (multinomial first)
        # Pruned dense operator used by training; rebuilt every epoch.
        self.masked_r = graph.dense_r
        # Host-side copies for the pruning draw.
        self._edge_u = np.asarray(graph.u_by_u)
        self._edge_i = np.asarray(graph.i_by_u)
        self._edge_w = np.asarray(graph.w_by_u)

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def pre_epoch(self, params, rng, epoch: int) -> None:
        """Alternating random / weight-multinomial edge pruning."""
        if self.dropout <= 0.0:
            self.masked_r = self.graph.dense_r
            return
        E = self._edge_u.shape[0]
        keep_len = int(E * (1.0 - self.dropout))
        rs = np.random.default_rng(epoch * 7919 + 13)
        if self.pruning_random:
            keep_idx = rs.choice(E, size=keep_len, replace=False)
        else:
            p = self._edge_w / self._edge_w.sum()
            keep_idx = rs.choice(E, size=keep_len, replace=False, p=p)
        self.pruning_random = not self.pruning_random
        mask = np.zeros((E,), np.float32)
        mask[keep_idx] = 1.0
        r, _, _ = masked_dense_r(
            jnp.asarray(self._edge_u), jnp.asarray(self._edge_i),
            jnp.asarray(mask), self.num_user, self.num_item,
        )
        self.masked_r = r

    def _forward(self, params: Params, r):
        xu = params["user_embedding"]
        xi = params["item_embedding"]
        ego_u, ego_i = xu, xi
        acc_u = jnp.zeros_like(xu)
        acc_i = jnp.zeros_like(xi)
        rr = r.astype(jnp.float32)
        for _ in range(self.n_layers):
            xu, xi = (
                jnp.dot(rr, xi, preferred_element_type=jnp.float32),
                jnp.dot(rr.T, xu, preferred_element_type=jnp.float32),
            )
            xu = _cos_weighted(xu, ego_u)
            xi = _cos_weighted(xi, ego_i)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        return acc_u, acc_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        user_emb, item_emb = self._forward(params, self.masked_r)
        u = user_emb[batch.users]
        pos = item_emb[batch.pos_items]
        neg = item_emb[batch.neg_items]
        w = batch.weights
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
        return bpr + reg

    def embeddings(self, params: Params):
        return self._forward(params, self.graph.dense_r)
