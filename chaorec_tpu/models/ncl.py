"""NCL: neighborhood-enriched contrastive learning.

Reference: Model/NCL.py. Capabilities reproduced:
- LightGCN backbone propagated max(n_layers, 2*hyper_layers) layers; the
  ranking embedding is the mean of layers 0..n_layers
  (Model/NCL.py:139-155);
- structural contrast: layer-2 vs layer-0 embeddings at batch rows, full
  catalog negatives, exp/sum form, summed over batch, weight
  ssl_reg * (user + alpha * item) (Model/NCL.py:206-245);
- prototype contrast: k-means (k=200) on the raw embedding tables —
  rerun every batch exactly like the reference's per-batch ``e_step``
  (train_and_evaluate.py:107-115) but as a jitted Lloyd solver inside the
  training step (ops/kmeans.py replaces faiss; centroids L2-normalized,
  Model/NCL.py:61-94); weight proto_reg = 1e-7 (Model/NCL.py:36);
- BPR(+1e-5) on propagated, mean-style reg on ego embeddings
  (Model/NCL.py:278-286);
- constants hyper_layers=1, alpha=1, k=200 (Model/NCL.py:33-36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.kmeans import kmeans
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


from chaorec_tpu.ops.losses import l2norm as _norm  # zero-row safe


def _full_catalog_nce_sum(cur_batch, prev_batch, prev_all, temp, weights):
    """sum over batch of -log(exp(pos/t) / sum_j exp(<cur, prev_all_j>/t))."""
    c = _norm(cur_batch)
    p = _norm(prev_batch)
    allp = _norm(prev_all)
    pos = jnp.sum(c * p, axis=1) / temp
    from chaorec_tpu.ops.losses import catalog_logsumexp

    return jnp.sum((catalog_logsumexp(c, allp, temp) - pos) * weights)


class NCL(RecModel):
    name = "NCL"
    hyper_layers = 1
    alpha = 1.0
    proto_reg = 1e-7
    k = 200
    kmeans_iters = 15

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_reg):
        super().__init__(num_user, num_item)
        self.graph = graph
        # k = 200 clusters (Model/NCL.py:36), capped for tiny catalogs.
        self.k = min(NCL.k, num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_reg = ssl_reg

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def forward(self, params: Params):
        xu, xi = params["user_embedding"], params["item_embedding"]
        layers_u, layers_i = [xu], [xi]
        cu, ci = xu, xi
        for _ in range(max(self.n_layers, self.hyper_layers * 2)):
            cu, ci = self.graph.propagate(cu, ci)
            layers_u.append(cu)
            layers_i.append(ci)
        fin_u = sum(layers_u[: self.n_layers + 1]) / (self.n_layers + 1)
        fin_i = sum(layers_i[: self.n_layers + 1]) / (self.n_layers + 1)
        return fin_u, fin_i, layers_u, layers_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        w = batch.weights
        fin_u, fin_i, layers_u, layers_i = self.forward(params)

        # structural (layer) contrast: layer 2 vs layer 0
        ctx = self.hyper_layers * 2
        ssl = _full_catalog_nce_sum(
            layers_u[ctx][batch.users], layers_u[0][batch.users],
            layers_u[0], self.ssl_temp, w,
        ) + self.alpha * _full_catalog_nce_sum(
            layers_i[ctx][batch.pos_items], layers_i[0][batch.pos_items],
            layers_i[0], self.ssl_temp, w,
        )
        ssl = self.ssl_reg * ssl

        # prototype contrast; k-means on raw tables, per step (as reference)
        ku, ki = jax.random.split(rng)
        # stop_gradient: faiss ran on detached numpy copies
        eu = jax.lax.stop_gradient(params["user_embedding"])
        ei = jax.lax.stop_gradient(params["item_embedding"])
        cent_u, asg_u = kmeans(ku, eu, self.k, self.kmeans_iters)
        cent_i, asg_i = kmeans(ki, ei, self.k, self.kmeans_iters)
        cent_u, cent_i = _norm(cent_u), _norm(cent_i)
        proto = _full_catalog_nce_sum(
            layers_u[0][batch.users], cent_u[asg_u[batch.users]],
            cent_u, self.ssl_temp, w,
        ) + _full_catalog_nce_sum(
            layers_i[0][batch.pos_items], cent_i[asg_i[batch.pos_items]],
            cent_i, self.ssl_temp, w,
        )
        proto = self.proto_reg * proto

        u = fin_u[batch.users]
        pos = fin_i[batch.pos_items]
        neg = fin_i[batch.neg_items]
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
        return bpr + reg + ssl + proto

    def embeddings(self, params: Params):
        fin_u, fin_i, _, _ = self.forward(params)
        return fin_u, fin_i
