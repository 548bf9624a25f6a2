"""VGCL: variational graph contrastive learning.

Reference: Model/VGCL.py. Capabilities reproduced:
- variational graph encoder: mean = average of propagation layers 1..L,
  logstd = mean @ W + b, two views = mean + 0.01 * exp(logstd) * noise
  (Model/VGCL.py:107-128);
- node-level CL (temp ssl_temp) and cluster-level CL (temp
  0.7*ssl_temp): per-batch k-means (50 user / 50 item clusters; jitted
  Lloyd replaces the per-batch faiss e_step, train_and_evaluate.py:116-125)
  defines same-cluster positives, probability mass summed over the
  cluster mask then averaged (Model/VGCL.py:196-269);
- KL regularizer with the reference's formula and its hard-coded /1024
  batch divisor (Model/VGCL.py:271-280);
- BPR(+1e-5) on view 1, mean reg on raw tables; alpha scales both CL
  terms, beta=1 scales KL;
- ranking deviation: scores use the posterior mean (the reference ranks
  with the last sampled view).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.kmeans import kmeans
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm, masked_mean


class VGCL(RecModel):
    name = "VGCL"
    beta = 1.0
    n_user_cluster = 50
    n_item_cluster = 50
    kmeans_iters = 15

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_alpha):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.temp_node = ssl_temp
        self.temp_cluster = 0.7 * ssl_temp
        self.alpha = ssl_alpha
        self.n_user_cluster = min(VGCL.n_user_cluster, num_user)
        self.n_item_cluster = min(VGCL.n_item_cluster, num_item)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 3)
        return {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "eps_weight": xavier_uniform(ks[2], (self.dim_E, self.dim_E)),
            "eps_bias": jnp.zeros((self.dim_E,), jnp.float32),
        }

    def _encode(self, params):
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u = jnp.zeros_like(xu)
        acc_i = jnp.zeros_like(xi)
        for _ in range(self.n_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        mean_u, mean_i = acc_u / self.n_layers, acc_i / self.n_layers
        mean = jnp.concatenate([mean_u, mean_i], axis=0)
        logstd = mean @ params["eps_weight"] + params["eps_bias"]
        return mean, logstd

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        k1, k2, ku, ki = jax.random.split(rng, 4)
        mean, logstd = self._encode(params)
        std = jnp.exp(logstd)
        v1 = mean + 0.01 * std * jax.random.normal(k1, std.shape)
        v2 = mean + 0.01 * std * jax.random.normal(k2, std.shape)
        U = self.num_user
        u1, i1 = v1[:U], v1[U:]
        u2, i2 = v2[:U], v2[U:]

        bu, bi, bn, w = batch.users, batch.pos_items, batch.neg_items, batch.weights
        u = u1[bu]
        pos = i1[bi]
        neg = i1[bn]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(
            self.reg_weight,
            (params["user_embedding"][bu], params["item_embedding"][bi],
             params["item_embedding"][bn]),
            w,
        )

        def node_cl(a, b):
            na, nb = l2norm(a), l2norm(b)
            pos_s = jnp.sum(na * nb, 1) / self.temp_node
            logits = jnp.dot(na, nb.T, preferred_element_type=jnp.float32) / self.temp_node
            return masked_mean(jax.nn.logsumexp(logits, 1) - pos_s, w)

        cl_node = self.alpha * (node_cl(u1[bu], u2[bu]) + node_cl(i1[bi], i2[bi]))

        # per-step k-means on the sampled view (faiss e_step parity)
        cent_u, asg_u = kmeans(ku, jax.lax.stop_gradient(u1),
                               self.n_user_cluster, self.kmeans_iters)
        cent_i, asg_i = kmeans(ki, jax.lax.stop_gradient(i1),
                               self.n_item_cluster, self.kmeans_iters)

        def cluster_cl(a, b, asg, rows, temp):
            na, nb = l2norm(a[rows]), l2norm(b[rows])
            cid = asg[rows]
            mask = (cid[:, None] == cid[None, :]).astype(jnp.float32)
            mask = mask * w[None, :]
            n_pos = jnp.maximum(mask.sum(1), 1.0)
            logits = jnp.dot(na, nb.T, preferred_element_type=jnp.float32) / temp
            logits = logits - jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits)
            probs = e / jnp.maximum(e.sum(1, keepdims=True), 1e-12) * mask
            lp = jnp.log(jnp.maximum(probs.sum(1) / n_pos, 1e-12))
            return -masked_mean(lp, w)

        cl_cluster = self.alpha * (
            cluster_cl(u1, u2, asg_u, bu, self.temp_cluster)
            + cluster_cl(i1, i2, asg_i, bi, self.temp_cluster)
        )

        # reference formula, std here = logstd (Model/VGCL.py:271-280 uses
        # `std` as the encoder's logstd output and exponentiates inside)
        kl = -0.5 * (1 + 2 * logstd - mean ** 2 - jnp.exp(logstd) ** 2)
        kl = self.beta * jnp.mean(jnp.sum(kl, 1)) / 1024.0

        return bpr + reg + cl_node + cl_cluster + kl

    def embeddings(self, params: Params):
        mean, _ = self._encode(params)
        return mean[: self.num_user], mean[self.num_user:]
