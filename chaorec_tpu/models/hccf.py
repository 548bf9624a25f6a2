"""HCCF: hypergraph-enhanced contrastive CF.

Reference: Model/HCCF.py. Capabilities reproduced:
- per layer: GCN propagation on an edge-dropped (keepRate, values scaled
  1/keepRate, no renorm) normalized adjacency + hypergraph channel
  ``H (H^T x)`` with H = mult * ego_embeddings and elementwise dropout
  p = 1-keepRate on H (Model/HCCF.py:54-61,117-139; the learnable uHyper
  variant is commented out in the reference and the mult-scaled form is
  the active one);
- layer state = gcn + hyper, final = SUM of all layer states incl. ego
  (Model/HCCF.py:135-140);
- ssl: per layer i in 0..L-1, InfoNCE(gcn_layer_i.detach(),
  hyper_layer_i) at batch rows with in-batch negatives, mean
  (Model/HCCF.py:159-166,190-197 — note the reference contrasts the
  *pre-update* lists whose index 0 is the ego embedding);
- BPR(+1e-5) + mean-style reg on final embeddings; total = bpr +
  ssl_alpha * ssl + reg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


from chaorec_tpu.ops.losses import l2norm as _norm  # zero-row safe


def _ssl_pair(e1, e2, rows, temp, weights):
    p1 = _norm(e1 + 1e-8)[rows]
    p2 = _norm(e2 + 1e-8)[rows]
    nume = jnp.sum(p1 * p2, axis=-1) / temp
    logits = jnp.dot(p1, p2.T, preferred_element_type=jnp.float32) / temp
    deno = jax.nn.logsumexp(logits, axis=-1)
    s = jnp.sum((deno - nume) * weights)
    return s / jnp.maximum(jnp.sum(weights), 1.0)


class HCCF(RecModel):
    name = "HCCF"
    hyper_num = 128  # Model/HCCF.py:32 (inactive learnable variant's width)

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_alpha, ssl_temp, keep_rate,
                 leaky, mult):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_alpha = ssl_alpha
        self.ssl_temp = ssl_temp
        self.keep_rate = keep_rate
        self.leaky = leaky
        self.mult = mult

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def _dropped_propagate(self, rng, xu, xi):
        """Value-dropout on the normalized adjacency, scaled 1/keepRate."""
        g = self.graph
        if rng is None or self.keep_rate >= 1.0:
            return g.propagate(xu, xi)
        ku, ki = jax.random.split(rng)
        mu = jax.random.bernoulli(ku, self.keep_rate, g.w_by_u.shape).astype(
            jnp.float32
        ) / self.keep_rate
        mi = jax.random.bernoulli(ki, self.keep_rate, g.w_by_i.shape).astype(
            jnp.float32
        ) / self.keep_rate
        r_u = jnp.zeros((self.num_user, self.num_item), jnp.float32).at[
            g.u_by_u, g.i_by_u
        ].add(g.w_by_u.astype(jnp.float32) * mu)
        r_i = jnp.zeros((self.num_item, self.num_user), jnp.float32).at[
            g.i_by_i, g.u_by_i
        ].add(g.w_by_i.astype(jnp.float32) * mi)
        return (
            jnp.dot(r_u, xi, preferred_element_type=jnp.float32),
            jnp.dot(r_i, xu, preferred_element_type=jnp.float32),
        )

    def forward(self, params: Params, rng=None):
        eu, ei = params["user_embedding"], params["item_embedding"]
        hu = eu * self.mult  # (U, D) hyper incidence
        hi = ei * self.mult
        cur_u, cur_i = eu, ei
        acc_u, acc_i = eu, ei
        gcn_u_list, gcn_i_list = [eu], [ei]
        hyp_u_list, hyp_i_list = [eu], [ei]
        for l in range(self.n_layers):
            if rng is not None:
                rng, k_adj, k_hu, k_hi = jax.random.split(rng, 4)
                gu, gi = self._dropped_propagate(k_adj, cur_u, cur_i)
                keep = self.keep_rate
                dhu = hu * jax.random.bernoulli(k_hu, keep, hu.shape) / keep
                dhi = hi * jax.random.bernoulli(k_hi, keep, hi.shape) / keep
            else:
                gu, gi = self.graph.propagate(cur_u, cur_i)
                dhu, dhi = hu, hi
            # hgnn: H (H^T x)
            yu = jnp.dot(dhu, jnp.dot(dhu.T, cur_u, preferred_element_type=jnp.float32),
                         preferred_element_type=jnp.float32)
            yi = jnp.dot(dhi, jnp.dot(dhi.T, cur_i, preferred_element_type=jnp.float32),
                         preferred_element_type=jnp.float32)
            gcn_u_list.append(gu)
            gcn_i_list.append(gi)
            hyp_u_list.append(yu)
            hyp_i_list.append(yi)
            cur_u = gu + yu
            cur_i = gi + yi
            acc_u = acc_u + cur_u
            acc_i = acc_i + cur_i
        return acc_u, acc_i, (gcn_u_list, gcn_i_list, hyp_u_list, hyp_i_list)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        w = batch.weights
        acc_u, acc_i, (gu_l, gi_l, hu_l, hi_l) = self.forward(params, rng)
        u = acc_u[batch.users]
        pos = acc_i[batch.pos_items]
        neg = acc_i[batch.neg_items]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        ssl = 0.0
        for i in range(self.n_layers):
            ssl = ssl + _ssl_pair(
                jax.lax.stop_gradient(gu_l[i]), hu_l[i], batch.users,
                self.ssl_temp, w,
            ) + _ssl_pair(
                jax.lax.stop_gradient(gi_l[i]), hi_l[i], batch.pos_items,
                self.ssl_temp, w,
            )
        return bpr + self.ssl_alpha * ssl + reg

    def embeddings(self, params: Params):
        acc_u, acc_i, _ = self.forward(params)
        return acc_u, acc_i
