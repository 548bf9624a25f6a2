"""SelfCF: self-supervised CF without negatives (SimSiam-style).

Reference: Model/SelfCF.py. Capabilities reproduced:
- online encoder = LightGCN (mean layers 0..L) with per-step *sparse
  adjacency dropout* whose rate is itself uniform-random in [0, 1) per
  forward, values rescaled 1/(1-rate) (Model/SelfCF.py:103-119);
- targets = detached copies of the online embeddings with elementwise
  dropout(p=dropout) (Model/SelfCF.py:177-186);
- loss = -cos(pred(u_online), i_target)/2 - cos(pred(i_online),
  u_target)/2 + reg_weight * 0.5 * (sum u_online^2 + sum i_online^2)
  (L2Loss at Model/SelfCF.py:16-24, loss at :192-208);
- ranking score = pred(u) @ i^T + u @ pred(i)^T, expressed here as a
  single dot product of concatenated [pred(u), u] and [i, pred(i)]
  tables so the shared fused ranking kernel applies
  (Model/SelfCF.py:210-223).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import masked_mean


class SelfCF(RecModel):
    name = "SelfCF"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, dropout):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.dropout = dropout

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i, k_w, k_b = jax.random.split(rng, 4)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
            # torch Linear default init (kaiming-uniform ~ U(-1/sqrt(d), ..))
            "predictor_w": xavier_uniform(k_w, (self.dim_E, self.dim_E)),
            "predictor_b": jnp.zeros((self.dim_E,), jnp.float32),
        }

    def _encode(self, params: Params, rng=None):
        """LightGCN mean-of-layers; rng enables random-rate edge dropout."""
        g = self.graph
        if rng is not None:
            k_rate, k_mask = jax.random.split(rng)
            rate = jax.random.uniform(k_rate, ())
            keep = (jax.random.uniform(k_mask, g.w_by_u.shape) >= rate).astype(
                jnp.float32
            ) / jnp.maximum(1.0 - rate, 1e-6)
            # Static-shape value dropout on the *pre-normalized* weights
            # (reference drops entries of the already-normalized adjacency
            # without renormalizing, Model/SelfCF.py:103-116).
            w = g.w_by_u * keep
            r = jnp.zeros((self.num_user, self.num_item), jnp.float32).at[
                g.u_by_u, g.i_by_u
            ].add(w)

            def prop(xu, xi):
                return (
                    jnp.dot(r, xi, preferred_element_type=jnp.float32),
                    jnp.dot(r.T, xu, preferred_element_type=jnp.float32),
                )
        else:
            prop = g.propagate
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            cu, ci = prop(cu, ci)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def _predict(self, params, x):
        return x @ params["predictor_w"].T + params["predictor_b"]

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        k_enc, k_du, k_di = jax.random.split(rng, 3)
        user_all, item_all = self._encode(params, k_enc)
        u_online = user_all[batch.users]
        i_online = item_all[batch.pos_items]
        keep = 1.0 - self.dropout
        u_target = jax.lax.stop_gradient(
            u_online * jax.random.bernoulli(k_du, keep, u_online.shape) / keep
        )
        i_target = jax.lax.stop_gradient(
            i_online * jax.random.bernoulli(k_di, keep, i_online.shape) / keep
        )
        w = batch.weights
        reg = self.reg_weight * 0.5 * (
            jnp.sum((u_online ** 2) * w[:, None]) + jnp.sum((i_online ** 2) * w[:, None])
        )
        u_p = self._predict(params, u_online)
        i_p = self._predict(params, i_online)

        def neg_cos(p, z):
            from chaorec_tpu.ops.losses import l2norm

            return -masked_mean(jnp.sum(l2norm(p) * l2norm(z), axis=1), w)

        loss_ui = neg_cos(u_p, i_target) / 2
        loss_iu = neg_cos(i_p, u_target) / 2
        return loss_ui + loss_iu + reg

    def embeddings(self, params: Params):
        u_online, i_online = self._encode(params)
        u_p = self._predict(params, u_online)
        i_p = self._predict(params, i_online)
        # score = u_p @ i^T + u @ i_p^T  == [u_p, u] . [i, i_p]
        return (
            jnp.concatenate([u_p, u_online], axis=1),
            jnp.concatenate([i_online, i_p], axis=1),
        )
