"""SLMRec: self-supervised multimodal learning with FAC tasks.

Reference: Model/SLMRec.py. Capabilities reproduced:
- three LightGCN towers over the shared user table: id items,
  Linear-projected visual items, Linear-projected textual items (raw
  features L2-normalized at init; Model/SLMRec.py:39-52,111-129);
- fusion: Linear over the concatenation of the three tower outputs per
  side (Model/SLMRec.py:54-57,131-134);
- main loss = in-batch softmax CE over normalized (user, pos) embeddings
  at temperature ssl_temp (Model/SLMRec.py:158-175);
- FAC ssl: chained projections g_i_iv/g_v_iv -> CE(v), g_iv_iva ->
  g_iva_ivat vs g_t_ivat -> CE(t), unnormalized logits, over pos items
  (Model/SLMRec.py:66-78,136-155); total = main + ssl_alpha * fac.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal, xavier_uniform
from chaorec_tpu.ops.losses import l2norm, masked_mean


def in_batch_ce(a, b, temp, weights):
    """CrossEntropy(a @ b.T / temp, arange) == -mean log_softmax diag."""
    logits = jnp.dot(a, b.T, preferred_element_type=jnp.float32) / temp
    pos = jnp.diagonal(logits)
    return masked_mean(jax.nn.logsumexp(logits, axis=1) - pos, weights)


class SLMRec(RecModel):
    name = "SLMRec"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, n_layers, ssl_temp, ssl_alpha):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        import numpy as np

        self.v_feat = jnp.asarray(v_feat) / (
            jnp.linalg.norm(jnp.asarray(v_feat), axis=1, keepdims=True) + 1e-12
        )
        self.t_feat = jnp.asarray(t_feat) / (
            jnp.linalg.norm(jnp.asarray(t_feat), axis=1, keepdims=True) + 1e-12
        )

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 12)
        d = self.dim_E
        p = {
            "user_embedding": xavier_normal(ks[0], (self.num_user, d)),
            "item_embedding": xavier_normal(ks[1], (self.num_item, d)),
            "v_dense_w": xavier_uniform(ks[2], (d, self.v_feat.shape[1])),
            "t_dense_w": xavier_uniform(ks[3], (d, self.t_feat.shape[1])),
            "after_u_w": xavier_uniform(ks[4], (d, 3 * d)),
            "after_i_w": xavier_uniform(ks[5], (d, 3 * d)),
        }
        # biases follow torch Linear default
        for name, k, (o, i) in [
            ("v_dense_b", ks[6], (d, self.v_feat.shape[1])),
            ("t_dense_b", ks[7], (d, self.t_feat.shape[1])),
            ("after_u_b", ks[8], (d, 3 * d)),
            ("after_i_b", ks[9], (d, 3 * d)),
        ]:
            _, b = torch_linear_init(k, o, i)
            p[name] = b
        for name, k, (o, i) in [
            ("g_i_iv", ks[10], (d, d)), ("g_v_iv", jax.random.fold_in(ks[10], 1), (d, d)),
            ("g_iv_iva", jax.random.fold_in(ks[10], 2), (d, d)),
            ("g_a_iva", jax.random.fold_in(ks[10], 3), (d, d)),
            ("g_iva_ivat", ks[11], (d // 2, d)),
            ("g_t_ivat", jax.random.fold_in(ks[11], 1), (d // 2, d)),
        ]:
            w, b = torch_linear_init(jax.random.fold_in(k, 7), o, i)
            p[name + "_w"] = xavier_uniform(k, (o, i))
            p[name + "_b"] = b
        return p

    def _tower(self, xu, xi):
        # Reference quirk (Model/SLMRec.py:80-90): normalize_edge_index
        # computes deg = bincount(cat([row, col])) over the ALREADY
        # DOUBLED edge list, so every node's degree is 2x its true value
        # and the operator is exactly 0.5 * D^-1/2 A D^-1/2. The operator
        # is linear, so halving each propagate output reproduces it on
        # the shared standard-normalized graph.
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            cu, ci = self.graph.propagate(cu, ci)
            cu, ci = 0.5 * cu, 0.5 * ci
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def forward(self, params: Params):
        xu = params["user_embedding"]
        v_emb = self.v_feat @ params["v_dense_w"].T + params["v_dense_b"]
        t_emb = self.t_feat @ params["t_dense_w"].T + params["t_dense_b"]
        # one 3d-wide propagation serves all three towers (the shared
        # adjacency is columnwise-independent; exact per-tower results)
        au, ai = self._tower(
            jnp.concatenate([xu, xu, xu], 1),
            jnp.concatenate([params["item_embedding"], v_emb, t_emb], 1))
        iu, vu, tu = jnp.split(au, 3, 1)
        ii, vi, ti = jnp.split(ai, 3, 1)
        user = jnp.concatenate([iu, vu, tu], 1) @ params["after_u_w"].T + params["after_u_b"]
        item = jnp.concatenate([ii, vi, ti], 1) @ params["after_i_w"].T + params["after_i_b"]
        return user, item, (ii, vi, ti)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        user, item, (ii, vi, ti) = self.forward(params)
        w = batch.weights
        u = l2norm(user[batch.users])
        pos = l2norm(item[batch.pos_items])
        main = in_batch_ce(u, pos, self.ssl_temp, w)

        idx = batch.pos_items

        def lin(name, x):
            return x @ params[name + "_w"].T + params[name + "_b"]

        x_i_iv = lin("g_i_iv", ii[idx])
        x_v_iv = lin("g_v_iv", vi[idx])
        v_loss = in_batch_ce(x_i_iv, x_v_iv, self.ssl_temp, w)
        x_iv_iva = lin("g_iv_iva", x_i_iv)
        x_iva_ivat = lin("g_iva_ivat", x_iv_iva)
        x_t_ivat = lin("g_t_ivat", ti[idx])
        t_loss = in_batch_ce(x_iva_ivat, x_t_ivat, self.ssl_temp, w)
        return main + self.ssl_alpha * (v_loss + t_loss)

    def embeddings(self, params: Params):
        user, item, _ = self.forward(params)
        return user, item
