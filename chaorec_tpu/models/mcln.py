"""MCLN: multimodal counterfactual learning network.

Reference: Model/MCLN.py. Capabilities reproduced:
- LightGCN backbone (mean layers 0..n) for id embeddings; frozen raw
  features with xavier-normal trs projections; separate visual/textual
  user tables (Model/MCLN.py:17-74);
- counterfactual layers over the BATCH of item representations (3d-wide
  concat of id/v/t): attention score minus the "interest" items'
  attention score, residual + LayerNorm, ReLU feed-forward 3d->12d->3d
  with residual+LayerNorm, stacked n_mca times; a second plain attention
  branch for the negatives (Model/MCLN.py:118-213);
- the extra uniformly-sampled "interest" items come from the 4-tuple
  batch format (dataload.py:103-104) -> Batch.int_items;
- loss = 4 softplus BPR terms (id/v/t/counterfactual) + reg_weight *
  SUM-of-squares regularizers (Model/MCLN.py:262-305);
- ranking score = ua@ia^T + u_v@visual^T + u_t@textual^T, realized as a
  concat-table dot product (Model/MCLN.py:314-326).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import masked_mean


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class MCLN(RecModel):
    name = "MCLN"
    needs_int_items = True

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, n_mca):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.n_mca = n_mca
        self.v_feat = v_feat  # frozen
        self.t_feat = t_feat

    def init_params(self, rng: jax.Array) -> Params:
        d = self.dim_E
        d3 = 3 * d
        ks = jax.random.split(rng, 24)
        p = {
            "user_embedding": xavier_normal(ks[0], (self.num_user, d)),
            "item_embedding": xavier_normal(ks[1], (self.num_item, d)),
            "user_embedding_v": xavier_normal(ks[2], (self.num_user, d)),
            "user_embedding_t": xavier_normal(ks[3], (self.num_user, d)),
            "image_trs_w": xavier_normal(ks[4], (d, self.v_feat.shape[1])),
            "text_trs_w": xavier_normal(ks[5], (d, self.t_feat.shape[1])),
        }
        _, p["image_trs_b"] = torch_linear_init(ks[6], d, self.v_feat.shape[1])
        _, p["text_trs_b"] = torch_linear_init(ks[7], d, self.t_feat.shape[1])
        for i, name in enumerate(
            ["V1", "K1", "Q1", "K_int", "Q_int", "cfl1", "V2", "K2", "Q2", "cfl2"]
        ):
            w, _ = torch_linear_init(ks[8 + i], d3, d3)
            p[f"{name}_w"] = w
        for name, k, (o, i) in [
            ("fc_pos", ks[18], (d, d3)), ("fc_neg", ks[19], (d, d3)),
            ("inner", ks[20], (12 * d, d3)), ("output", ks[21], (d3, 12 * d)),
        ]:
            w, b = torch_linear_init(k, o, i)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        for name in ("ln1", "ln2", "ln_ff"):
            p[f"{name}_scale"] = jnp.ones((d3,), jnp.float32)
            p[f"{name}_bias"] = jnp.zeros((d3,), jnp.float32)
        return p

    def _backbone(self, params):
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = xu, xi
        for _ in range(self.n_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def _ff(self, params, x):
        h = jax.nn.relu(x @ params["inner_w"].T + params["inner_b"])
        h = h @ params["output_w"].T + params["output_b"]
        return _layer_norm(h + x, params["ln_ff_scale"], params["ln_ff_bias"])

    def _cf1(self, params, x, x_int):
        d3 = x.shape[-1]
        scale = 1.0 / math.sqrt(d3)
        out = x
        for _ in range(self.n_mca):
            v = out @ params["V1_w"].T
            k = out @ params["K1_w"].T
            q = out @ params["Q1_w"].T
            k_i = x_int @ params["K_int_w"].T
            q_i = x_int @ params["Q_int_w"].T
            score = (q @ k.T) * scale - (q_i @ k_i.T) * scale
            att = jax.nn.softmax(score, axis=-1) @ v
            cl = att @ params["cfl1_w"].T + out
            cl = _layer_norm(cl, params["ln1_scale"], params["ln1_bias"])
            out = self._ff(params, cl)
        return out

    def _cf2(self, params, x):
        d3 = x.shape[-1]
        scale = 1.0 / math.sqrt(d3)
        out = x
        for _ in range(self.n_mca):
            v = out @ params["V2_w"].T
            k = out @ params["K2_w"].T
            q = out @ params["Q2_w"].T
            att = jax.nn.softmax((q @ k.T) * scale, axis=-1) @ v
            cl = att @ params["cfl2_w"].T + out
            cl = _layer_norm(cl, params["ln2_scale"], params["ln2_bias"])
            out = self._ff(params, cl)
        return out

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        visual = self.v_feat @ params["image_trs_w"].T + params["image_trs_b"]
        textual = self.t_feat @ params["text_trs_w"].T + params["text_trs_b"]
        ua, ia = self._backbone(params)
        bu, bp, bn, bi2, w = (batch.users, batch.pos_items, batch.neg_items,
                              batch.int_items, batch.weights)
        u = ua[bu]
        pos, neg, intr = ia[bp], ia[bn], ia[bi2]
        pos_v, pos_t = visual[bp], textual[bp]
        neg_v, neg_t = visual[bn], textual[bn]
        int_v, int_t = visual[bi2], textual[bi2]
        pos_in = jnp.concatenate([pos, pos_v, pos_t], 1)
        neg_in = jnp.concatenate([neg, neg_v, neg_t], 1)
        int_in = jnp.concatenate([intr, int_v, int_t], 1)
        pos_m = jax.nn.relu(
            self._cf1(params, pos_in, int_in) @ params["fc_pos_w"].T
            + params["fc_pos_b"]
        )
        neg_m = jax.nn.relu(
            self._cf2(params, neg_in) @ params["fc_neg_w"].T + params["fc_neg_b"]
        )

        def softplus_bpr(p_s, n_s):
            return masked_mean(jax.nn.softplus(-(p_s - n_s)), w)

        mf = (
            softplus_bpr(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1))
            + softplus_bpr(jnp.sum(u * pos_v, 1), jnp.sum(u * neg_v, 1))
            + softplus_bpr(jnp.sum(u * pos_t, 1), jnp.sum(u * neg_t, 1))
            + softplus_bpr(jnp.sum(u * pos_m, 1), jnp.sum(u * neg_m, 1))
        )
        wcol = w[:, None]
        reg = self.reg_weight * (
            jnp.sum(params["user_embedding"][bu] ** 2 * wcol)
            + jnp.sum(params["item_embedding"][bp] ** 2 * wcol)
            + jnp.sum(params["item_embedding"][bn] ** 2 * wcol)
            + jnp.sum(pos_v ** 2 * wcol) + jnp.sum(neg_v ** 2 * wcol)
            + jnp.sum(pos_t ** 2 * wcol) + jnp.sum(neg_t ** 2 * wcol)
            + jnp.sum(pos_m ** 2 * wcol) + jnp.sum(neg_m ** 2 * wcol)
        )
        return mf + reg

    def embeddings(self, params: Params):
        visual = self.v_feat @ params["image_trs_w"].T + params["image_trs_b"]
        textual = self.t_feat @ params["text_trs_w"].T + params["text_trs_b"]
        ua, ia = self._backbone(params)
        user = jnp.concatenate(
            [ua, params["user_embedding_v"], params["user_embedding_t"]], axis=1
        )
        item = jnp.concatenate([ia, visual, textual], axis=1)
        return user, item
