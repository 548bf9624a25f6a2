"""MMGCN: per-modality multimodal GCN towers.

Reference: Model/MMGCN.py + BasicGCN.py. Capabilities reproduced:
- per-modality 4-round towers: h = LReLU(BasicGCN_k(x)) (self-loop added,
  linear transform, sym-norm), u_hat = LReLU(W_k x) + id_embedding,
  x = LReLU(g_k([h || u_hat])) — **concat mode**: main.py:263 passes the
  string 'False' for concate, which is truthy, so the concat branch runs
  (quirk kept); has_id=True (Model/MMGCN.py:19-110);
- the visual tower projects features to dim_latent=256 first; the textual
  tower runs its first round at raw feature width (Model/MMGCN.py:126-133);
- **frozen-by-omission quirk kept**: id_embedding, the towers' user
  preference tables and the raw feature copies are plain tensors, never
  registered as parameters, hence never updated by the optimizer
  (Model/MMGCN.py:34-36,135-139);
- final = (v_rep + t_rep)/2; pair-format loss -mean(log sigmoid(pos-neg))
  + reg_weight * (mean(id[u]^2 + id[i]^2) + mean(v_pref^2))
  (Model/MMGCN.py:146-158, train branch train_and_evaluate.py:32-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.dropout import masked_dense_r
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import l2norm, masked_mean


class MMGCN(RecModel):
    name = "MMGCN"
    dim_latent_v = 256
    n_rounds = 4

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, rng):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.v_feat = v_feat  # frozen (requires-grad-but-unregistered quirk)
        self.t_feat = t_feat
        # self-loop normalized adjacency (BasicGCN adds self loops)
        g = graph
        ones = jnp.ones((g.u_by_u.shape[0],), jnp.float32)
        r, s_u, s_i = masked_dense_r(
            g.u_by_u, g.i_by_u, ones, num_user, num_item, self_loops=True
        )
        self.r_sl, self.s_u, self.s_i = r, s_u, s_i
        ks = jax.random.split(rng, 3)
        # frozen tensors (quirk)
        self.id_embedding = xavier_normal(ks[0], (num_user + num_item, dim_E))
        self.v_preference = xavier_normal(ks[1], (num_user, self.dim_latent_v))
        self.t_preference = xavier_normal(ks[2], (num_user, t_feat.shape[1]))

    def _tower_dims(self, mod):
        if mod == "v":
            return [self.dim_latent_v, self.dim_E, self.dim_E, self.dim_E]
        return [self.t_feat.shape[1], self.dim_E, self.dim_E, self.dim_E]

    def init_params(self, rng: jax.Array) -> Params:
        p = {}
        k = rng
        d_id = self.dim_E

        def add_linear(name, key, out_d, in_d, xavier=True):
            w, b = torch_linear_init(key, out_d, in_d)
            if xavier:
                w = xavier_normal(jax.random.fold_in(key, 5), (out_d, in_d))
            p[f"{name}_w"], p[f"{name}_b"] = w, b

        k, k_mlp = jax.random.split(k)
        add_linear("v_mlp", k_mlp, self.dim_latent_v, self.v_feat.shape[1],
                   xavier=False)
        for mod in ("v", "t"):
            dims = self._tower_dims(mod)
            for i in range(self.n_rounds):
                d_in = dims[i]
                d_next = dims[i + 1] if i + 1 < len(dims) else d_id
                k, k1, k2, k3 = jax.random.split(k, 4)
                add_linear(f"{mod}_conv{i}", k1, d_in, d_in)
                add_linear(f"{mod}_lin{i}", k2, d_id, d_in)
                add_linear(f"{mod}_g{i}", k3, d_id, d_in + d_id)
        return p

    def _propagate_sl(self, xu, xi):
        r = self.r_sl
        nu = jnp.dot(r, xi, preferred_element_type=jnp.float32) + self.s_u[:, None] * xu
        ni = jnp.dot(r.T, xu, preferred_element_type=jnp.float32) + self.s_i[:, None] * xi
        return nu, ni

    def _tower(self, params, mod, feat, pref):
        U = self.num_user
        if mod == "v":
            feat = feat @ params["v_mlp_w"].T + params["v_mlp_b"]
        x = l2norm(jnp.concatenate([pref, feat], axis=0))
        for i in range(self.n_rounds):
            w_c = params[f"{mod}_conv{i}_w"]
            b_c = params[f"{mod}_conv{i}_b"]
            xc = x @ w_c.T + b_c
            hu, hi = self._propagate_sl(xc[:U], xc[U:])
            h = jax.nn.leaky_relu(jnp.concatenate([hu, hi], 0), 0.01)
            u_hat = jax.nn.leaky_relu(
                x @ params[f"{mod}_lin{i}_w"].T + params[f"{mod}_lin{i}_b"], 0.01
            ) + self.id_embedding
            x = jax.nn.leaky_relu(
                jnp.concatenate([h, u_hat], 1) @ params[f"{mod}_g{i}_w"].T
                + params[f"{mod}_g{i}_b"], 0.01,
            )
        return x

    def forward(self, params: Params):
        v_rep = self._tower(params, "v", self.v_feat, self.v_preference)
        t_rep = self._tower(params, "t", self.t_feat, self.t_preference)
        rep = (v_rep + t_rep) / 2.0
        return rep[: self.num_user], rep[self.num_user:]

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi = self.forward(params)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = -masked_mean(
            jnp.log(jax.nn.sigmoid(jnp.sum(u * pos, 1) - jnp.sum(u * neg, 1))
                    + 1e-12), w,
        )
        idu = self.id_embedding[batch.users]
        idp = self.id_embedding[self.num_user + batch.pos_items]
        idn = self.id_embedding[self.num_user + batch.neg_items]
        reg = self.reg_weight * (
            masked_mean(jnp.mean(idu ** 2 + idp ** 2, 1), w)
            + masked_mean(jnp.mean(idu ** 2 + idn ** 2, 1), w)
        ) / 2.0
        reg = reg + self.reg_weight * jnp.mean(self.v_preference ** 2)
        return bpr + reg

    def embeddings(self, params: Params):
        return self.forward(params)
