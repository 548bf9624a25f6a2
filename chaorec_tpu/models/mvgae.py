"""MVGAE: multimodal variational graph autoencoder with product of experts.

Reference: Model/MVGAE.py. Capabilities reproduced:
- BaseModel conv: self-loop sym-norm propagation of xW + bias, row
  L2-normalize, dropout 0.1 in training (Model/MVGAE.py:24-68);
- per-modality towers (visual/textual/collaborative; the collaborative
  "features" table and all tower preferences are frozen-by-omission
  plain tensors — quirk kept): n_layers rounds of
  ``x = LReLU(g_k(LReLU(conv_k(x))))`` (concate=False drops the computed
  x_hat, quirk kept), then mu = g4(LReLU(conv4 x)) + LReLU(lin4 x) and
  logvar analogously via layer 5 (Model/MVGAE.py:103-226);
- product-of-experts fusion (v,t) then (vt, c) (Model/MVGAE.py:71-100,
  315-343); z = mu + 0.1 * N(0,1) * exp(logvar/2) in training, mu at eval
  (logvar clamped at MAX_LOGVAR=10);
- loss = BPR(+1e-5) on fused z + kl_weight * KL(pd) + the same pair per
  modality sample (Model/MVGAE.py:364-416); ranking from pd_mu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.dropout import masked_dense_r
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import bpr_loss, l2norm

MAX_LOGVAR = 10.0


class MVGAE(RecModel):
    name = "MVGAE"
    dim_latent = 128
    conv_dropout = 0.1

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, rng):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.kl_weight = reg_weight
        self.n_layers = min(n_layers, 3)
        self.v_feat = v_feat
        self.t_feat = t_feat
        g = graph
        ones = jnp.ones((g.u_by_u.shape[0],), jnp.float32)
        r, s_u, s_i = masked_dense_r(
            g.u_by_u, g.i_by_u, ones, num_user, num_item, self_loops=True
        )
        self.r_sl, self.s_u, self.s_i = r, s_u, s_i
        ks = jax.random.split(rng, 4)
        # frozen quirk tensors
        self.collaborative = xavier_normal(ks[0], (num_item, dim_E))
        self.v_preference = xavier_normal(ks[1], (num_user, self.dim_latent))
        self.t_preference = xavier_normal(ks[2], (num_user, self.dim_latent))
        self.c_preference = xavier_normal(ks[3], (num_user, self.dim_latent))

    def init_params(self, rng: jax.Array) -> Params:
        p = {}
        k = rng
        d = self.dim_E
        for mod, feat_dim in (("v", self.v_feat.shape[1]),
                              ("t", self.t_feat.shape[1]),
                              ("c", self.dim_E)):
            k, k_mlp = jax.random.split(k)
            w, b = torch_linear_init(k_mlp, self.dim_latent, feat_dim)
            p[f"{mod}_mlp_w"] = xavier_normal(jax.random.fold_in(k_mlp, 2),
                                              (self.dim_latent, feat_dim))
            p[f"{mod}_mlp_b"] = b
            dims = [self.dim_latent] + [d] * 4
            for i in range(5):
                d_in = dims[i] if i < len(dims) else d
                k, kc, kl_, kg = jax.random.split(k, 4)
                p[f"{mod}_conv{i}_w"] = xavier_normal(kc, (d_in, d))
                bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
                p[f"{mod}_conv{i}_b"] = jax.random.uniform(
                    jax.random.fold_in(kc, 1), (d,), minval=-bound, maxval=bound
                )
                wl, bl = torch_linear_init(kl_, d, d_in)
                p[f"{mod}_lin{i}_w"] = xavier_normal(
                    jax.random.fold_in(kl_, 2), (d, d_in))
                p[f"{mod}_lin{i}_b"] = bl
                wg, bg = torch_linear_init(kg, d, d)
                p[f"{mod}_g{i}_w"] = xavier_normal(jax.random.fold_in(kg, 2), (d, d))
                p[f"{mod}_g{i}_b"] = bg
        return p

    def _conv(self, params, mod, i, x, rng):
        xw = x @ params[f"{mod}_conv{i}_w"]
        U = self.num_user
        nu = jnp.dot(self.r_sl, xw[U:], preferred_element_type=jnp.float32) \
            + self.s_u[:, None] * xw[:U]
        ni = jnp.dot(self.r_sl.T, xw[:U], preferred_element_type=jnp.float32) \
            + self.s_i[:, None] * xw[U:]
        out = jnp.concatenate([nu, ni], 0) + params[f"{mod}_conv{i}_b"]
        out = l2norm(out)
        if rng is not None:
            keep = 1.0 - self.conv_dropout
            out = out * jax.random.bernoulli(rng, keep, out.shape) / keep
        return out

    def _tower(self, params, mod, feat, pref, rng):
        tf = feat @ params[f"{mod}_mlp_w"].T + params[f"{mod}_mlp_b"]
        x = l2norm(jnp.concatenate([pref, tf], axis=0))
        ks = (list(jax.random.split(rng, 5)) if rng is not None else [None] * 5)
        for i in range(self.n_layers):
            h = jax.nn.leaky_relu(self._conv(params, mod, i, x, ks[i]), 0.01)
            x = jax.nn.leaky_relu(h @ params[f"{mod}_g{i}_w"].T
                                  + params[f"{mod}_g{i}_b"], 0.01)
        mu_h = jax.nn.leaky_relu(self._conv(params, mod, 3, x, ks[3]), 0.01)
        mu = mu_h @ params[f"{mod}_g3_w"].T + params[f"{mod}_g3_b"]
        mu = mu + jax.nn.leaky_relu(
            x @ params[f"{mod}_lin3_w"].T + params[f"{mod}_lin3_b"], 0.01)
        lv_h = jax.nn.leaky_relu(self._conv(params, mod, 4, x, ks[4]), 0.01)
        lv = lv_h @ params[f"{mod}_g4_w"].T + params[f"{mod}_g4_b"]
        lv = lv + jax.nn.leaky_relu(
            x @ params[f"{mod}_lin4_w"].T + params[f"{mod}_lin4_b"], 0.01)
        return mu, lv

    @staticmethod
    def _poe(mus, logvars, eps=1e-8):
        var = jnp.exp(jnp.stack(logvars)) + eps
        t = 1.0 / var
        mu = jnp.sum(jnp.stack(mus) * t, 0) / jnp.sum(t, 0)
        pd_var = 1.0 / jnp.sum(t, 0)
        return mu, jnp.log(pd_var)

    def forward(self, params: Params, rng=None):
        ks = (list(jax.random.split(rng, 3)) if rng is not None else [None] * 3)
        v_mu, v_lv = self._tower(params, "v", self.v_feat, self.v_preference, ks[0])
        t_mu, t_lv = self._tower(params, "t", self.t_feat, self.t_preference, ks[1])
        c_mu, c_lv = self._tower(params, "c", self.collaborative,
                                 self.c_preference, ks[2])
        pd_mu, pd_lv = self._poe([v_mu, t_mu], [v_lv, t_lv])
        pd_mu, pd_lv = self._poe([pd_mu, c_mu], [pd_lv, c_lv])
        return pd_mu, pd_lv, (v_mu, v_lv), (t_mu, t_lv), (c_mu, c_lv)

    def _reparam(self, rng, mu, lv):
        lv = jnp.minimum(lv, MAX_LOGVAR)
        return mu + jax.random.normal(rng, mu.shape) * 0.1 * jnp.exp(0.5 * lv)

    def _kl(self, mu, lv):
        lv = jnp.minimum(lv, MAX_LOGVAR)
        return -0.5 * jnp.mean(jnp.sum(1 + lv - mu ** 2 - jnp.exp(lv), 1))

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        k_f, k_z, k_v, k_t, k_c = jax.random.split(rng, 5)
        pd_mu, pd_lv, (v_mu, v_lv), (t_mu, t_lv), (c_mu, c_lv) = self.forward(
            params, k_f
        )
        U = self.num_user
        w = batch.weights

        def bpr_on(z):
            u = z[: U][batch.users]
            pos = z[U:][batch.pos_items]
            neg = z[U:][batch.neg_items]
            return bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)

        z = self._reparam(k_z, pd_mu, pd_lv)
        total = bpr_on(z) + self.kl_weight * self._kl(pd_mu, pd_lv)
        total = total + bpr_on(self._reparam(k_v, v_mu, v_lv)) \
            + self.kl_weight * self._kl(v_mu, v_lv)
        total = total + bpr_on(self._reparam(k_t, t_mu, t_lv)) \
            + self.kl_weight * self._kl(t_mu, t_lv)
        total = total + bpr_on(self._reparam(k_c, c_mu, c_lv)) \
            + self.kl_weight * self._kl(c_mu, c_lv)
        return total

    def embeddings(self, params: Params):
        pd_mu, *_ = self.forward(params)
        return pd_mu[: self.num_user], pd_mu[self.num_user:]
