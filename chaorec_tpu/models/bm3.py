"""BM3: bootstrapped multimodal latent-target model (no negatives).

Reference: Model/BM3.py. Capabilities reproduced:
- LightGCN backbone (mean layers 0..n) with item output += raw item table
  (Model/BM3.py:53-68);
- targets = dropout-perturbed, gradient-stopped copies of the online user/
  item embeddings and of the projected modality features; online branches
  pass through one shared predictor Linear(dim_E, dim_E)
  (Model/BM3.py:70-100);
- loss = (1-cos) pairs: u-i, i-u, t-i, t-t, v-i, v-v with cl_weight on the
  modal four, + reg_weight * (mean u_ori^2 + mean i_ori^2) over the FULL
  tables (Model/BM3.py:102-118);
- ranking applies the predictor to both tables (Model/BM3.py:120-127);
- raw modality tables trainable (freeze=False); trs layers xavier-normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal, xavier_uniform
from chaorec_tpu.ops.losses import l2norm, masked_mean


class BM3(RecModel):
    name = "BM3"
    # dropout here is a pure bernoulli keep-probability (no >0 gate), so
    # it traces like the other continuous axes — the shipped grid sweeps
    # 5 dropout values that now share one compiled epoch program
    extra_traced_scalars = frozenset({"dropout"})

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, feat_E, reg_weight, dropout, n_layers, cl_weight):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.feat_E = feat_E
        self.reg_weight = reg_weight
        self.dropout = dropout
        self.n_layers = n_layers
        self.cl_weight = cl_weight
        self._v_init = v_feat
        self._t_init = t_feat

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 7)
        pw, pb = torch_linear_init(ks[2], self.dim_E, self.dim_E)
        _, vb = torch_linear_init(ks[3], self.feat_E, self._v_init.shape[1])
        _, tb = torch_linear_init(ks[4], self.feat_E, self._t_init.shape[1])
        return {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "predictor_w": pw, "predictor_b": pb,
            "v_feat": self._v_init, "t_feat": self._t_init,
            "image_trs_w": xavier_normal(ks[5], (self.feat_E, self._v_init.shape[1])),
            "image_trs_b": vb,
            "text_trs_w": xavier_normal(ks[6], (self.feat_E, self._t_init.shape[1])),
            "text_trs_b": tb,
        }

    def forward(self, params: Params):
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            cu, ci = self.graph.propagate(cu, ci)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s + params["item_embedding"]

    def _pred(self, params, x):
        return x @ params["predictor_w"].T + params["predictor_b"]

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        ks = jax.random.split(rng, 4)
        u_ori, i_ori = self.forward(params)
        t_online = params["t_feat"] @ params["text_trs_w"].T + params["text_trs_b"]
        v_online = params["v_feat"] @ params["image_trs_w"].T + params["image_trs_b"]
        keep = 1.0 - self.dropout

        def drop(k, x):
            return jax.lax.stop_gradient(
                x * jax.random.bernoulli(k, keep, x.shape) / keep
            )

        u_t = drop(ks[0], u_ori)
        i_t = drop(ks[1], i_ori)
        t_t = drop(ks[2], t_online)
        v_t = drop(ks[3], v_online)

        bu, bi, w = batch.users, batch.pos_items, batch.weights
        u_on = self._pred(params, u_ori)[bu]
        i_on = self._pred(params, i_ori)[bi]
        t_on = self._pred(params, t_online)[bi]
        v_on = self._pred(params, v_online)[bi]

        def one_minus_cos(a, b):
            return masked_mean(1.0 - jnp.sum(l2norm(a) * l2norm(b), axis=1), w)

        loss_t = one_minus_cos(t_on, i_t[bi])
        loss_tv = one_minus_cos(t_on, t_t[bi])
        loss_v = one_minus_cos(v_on, i_t[bi])
        loss_vt = one_minus_cos(v_on, v_t[bi])
        loss_ui = one_minus_cos(u_on, i_t[bi])
        loss_iu = one_minus_cos(i_on, u_t[bu])
        reg = self.reg_weight * (jnp.mean(u_ori ** 2) + jnp.mean(i_ori ** 2))
        return (loss_ui + loss_iu) + reg + self.cl_weight * (
            loss_t + loss_v + loss_tv + loss_vt
        )

    def embeddings(self, params: Params):
        u, i = self.forward(params)
        return self._pred(params, u), self._pred(params, i)
