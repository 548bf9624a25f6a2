"""LGMRec: local graph + global hypergraph embeddings.

Reference: Model/LGMRec.py. Capabilities reproduced:
- fixed internals: n_mm_layer=2, n_hyper_layer=1, hyper_num=4,
  keep_rate=0.2, tau=0.2, alpha=0.2, lightgcn CF backbone
  (Model/LGMRec.py:40-49);
- FROZEN modality feature tables (freeze=True — the only model that does
  not train its raw features), trainable projection + hyperedge mapping
  matrices (Model/LGMRec.py:74-84);
- cge: LightGCN mean of layers; mge: per-modality projected item feats,
  user side = interaction-matrix sum * 1/(deg+eps), propagated
  n_mm_layer times; fused = cge + normalize(v)+normalize(t)
  (Model/LGMRec.py:108-135);
- hypergraph: item/user-to-hyperedge assignments via gumbel-softmax of
  feature projections (dropout keep 0.2), HGNN ``H (H^T x)`` over the cge
  item embeddings (Model/LGMRec.py:16-29,137-152);
- final = lge + alpha * normalize(ghe); hypergraph CL: v-vs-t per side,
  full-table negatives, summed, weight ssl_alpha (Model/LGMRec.py:218-241);
- BPR(+1e-5) + mean reg on final embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


class LGMRec(RecModel):
    name = "LGMRec"
    n_mm_layer = 2
    n_hyper_layer = 1
    hyper_num = 4
    keep_rate = 0.2
    tau = 0.2
    alpha = 0.2

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, ssl_alpha):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_ui_layers = n_layers
        self.ssl_reg = ssl_alpha
        self.v_feat = v_feat  # frozen
        self.t_feat = t_feat
        # raw (un-normalized) user-item incidence row sums
        import numpy as np

        du = jnp.zeros((num_user,), jnp.float32).at[graph.u_by_u].add(1.0)
        self.inv_deg_u = 1.0 / (du + 1e-7)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 6)
        return {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "item_image_trs": xavier_uniform(ks[2], (self.v_feat.shape[1], self.dim_E)),
            "item_text_trs": xavier_uniform(ks[3], (self.t_feat.shape[1], self.dim_E)),
            "v_hyper": xavier_uniform(ks[4], (self.v_feat.shape[1], self.hyper_num)),
            "t_hyper": xavier_uniform(ks[5], (self.t_feat.shape[1], self.hyper_num)),
        }

    def _adj_matvec(self, x_items):
        """raw binary R @ x (unnormalized adjacency; Model/LGMRec.py:126)."""
        g = self.graph
        return jax.ops.segment_sum(
            x_items[g.i_by_u], g.u_by_u, num_segments=self.num_user,
            indices_are_sorted=True,
        )

    def _cge(self, params):
        xu, xi = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = xu, xi
        for _ in range(self.n_ui_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        s = 1.0 / (self.n_ui_layers + 1)
        return acc_u * s, acc_i * s

    def _mge(self, params, trs_key, feat):
        item_feats = jnp.dot(feat, params[trs_key],
                             preferred_element_type=jnp.float32)
        user_feats = self._adj_matvec(item_feats) * self.inv_deg_u[:, None]
        xu, xi = user_feats, item_feats
        for _ in range(self.n_mm_layer):
            xu, xi = self.graph.propagate(xu, xi)
        return xu, xi

    def forward(self, params: Params, rng=None):
        def gumbel(k, logits):
            if k is None:
                return jax.nn.softmax(logits / self.tau, axis=1)
            g = -jnp.log(-jnp.log(jax.random.uniform(k, logits.shape) + 1e-10)
                         + 1e-10)
            return jax.nn.softmax((logits + g) / self.tau, axis=1)

        iv_logits = jnp.dot(self.v_feat, params["v_hyper"],
                            preferred_element_type=jnp.float32)
        it_logits = jnp.dot(self.t_feat, params["t_hyper"],
                            preferred_element_type=jnp.float32)
        uv_logits = self._adj_matvec(iv_logits)
        ut_logits = self._adj_matvec(it_logits)
        if rng is not None:
            ks = list(jax.random.split(rng, 8))
        else:
            ks = [None] * 8
        iv = gumbel(ks[0], iv_logits)
        uv = gumbel(ks[1], uv_logits)
        it = gumbel(ks[2], it_logits)
        ut = gumbel(ks[3], ut_logits)

        cge_u, cge_i = self._cge(params)
        v_u, v_i = self._mge(params, "item_image_trs", self.v_feat)
        t_u, t_i = self._mge(params, "item_text_trs", self.t_feat)
        lge_u = cge_u + l2norm(v_u) + l2norm(t_u)
        lge_i = cge_i + l2norm(v_i) + l2norm(t_i)

        def drop(k, x):
            if k is None:
                return x
            return x * jax.random.bernoulli(k, self.keep_rate, x.shape) / self.keep_rate

        def hgnn(i_hyper, u_hyper, item_embs):
            i_ret = item_embs
            u_ret = None
            for _ in range(self.n_hyper_layer):
                lat = jnp.dot(i_hyper.T, i_ret, preferred_element_type=jnp.float32)
                i_ret = jnp.dot(i_hyper, lat, preferred_element_type=jnp.float32)
                u_ret = jnp.dot(u_hyper, lat, preferred_element_type=jnp.float32)
            return u_ret, i_ret

        uv_h, iv_h = hgnn(drop(ks[4], iv), drop(ks[5], uv), cge_i)
        ut_h, it_h = hgnn(drop(ks[6], it), drop(ks[7], ut), cge_i)
        ghe_u = uv_h + ut_h
        ghe_i = iv_h + it_h
        fin_u = lge_u + self.alpha * l2norm(ghe_u)
        fin_i = lge_i + self.alpha * l2norm(ghe_i)
        return fin_u, fin_i, (uv_h, iv_h, ut_h, it_h)

    def _ssl(self, e1, e2, all_e, weights):
        n1, n2, na = l2norm(e1), l2norm(e2), l2norm(all_e)
        pos = jnp.sum(n1 * n2, axis=1) / self.tau
        logits = jnp.dot(n1, na.T, preferred_element_type=jnp.float32) / self.tau
        return jnp.sum((jax.nn.logsumexp(logits, axis=1) - pos) * weights)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi, (uv_h, iv_h, ut_h, it_h) = self.forward(params, rng)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        hcl = self._ssl(uv_h[batch.users], ut_h[batch.users], ut_h, w)
        hcl = hcl + self._ssl(iv_h[batch.pos_items], it_h[batch.pos_items], it_h, w)
        return bpr + self.ssl_reg * hcl + reg

    def embeddings(self, params: Params):
        fu, fi, _ = self.forward(params)
        return fu, fi
