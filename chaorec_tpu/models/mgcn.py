"""MGCN: behavior-guided modality purifier + view fusion.

Reference: Model/MGCN.py. Capabilities reproduced:
- fixed hyperparams n_layers=1 (modal), n_ui_layers=2, knn_k=10
  (Model/MGCN.py:82-95);
- modality item views: sigmoid gates on projected features multiplied
  into the id item table, propagated once over the frozen per-modality
  kNN laplacian; modal user views = normalized-R @ modal item view
  (Model/MGCN.py:190-219);
- behavior view = mean of layers 0..2 of U-I propagation
  (Model/MGCN.py:198-208);
- fusion: shared query MLP softmax over modalities -> common component,
  separated residuals gated by preference gates from the behavior view,
  side = (sep_v + sep_t + common)/3; final = content + side
  (Model/MGCN.py:221-239);
- loss = BPR(+1e-5) + mean reg + ssl_alpha * (InfoNCE(side_i, content_i)
  + InfoNCE(side_u, content_u)) with in-batch negatives over batch rows
  (Model/MGCN.py:299-325).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.slmrec import in_batch_ce
from chaorec_tpu.ops.ell import (
    ell_rows_matvec,
    knn_topk_ell_host,
    topk_sym_norm_host,
)
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


class MGCN(RecModel):
    name = "MGCN"
    n_modal_layers = 1
    n_ui_layers = 2
    knn_k = 10

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, ssl_temp, ssl_alpha,
                 compute_dtype: str = "bfloat16"):
        super().__init__(num_user, num_item)
        del compute_dtype  # modal graphs are ELL now: fp32-exact, (I, K)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        self._v_init = v_feat
        self._t_init = t_feat
        k = min(self.knn_k, num_item)
        # Frozen modal kNN graphs in ELL (vals, idx) form — per-step reads
        # are (I, K) instead of (I, I) (Model/MGCN.py:16-70 semantics).
        iv, ii_ = topk_sym_norm_host(*knn_topk_ell_host(v_feat, k))
        tv, ti = topk_sym_norm_host(*knn_topk_ell_host(t_feat, k))
        self.image_adj = (jnp.asarray(iv), jnp.asarray(ii_))
        self.text_adj = (jnp.asarray(tv), jnp.asarray(ti))

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 12)
        p = {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            "v_feat": self._v_init, "t_feat": self._t_init,
        }
        vw, vb = torch_linear_init(ks[2], self.dim_E, self._v_init.shape[1])
        tw, tb = torch_linear_init(ks[3], self.dim_E, self._t_init.shape[1])
        p.update(image_trs_w=vw, image_trs_b=vb, text_trs_w=tw, text_trs_b=tb)
        for i, name in enumerate(
            ["gate_v", "gate_t", "gate_image_prefer", "gate_text_prefer"]
        ):
            w, b = torch_linear_init(ks[4 + i], self.dim_E, self.dim_E)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        q1w, q1b = torch_linear_init(ks[8], self.dim_E, self.dim_E)
        q2w, _ = torch_linear_init(ks[9], 1, self.dim_E)
        p.update(query_w1=q1w, query_b1=q1b, query_w2=q2w)
        return p

    def _gate(self, params, name, x):
        return jax.nn.sigmoid(x @ params[f"{name}_w"].T + params[f"{name}_b"])

    def _query(self, params, x):
        h = jnp.tanh(x @ params["query_w1"].T + params["query_b1"])
        return h @ params["query_w2"].T

    def forward(self, params: Params):
        image_feats = params["v_feat"] @ params["image_trs_w"].T + params["image_trs_b"]
        text_feats = params["t_feat"] @ params["text_trs_w"].T + params["text_trs_b"]
        items = params["item_embedding"]
        image_item = items * self._gate(params, "gate_v", image_feats)
        text_item = items * self._gate(params, "gate_t", text_feats)

        xu, xi = params["user_embedding"], items
        acc_u, acc_i = xu, xi
        for _ in range(self.n_ui_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        s = 1.0 / (self.n_ui_layers + 1)
        content_u, content_i = acc_u * s, acc_i * s

        for _ in range(self.n_modal_layers):
            image_item = ell_rows_matvec(*self.image_adj, image_item)
            text_item = ell_rows_matvec(*self.text_adj, text_item)
        # modal user views via the normalized R block
        image_user = self.graph.apply_r(image_item)
        text_user = self.graph.apply_r(text_item)

        def fuse(img, txt, content):
            att = jnp.concatenate(
                [self._query(params, img), self._query(params, txt)], -1
            )
            w = jax.nn.softmax(att, axis=-1)
            common = w[:, :1] * img + w[:, 1:] * txt
            sep_i = (img - common) * self._gate(params, "gate_image_prefer", content)
            sep_t = (txt - common) * self._gate(params, "gate_text_prefer", content)
            return (sep_i + sep_t + common) / 3.0

        side_u = fuse(image_user, text_user, content_u)
        side_i = fuse(image_item, text_item, content_i)
        return content_u + side_u, content_i + side_i, side_u, side_i, content_u, content_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi, side_u, side_i, content_u, content_i = self.forward(params)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        total = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        total = total + emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        ssl = in_batch_ce(
            l2norm(side_i[batch.pos_items]), l2norm(content_i[batch.pos_items]),
            self.ssl_temp, w,
        ) + in_batch_ce(
            l2norm(side_u[batch.users]), l2norm(content_u[batch.users]),
            self.ssl_temp, w,
        )
        return total + self.ssl_alpha * ssl

    def embeddings(self, params: Params):
        fu, fi, *_ = self.forward(params)
        return fu, fi
