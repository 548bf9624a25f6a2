"""SMORE: spectral fusion multimodal recommendation.

Reference: Model/SMORE.py. Capabilities reproduced:
- spectrum convolution: rfft over the embedding dim (norm='ortho'),
  learned complex weights per modality, fusion = product of both spectra
  times a fusion weight, irfft back (Model/SMORE.py:275-294; jnp.fft);
- modality/fusion item views: sigmoid gates on the spectral features
  multiplied into the id item table, each propagated once over its graph:
  per-modality frozen kNN laplacians, fusion graph = elementwise max-pool
  union of the two (Model/SMORE.py:201-227,296-346);
- modal user views = normalized-R @ modal item view; per-view elementwise
  softmax attention (query_v/query_t over the fusion view), preference
  gates from the behavior view with dropout, side = mean of 3 views;
  final = content + side (Model/SMORE.py:348-375);
- loss = BPR(log-sigmoid) + reg_weight * (0.5 sum sq / 1024) [the
  reference divides by its hard-coded batch_size=1024] + 0.01 * in-batch
  InfoNCE(side vs content) at temp 0.2 (Model/SMORE.py:380-425).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.slmrec import in_batch_ce
from chaorec_tpu.ops.ell import (
    ell_rows_matvec,
    ell_union_max,
    knn_topk_ell_host,
    topk_sym_norm_host,
)
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import l2norm, masked_mean


class SMORE(RecModel):
    name = "SMORE"
    cl_weight = 0.01  # Model/SMORE.py:101
    cl_temp = 0.2
    ref_batch = 1024.0
    n_modal_layers = 1

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_ui_layers, ii_topk, dropout,
                 compute_dtype: str = "bfloat16"):
        super().__init__(num_user, num_item)
        del compute_dtype  # modal graphs are ELL now: fp32-exact, (I, K)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_ui_layers = n_ui_layers
        self.dropout = dropout
        self._v_init = v_feat
        self._t_init = t_feat
        k = min(ii_topk, num_item)
        # Frozen modal graphs in ELL (vals, idx) form (ops/ell.py): the
        # (I, I) matrices from Model/SMORE.py:19-88 exist only transiently
        # inside the chunked top-k; per-step propagation reads (I, K)
        # instead of (I, I) — ~I/K x less HBM traffic. The fusion graph is
        # the elementwise max of the two normalized graphs on their union
        # pattern, exactly like the dense maximum.
        iv, ii_ = topk_sym_norm_host(*knn_topk_ell_host(v_feat, k))
        tv, ti = topk_sym_norm_host(*knn_topk_ell_host(t_feat, k))
        fv, fi = ell_union_max(iv, ii_, tv, ti)
        self.image_adj = (jnp.asarray(iv), jnp.asarray(ii_))
        self.text_adj = (jnp.asarray(tv), jnp.asarray(ti))
        self.fusion_adj = (jnp.asarray(fv), jnp.asarray(fi))

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 16)
        d = self.dim_E
        p = {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, d)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, d)),
            "v_feat": self._v_init, "t_feat": self._t_init,
        }
        vw, vb = torch_linear_init(ks[2], d, self._v_init.shape[1])
        tw, tb = torch_linear_init(ks[3], d, self._t_init.shape[1])
        p.update(image_trs_w=vw, image_trs_b=vb, text_trs_w=tw, text_trs_b=tb)
        for i, name in enumerate(
            ["gate_v", "gate_t", "gate_f",
             "gate_image_prefer", "gate_text_prefer", "gate_fusion_prefer"]
        ):
            w, b = torch_linear_init(ks[4 + i], d, d)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        for i, name in enumerate(["query_v", "query_t"]):
            w1, b1 = torch_linear_init(ks[10 + 2 * i], d, d)
            w2, _ = torch_linear_init(ks[11 + 2 * i], d, d)
            p[f"{name}_w1"], p[f"{name}_b1"], p[f"{name}_w2"] = w1, b1, w2
        nf = d // 2 + 1
        p["image_complex_weight"] = jax.random.normal(ks[14], (1, nf, 2))
        p["text_complex_weight"] = jax.random.normal(
            jax.random.fold_in(ks[14], 1), (1, nf, 2))
        p["fusion_complex_weight"] = jax.random.normal(ks[15], (1, nf, 2))
        return p

    def _gate(self, params, name, x):
        return jax.nn.sigmoid(x @ params[f"{name}_w"].T + params[f"{name}_b"])

    def _query(self, params, name, x):
        h = jnp.tanh(x @ params[f"{name}_w1"].T + params[f"{name}_b1"])
        return h @ params[f"{name}_w2"].T

    def _spectrum(self, params, image_feats, text_feats):
        img_fft = jnp.fft.rfft(image_feats, axis=1, norm="ortho")
        txt_fft = jnp.fft.rfft(text_feats, axis=1, norm="ortho")

        def cw(name):
            w = params[name]
            return jax.lax.complex(w[..., 0], w[..., 1])

        n = image_feats.shape[1]
        img = jnp.fft.irfft(img_fft * cw("image_complex_weight"), n=n, axis=1,
                            norm="ortho")
        txt = jnp.fft.irfft(txt_fft * cw("text_complex_weight"), n=n, axis=1,
                            norm="ortho")
        fus = jnp.fft.irfft(txt_fft * img_fft * cw("fusion_complex_weight"),
                            n=n, axis=1, norm="ortho")
        return img, txt, fus

    def _r_matvec(self, x_items):
        """normalized R @ item-view (user side)."""
        return self.graph.apply_r(x_items)

    def forward(self, params: Params, rng=None):
        image_feats = params["v_feat"] @ params["image_trs_w"].T + params["image_trs_b"]
        text_feats = params["t_feat"] @ params["text_trs_w"].T + params["text_trs_b"]
        img_c, txt_c, fus_c = self._spectrum(params, image_feats, text_feats)
        items = params["item_embedding"]
        img_i = items * self._gate(params, "gate_v", img_c)
        txt_i = items * self._gate(params, "gate_t", txt_c)
        fus_i = items * self._gate(params, "gate_f", fus_c)

        xu, xi = params["user_embedding"], items
        acc_u, acc_i = xu, xi
        for _ in range(self.n_ui_layers):
            xu, xi = self.graph.propagate(xu, xi)
            acc_u = acc_u + xu
            acc_i = acc_i + xi
        s = 1.0 / (self.n_ui_layers + 1)
        content_u, content_i = acc_u * s, acc_i * s

        for _ in range(self.n_modal_layers):
            img_i = ell_rows_matvec(*self.image_adj, img_i)
            txt_i = ell_rows_matvec(*self.text_adj, txt_i)
            fus_i = ell_rows_matvec(*self.fusion_adj, fus_i)
        # one 3d-wide apply of the SAME R serves all three modal user
        # views: the operator is columnwise-independent, so the split
        # results are exactly the per-view matvecs (one edge gather
        # instead of three)
        mu = self._r_matvec(jnp.concatenate([img_i, txt_i, fus_i], axis=1))
        img_u, txt_u, fus_u = jnp.split(mu, 3, axis=1)

        def assemble(img, txt, fus, content):
            att_v = jax.nn.softmax(self._query(params, "query_v", fus), axis=-1)
            att_t = jax.nn.softmax(self._query(params, "query_t", fus), axis=-1)
            agg_img = att_v * img
            agg_txt = att_t * txt
            pf_i = self._gate(params, "gate_image_prefer", content)
            pf_t = self._gate(params, "gate_text_prefer", content)
            pf_f = self._gate(params, "gate_fusion_prefer", content)
            if rng is not None and self.dropout > 0:
                keep = 1.0 - self.dropout
                k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 3), 3)
                pf_i = pf_i * jax.random.bernoulli(k1, keep, pf_i.shape) / keep
                pf_t = pf_t * jax.random.bernoulli(k2, keep, pf_t.shape) / keep
                pf_f = pf_f * jax.random.bernoulli(k3, keep, pf_f.shape) / keep
            side = (pf_i * agg_img + pf_t * agg_txt + pf_f * fus) / 3.0
            return content + side, side

        fin_u, side_u = assemble(img_u, txt_u, fus_u, content_u)
        fin_i, side_i = assemble(img_i, txt_i, fus_i, content_i)
        return fin_u, fin_i, side_u, side_i, content_u, content_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi, side_u, side_i, content_u, content_i = self.forward(params, rng)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        mf = -masked_mean(
            jax.nn.log_sigmoid(jnp.sum(u * pos, 1) - jnp.sum(u * neg, 1)), w
        )
        reg = self.reg_weight * 0.5 * (
            jnp.sum((u ** 2) * w[:, None]) + jnp.sum((pos ** 2) * w[:, None])
            + jnp.sum((neg ** 2) * w[:, None])
        ) / self.ref_batch
        cl = in_batch_ce(
            l2norm(side_i[batch.pos_items]), l2norm(content_i[batch.pos_items]),
            self.cl_temp, w,
        ) + in_batch_ce(
            l2norm(side_u[batch.users]), l2norm(content_u[batch.users]),
            self.cl_temp, w,
        )
        return mf + reg + self.cl_weight * cl

    def embeddings(self, params: Params):
        fu, fi, *_ = self.forward(params)
        return fu, fi
