"""GUME: graph augmentation + user-modality enhancement.

Reference: Model/GUME.py. Capabilities reproduced:
- item-item augmentation of the U-I graph: for each item, the
  intersection of its visual and textual kNN(10) neighbor lists (minus
  itself) becomes I-I edges appended to the adjacency before symmetric
  normalization (find_inter/add_edge/get_adj_mat,
  Model/GUME.py:196-275; the reference caches this as gume_inter.json —
  here it is recomputed deterministically at build);
- views: extended-id (U-I+I-I conv of id tables), explicit modal views
  (gated modal item tables conv'd over per-modality kNN graphs + R-mapped
  users), extended modal views (conv of extended user tables with
  explicit modal items), coarse/fine-grained fusion with a shared
  attention MLP + behavior gates (Model/GUME.py:300-377);
- losses (Model/GUME.py:380-460): BPR + reg1(1e-5, /1024-batch quirk) +
  bm(0.01) InfoNCE(integration, extended_id) + vt_loss * |var/mean diff|
  alignment + um_loss * (InfoNCE(extended_it_u, integration_u) + 2
  noise-perturbed InfoNCE terms) + reg2(0.1) on extended_it pos items.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.slmrec import in_batch_ce
from chaorec_tpu.ops.ell import (
    EllMatrix,
    auto_cap,
    ell_rows_matvec,
    knn_topk_ell_host,
    topk_sym_norm_host,
)
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import l2norm, masked_mean


def _knn_indices(feats: np.ndarray, k: int) -> np.ndarray:
    f = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    sim = f @ f.T
    return np.argsort(-sim, axis=1)[:, :k]


class GUME(RecModel):
    name = "GUME"
    bm_loss = 0.01
    reg_weight_1 = 1e-5
    reg_weight_2 = 0.1
    bm_temp = 0.2
    um_temp = 0.2
    knn_k = 10
    ref_batch = 1024.0

    # dense bf16 propagation only below this (U*I) size; bigger graphs
    # keep the O(E) ELL path regardless of dtype
    dense_entry_budget = 8e8

    def __init__(self, num_user, num_item, edges: np.ndarray, v_feat, t_feat,
                 dim_E, n_layers, n_ui_layers, um_loss, vt_loss,
                 compute_dtype: str = "bfloat16"):
        super().__init__(num_user, num_item)
        # Measured on sports (scripts/ablate_gume4.py): the 3-layer
        # _conv_ui fwd+bwd is 57.7 ms via ELL gathers (XLA row-gather is
        # transaction-bound — bf16 messages and wider caps don't help)
        # vs 19.3 ms as dense bf16 MXU matmuls. Gate on the graph dtype
        # so fp32 runs keep the exact ELL path (advisor r1).
        self.graph_bf16 = (
            compute_dtype == "bfloat16"
            and num_user * num_item <= self.dense_entry_budget
        )
        self.dim_E = dim_E
        self.n_layers = n_layers
        self.n_ui_layers = n_ui_layers
        self.um_loss_w = um_loss
        self.vt_loss_w = vt_loss
        self._v_init = v_feat
        self._t_init = t_feat
        k = min(self.knn_k, num_item)
        iv, ii_ = topk_sym_norm_host(*knn_topk_ell_host(v_feat, k))
        tv, ti = topk_sym_norm_host(*knn_topk_ell_host(t_feat, k))
        if self.graph_bf16:
            def knn_dense(vals, idx):
                d = np.zeros((num_item, num_item), np.float32)
                r = np.repeat(np.arange(num_item), idx.shape[1])
                d[r, np.asarray(idx).ravel()] = np.asarray(vals).ravel()
                return jnp.asarray(d, jnp.bfloat16)
            self.image_adj = knn_dense(iv, ii_)
            self.text_adj = knn_dense(tv, ti)
        else:
            self.image_adj = (jnp.asarray(iv), jnp.asarray(ii_))
            self.text_adj = (jnp.asarray(tv), jnp.asarray(ti))

        # I-I intersection edges + combined normalized adjacency blocks.
        vi = _knn_indices(np.asarray(v_feat), k)
        ti = _knn_indices(np.asarray(t_feat), k)
        rows, cols = [], []
        for i in range(num_item):
            inter = set(vi[i]) & set(ti[i])
            inter.discard(i)
            for j in inter:
                rows.append(i)
                cols.append(int(j))
        a_ui = np.zeros((num_user, num_item), np.float32)
        a_ui[edges[:, 0], edges[:, 1]] = 1.0
        a_ii = np.zeros((num_item, num_item), np.float32)
        if rows:
            a_ii[rows, cols] = 1.0
        deg_u = a_ui.sum(1)
        deg_i = a_ui.sum(0) + a_ii.sum(1)
        du = np.where(deg_u > 0, deg_u ** -0.5, 0.0)
        di = np.where(deg_i > 0, deg_i ** -0.5, 0.0)
        # Augmented UI + I-I intersection graphs as EllMatrix: per-step
        # reads are O(E) gathers instead of the dense (U, I)/(I, I)
        # matrices (GUME.py:215-264 semantics, custom joint degrees).
        uedges = np.unique(edges[:, :2], axis=0)  # a_ui assigns, not adds
        ew = du[uedges[:, 0]] * di[uedges[:, 1]]
        if rows:
            r_arr = np.asarray(rows)
            c_arr = np.asarray(cols)
            iw = (a_ii * di[:, None] * di[None, :])[r_arr, c_arr]
        else:
            r_arr = np.zeros((0,), np.int64)
            c_arr = np.zeros((0,), np.int64)
            iw = np.zeros((0,), np.float32)
        if self.graph_bf16:
            r_d = np.zeros((num_user, num_item), np.float32)
            r_d[uedges[:, 0], uedges[:, 1]] = ew
            self.r_norm = jnp.asarray(r_d, jnp.bfloat16)
            ii_d = np.zeros((num_item, num_item), np.float32)
            ii_d[r_arr, c_arr] = iw
            self.ii_norm = jnp.asarray(ii_d, jnp.bfloat16)
        else:
            self.r_norm = EllMatrix.from_coo(
                uedges[:, 0], uedges[:, 1], ew, num_user, num_item,
                cap=auto_cap(np.bincount(uedges[:, 0], minlength=num_user)),
                cap_t=auto_cap(np.bincount(uedges[:, 1], minlength=num_item)),
            )
            self.ii_norm = EllMatrix.from_coo(
                r_arr, c_arr, iw, num_item, num_item,
            )

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 14)
        d = self.dim_E
        p = {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, d)),
            "item_id_embedding": xavier_uniform(ks[1], (self.num_item, d)),
            "extended_image_user": xavier_uniform(ks[2], (self.num_user, d)),
            "extended_text_user": xavier_uniform(ks[3], (self.num_user, d)),
            "v_feat": self._v_init, "t_feat": self._t_init,
        }
        for i, (name, ind) in enumerate([
            ("image_reduce", self._v_init.shape[1]),
            ("text_reduce", self._t_init.shape[1]),
        ]):
            w, b = torch_linear_init(ks[4 + i], d, ind)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        for i, name in enumerate(
            ["image_trans", "text_trans", "image_behavior", "text_behavior"]
        ):
            w, b = torch_linear_init(ks[6 + i], d, d)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        q1w, q1b = torch_linear_init(ks[10], d, d)
        q2w, _ = torch_linear_init(ks[11], 1, d)
        p.update(sep_w1=q1w, sep_b1=q1b, sep_w2=q2w)
        return p

    def _R(self, x):
        """R_norm @ x: (I, d) -> (U, d)."""
        if self.graph_bf16:
            return jax.lax.dot_general(
                self.r_norm, x.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return self.r_norm.matvec(x)

    def _Rt(self, x):
        """R_norm^T @ x: (U, d) -> (I, d) — contract dim 0, no copy."""
        if self.graph_bf16:
            return jax.lax.dot_general(
                self.r_norm, x.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return self.r_norm.t.matvec(x)

    def _II(self, x):
        if self.graph_bf16:
            return jax.lax.dot_general(
                self.ii_norm, x.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return self.ii_norm.matvec(x)

    def _conv_ui(self, xu, xi):
        """mean of layers 0..n_ui over the AUGMENTED adjacency blocks."""
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_ui_layers):
            cu, ci = (
                self._R(ci),
                self._Rt(cu) + self._II(ci),
            )
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_ui_layers + 1)
        return acc_u * s, acc_i * s

    def forward(self, params: Params):
        d = self.dim_E
        img_space = jax.nn.sigmoid(
            (params["v_feat"] @ params["image_reduce_w"].T + params["image_reduce_b"])
            @ params["image_trans_w"].T + params["image_trans_b"]
        )
        txt_space = jax.nn.sigmoid(
            (params["t_feat"] @ params["text_reduce_w"].T + params["text_reduce_b"])
            @ params["text_trans_w"].T + params["text_trans_b"]
        )
        items = params["item_id_embedding"]
        img_item = items * img_space
        txt_item = items * txt_space

        def conv_ii(adj, x):
            for _ in range(self.n_layers):
                if self.graph_bf16:
                    x = jax.lax.dot_general(
                        adj, x.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    x = ell_rows_matvec(*adj, x)
            return x

        exp_img_i = conv_ii(self.image_adj, img_item)
        exp_txt_i = conv_ii(self.text_adj, txt_item)

        # The three _conv_ui towers and the two R-mapped modal user views
        # all multiply by the SAME (U, I) adjacency; batching them along
        # the feature axis lets one gather of the edge list serve all
        # towers per layer (layer-mean propagation is columnwise-
        # independent, so the split results are exactly the per-tower
        # results).
        exp_u = self._R(jnp.concatenate([exp_img_i, exp_txt_i], 1))
        exp_img_u, exp_txt_u = jnp.split(exp_u, 2, axis=1)

        cat_u = jnp.concatenate(
            [params["user_embedding"], params["extended_image_user"],
             params["extended_text_user"]], axis=1)
        cat_i = jnp.concatenate([items, exp_img_i, exp_txt_i], axis=1)
        au, ai = self._conv_ui(cat_u, cat_i)
        ext_id_u, ext_img_u2, ext_txt_u2 = jnp.split(au, 3, axis=1)
        ext_id_i, ext_img_i2, ext_txt_i2 = jnp.split(ai, 3, axis=1)
        ext_it_u = (ext_img_u2 + ext_txt_u2) / 2
        ext_it_i = (ext_img_i2 + ext_txt_i2) / 2

        def query(x):
            return jnp.tanh(x @ params["sep_w1"].T + params["sep_b1"]) @ params["sep_w2"].T

        def fuse(img_u, img_i, txt_u, txt_i, content_u, content_i):
            img = jnp.concatenate([img_u, img_i], 0)
            txt = jnp.concatenate([txt_u, txt_i], 0)
            att = jax.nn.softmax(
                jnp.concatenate([query(img), query(txt)], -1), axis=-1
            )
            coarse = att[:, :1] * img + att[:, 1:] * txt
            content = jnp.concatenate([content_u, content_i], 0)
            bi = jax.nn.sigmoid(content @ params["image_behavior_w"].T
                                + params["image_behavior_b"])
            bt = jax.nn.sigmoid(content @ params["text_behavior_w"].T
                                + params["text_behavior_b"])
            fine_i = bi * (img - coarse)
            fine_t = bt * (txt - coarse)
            return (fine_i + fine_t + coarse) / 3.0

        integration = fuse(exp_img_u, exp_img_i, exp_txt_u, exp_txt_i,
                           ext_id_u, ext_id_i)
        ext_id = jnp.concatenate([ext_id_u, ext_id_i], 0)
        all_embeds = ext_id + integration
        exp_img = jnp.concatenate([exp_img_u, exp_img_i], 0)
        exp_txt = jnp.concatenate([exp_txt_u, exp_txt_i], 0)
        ext_it = jnp.concatenate([ext_it_u, ext_it_i], 0)
        return all_embeds, integration, ext_id, ext_it, exp_img, exp_txt

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        all_e, integration, ext_id, ext_it, exp_img, exp_txt = self.forward(params)
        U = self.num_user
        fu, fi = all_e[:U], all_e[U:]
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        mf = -masked_mean(
            jax.nn.log_sigmoid(jnp.sum(u * pos, 1) - jnp.sum(u * neg, 1)), w
        )
        reg1 = self.reg_weight_1 * 0.5 * (
            jnp.sum(u ** 2 * w[:, None]) + jnp.sum(pos ** 2 * w[:, None])
            + jnp.sum(neg ** 2 * w[:, None])
        ) / self.ref_batch
        vt = self.vt_loss_w * (
            jnp.abs(jnp.var(exp_img) - jnp.var(exp_txt))
            + jnp.abs(jnp.mean(exp_img) - jnp.mean(exp_txt))
        )
        bu, bi = batch.users, batch.pos_items
        bm = self.bm_loss * (
            in_batch_ce(l2norm(integration[:U][bu]), l2norm(ext_id[:U][bu]),
                        self.bm_temp, w)
            + in_batch_ce(l2norm(integration[U:][bi]), l2norm(ext_id[U:][bi]),
                          self.bm_temp, w)
        )

        def noise_cl(k, emb_rows):
            def perturb(kk, x):
                noise = jax.random.uniform(kk, x.shape)
                noise = l2norm(noise)
                return x + jnp.sign(x) * noise * 0.1
            k1, k2 = jax.random.split(k)
            return in_batch_ce(
                l2norm(perturb(k1, emb_rows)), l2norm(perturb(k2, emb_rows)),
                self.um_temp, w,
            )

        k1, k2 = jax.random.split(rng)
        c = in_batch_ce(l2norm(ext_it[:U][bu]), l2norm(integration[:U][bu]),
                        self.um_temp, w)
        um = self.um_loss_w * (
            c + noise_cl(k1, integration[:U][bu]) + noise_cl(k2, ext_it[:U][bu])
        )
        reg2 = self.reg_weight_2 * 0.5 * jnp.sum(
            ext_it[U:][bi] ** 2 * w[:, None]
        ) / self.ref_batch
        return mf + vt + bm + um + reg1 + reg2

    def embeddings(self, params: Params):
        all_e, *_ = self.forward(params)
        return all_e[: self.num_user], all_e[self.num_user:]
