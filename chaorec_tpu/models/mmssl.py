"""MMSSL: adversarial multimodal self-supervised learning (WGAN-GP).

Reference: Model/MMSSL.py + the alternating loop at
train_and_evaluate.py:49-71. Capabilities reproduced:
- forward (Model/MMSSL.py:289-365): rowsum^(-0.5)-scaled ui/iu propagation
  (csr_norm(mean_flag=True) at :176-190 is D^{-1/2}A, NOT a row mean) of
  projected modal features (dropout 0.2), modal id propagation over the
  *rebuilt* modal graphs, behavior-pair multi-head attention fusion (the
  reference's per-node 2-behavior attention, including the d_h-summed
  score against full-width values), id embedding + 0.36 * normalized
  fusion, n_ui_layers propagation with softmax on the last layer, mean of
  layer stack, + 0.55 * normalized modal feature embeddings per side.
  NOTE the reference attention's value broadcast (MMSSL.py:276-280):
  ``V = v.unsqueeze(1)`` aligns v's behavior axis with the QUERY axis of
  ``att``, so Z[h,q,n] = sum_k att[h,q,k,n] * v[q,n] = v[q,n] — the
  softmax weights cancel (they sum to 1 over k) and w_q/w_k receive zero
  gradient. Z is exactly the 4-fold head concat of v through w_cat;
  reproduced as such;
- discriminator: Linear(I -> I/4 -> I/8 -> 1), kaiming-normal init with
  zero bias (weights_init, Model/MMSSL.py:171-175). The reference's
  ``nn.LeakyReLU(True)`` passes True as negative_slope (=1.0), i.e. the
  activation is the IDENTITY — reproduced here. Per-batch BatchNorm
  statistics with learnable affine, dropouts (0.31/0.5), 100*sigmoid
  output (Model/MMSSL.py:21-45);
- loss_D (Model/MMSSL.py:490-527): fake = masked-normalized modal user-item
  similarity rows (stop-gradient forward), real = gumbel-perturbed
  softmaxed interaction rows + scaled ui similarity, WGAN losses + 0.3 *
  gradient penalty on interpolates;
- generator loss (Model/MMSSL.py:529-624): BPR(log-sigmoid) with /1024
  sum reg, feat reg /num_item, cl_rate * (refl+between) contrast of modal
  user ids vs fused users, G_rate * -mean(D(fake));
- **T=1 rebuild state machine quirk kept**: batch 0 accumulates
  int(num_item * 1e-4) top-k indices per user, batch 1 rebuilds the modal
  ui graphs from them (D^-1 row norm), every later batch rebuilds from an
  empty buffer, i.e. zero modal graphs (Model/MMSSL.py:552-585);
- trainer (MMSSLTrainer): per batch, Adam(3e-4, betas 0.5/0.9) step on the
  D subtree for loss_D, then AdamW(lr, wd 0.01) step on ALL params
  (including D, as model.parameters() does); optimizer states are
  re-created every epoch exactly like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.micro import full_catalog_cl
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import l2norm, masked_mean


def _row_half(m):
    """Rows scaled by rowsum^(-0.5): csr_norm(mean_flag=True),
    Model/MMSSL.py:176-190 (np.power(rowsum + 1e-8, -0.5))."""
    return m * jax.lax.rsqrt(m.sum(1, keepdims=True) + 1e-8)


def _batchnorm(x):
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


class MMSSL(RecModel):
    name = "MMSSL"
    stateful = True
    head_num = 4
    model_cat_rate = 0.55
    id_cat_rate = 0.36
    feat_reg_decay = 1e-5
    log_log_scale = 1e-5
    real_data_tau = 0.005
    ui_pre_scale = 100.0
    gp_rate = 1.0
    m_topk_rate = 1e-4
    drop_rate = 0.2

    def __init__(self, num_user, num_item, graph: BipartiteGraph, raw_ui,
                 v_feat, t_feat, dim_E, reg_weight, ssl_alpha, ssl_temp,
                 g_rate, mm_layers, batch_size=1024):
        super().__init__(num_user, num_item)
        self._batch_size = batch_size
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.cl_rate = ssl_alpha
        self.tau = ssl_temp
        self.G_rate = g_rate
        self.mm_layers = mm_layers
        self.n_ui_layers = mm_layers
        self.v_feat = v_feat
        self.t_feat = t_feat
        self.raw_ui = raw_ui  # (U, I) binary
        # csr_norm(mean_flag=True) (Model/MMSSL.py:176-190) scales ROWS by
        # rowsum^(-0.5) — NOT a row mean. ui_graph = D_u^{-1/2} A,
        # iu_graph = D_i^{-1/2} A^T.
        self.ui_graph = _row_half(raw_ui)
        self.iu_graph = _row_half(raw_ui.T)
        self.k_top = int(num_item * self.m_topk_rate)

    # ---------------- params ----------------
    def init_params(self, rng: jax.Array) -> Params:
        d = self.dim_E
        ks = jax.random.split(rng, 16)
        p = {
            "user_id_embedding": xavier_uniform(ks[0], (self.num_user, d)),
            "item_id_embedding": xavier_uniform(ks[1], (self.num_item, d)),
            "w_q": xavier_uniform(ks[2], (d, d)),
            "w_k": xavier_uniform(ks[3], (d, d)),
            "w_v": xavier_uniform(ks[4], (d, d)),
            "w_cat": xavier_uniform(ks[5], (self.head_num * d, d)),
        }
        vw, vb = torch_linear_init(ks[6], d, self.v_feat.shape[1])
        tw, tb = torch_linear_init(ks[7], d, self.t_feat.shape[1])
        p["image_trans_w"] = xavier_uniform(jax.random.fold_in(ks[6], 1),
                                            (d, self.v_feat.shape[1]))
        p["image_trans_b"] = vb
        p["text_trans_w"] = xavier_uniform(jax.random.fold_in(ks[7], 1),
                                           (d, self.t_feat.shape[1]))
        p["text_trans_b"] = tb
        # discriminator: kaiming_normal_ weights + zero bias
        # (weights_init, Model/MMSSL.py:171-175); BatchNorm1d affine
        # params start at gamma=1, beta=0 and train with both optimizers
        # (they are model parameters in the reference).
        def kaiming(k, out_f, in_f):
            return jnp.sqrt(2.0 / in_f) * jax.random.normal(k, (out_f, in_f))

        i4, i8 = max(self.num_item // 4, 1), max(self.num_item // 8, 1)
        p["D_w1"] = kaiming(ks[8], i4, self.num_item)
        p["D_b1"] = jnp.zeros((i4,))
        p["D_bn1_g"] = jnp.ones((i4,))
        p["D_bn1_b"] = jnp.zeros((i4,))
        p["D_w2"] = kaiming(ks[9], i8, i4)
        p["D_b2"] = jnp.zeros((i8,))
        p["D_bn2_g"] = jnp.ones((i8,))
        p["D_bn2_b"] = jnp.zeros((i8,))
        p["D_w3"] = kaiming(ks[10], 1, i8)
        p["D_b3"] = jnp.zeros((1,))
        return p

    def init_state(self, rng: jax.Array):
        # State holds the RAW modal count matrices (the reference's
        # image/text_ui_graph_tmp before csr_norm); both the D_r^{-1/2}
        # ui view and the D_c^{-1/2} iu view are derived in forward so
        # the transpose normalization sees the true counts (duplicate
        # users in a batch accumulate, Model/MMSSL.py:561-583).
        b = self._batch_size
        return {
            "image_cnt": self.raw_ui,
            "text_cnt": self.raw_ui,
            "buf_users": jnp.zeros((b,), jnp.int32),
            "buf_image": jnp.zeros((b, max(self.k_top, 1)), jnp.int32),
            "buf_text": jnp.zeros((b, max(self.k_top, 1)), jnp.int32),
            "buf_valid": jnp.zeros(()),
        }

    # ---------------- discriminator ----------------
    def discriminate(self, params, x, rng=None):
        # nn.LeakyReLU(True) in the reference sets negative_slope=True
        # (=1.0): the activation is the identity, so each block is
        # Linear -> BatchNorm(affine) -> Dropout (Model/MMSSL.py:27-40).
        h = x @ params["D_w1"].T + params["D_b1"]
        h = _batchnorm(h) * params["D_bn1_g"] + params["D_bn1_b"]
        if rng is not None:
            rng, k1 = jax.random.split(rng)
            h = h * jax.random.bernoulli(k1, 1 - 0.31, h.shape) / (1 - 0.31)
        h = h @ params["D_w2"].T + params["D_b2"]
        h = _batchnorm(h) * params["D_bn2_g"] + params["D_bn2_b"]
        if rng is not None:
            rng, k2 = jax.random.split(rng)
            h = h * jax.random.bernoulli(k2, 1 - 0.5, h.shape) / (1 - 0.5)
        out = jax.nn.sigmoid(h @ params["D_w3"].T + params["D_b3"])
        return 100.0 * out[:, 0]

    # ---------------- forward ----------------
    def forward(self, params: Params, state, rng=None):
        image_feats = self.v_feat @ params["image_trans_w"].T + params["image_trans_b"]
        text_feats = self.t_feat @ params["text_trans_w"].T + params["text_trans_b"]
        if rng is not None:
            k1, k2 = jax.random.split(rng)
            keep = 1.0 - self.drop_rate
            image_feats = image_feats * jax.random.bernoulli(
                k1, keep, image_feats.shape) / keep
            text_feats = text_feats * jax.random.bernoulli(
                k2, keep, text_feats.shape) / keep
        # modal graphs: csr_norm(tmp, mean) = D_r^{-1/2} tmp for the ui
        # side, csr_norm(tmp.T, mean) = D_c^{-1/2} tmp^T for the iu side
        # (Model/MMSSL.py:570-583); counts live in state, views derived.
        img_ui = _row_half(state["image_cnt"])
        txt_ui = _row_half(state["text_cnt"])
        img_iu = _row_half(state["image_cnt"].T)
        txt_iu = _row_half(state["text_cnt"].T)
        # The reference's mmlayer loop (Model/MMSSL.py:302-315) is
        # IDEMPOTENT: ``image_user_feats = mm(ui_graph, image_feats)``
        # always reads the original transformed features (image_feats is
        # never reassigned inside the loop — only image_item_feats is),
        # so for every mmlayer value the final tower is exactly one
        # ui-hop for users and iu∘ui for items. Iterating on the updated
        # item features instead (3-/4-hop at mm_layers=2) measurably
        # diverges (xfw baby trajectory −20%). Compute the fixed point
        # directly.
        img_user = self.ui_graph @ image_feats
        img_item = self.iu_graph @ img_user
        img_uid = img_ui @ params["item_id_embedding"]
        txt_user = self.ui_graph @ text_feats
        txt_item = self.iu_graph @ txt_user
        txt_uid = txt_ui @ params["item_id_embedding"]

        img_iid = img_iu @ params["user_id_embedding"]
        txt_iid = txt_iu @ params["user_id_embedding"]

        def attention(e_img, e_txt):
            # multi_head_self_attention (Model/MMSSL.py:247-287).
            # ``V = v.unsqueeze(1)`` (2,1,N,d) broadcasts against
            # att (h,2,2,N,1) with v's behavior axis on the QUERY axis:
            # Z[h,q,n] = sum_k att[h,q,k,n] * v[q,n] = v[q,n] since the
            # softmax over k sums to 1 (and its jacobian kills the w_q/
            # w_k gradients). Net effect: Z = concat_h(v) @ w_cat. The
            # trailing model_cat_rate*normalize(Z) at :285 is discarded
            # by the reference (no assignment) — not applied here either.
            q = jnp.stack([e_img, e_txt], 0)  # (2, N, d)
            z = jnp.concatenate([q] * self.head_num, -1)  # (2, N, h*d)
            return z @ params["w_cat"]  # (2, N, d)

        user_z = attention(img_uid, txt_uid).mean(0)
        item_z = attention(img_iid, txt_iid).mean(0)
        u_g = params["user_id_embedding"] + self.id_cat_rate * l2norm(user_z)
        i_g = params["item_id_embedding"] + self.id_cat_rate * l2norm(item_z)

        u_list, i_list = [u_g], [i_g]
        for i in range(self.n_ui_layers):
            if i == self.n_ui_layers - 1:
                u_g = jax.nn.softmax(self.ui_graph @ i_g, axis=-1)
                i_g = jax.nn.softmax(self.iu_graph @ u_g, axis=-1)
            else:
                u_g = self.ui_graph @ i_g
                i_g = self.iu_graph @ u_g
            u_list.append(u_g)
            i_list.append(i_g)
        u_g = jnp.mean(jnp.stack(u_list), 0)
        i_g = jnp.mean(jnp.stack(i_list), 0)
        u_g = u_g + self.model_cat_rate * (l2norm(img_user) + l2norm(txt_user))
        i_g = i_g + self.model_cat_rate * (l2norm(img_item) + l2norm(txt_item))
        return (u_g, i_g, img_item, txt_item, img_user, txt_user,
                img_uid, txt_uid)

    def _u_sim(self, users, user_final, item_final):
        sim = jnp.dot(user_final[users], item_final.T,
                      preferred_element_type=jnp.float32)
        sim = sim * (1.0 - self.raw_ui[users])
        return l2norm(sim)

    # ---------------- losses ----------------
    def loss_d(self, params: Params, state, batch: Batch, rng: jax.Array):
        k_f, k_gum, k_alpha, k_d1, k_d2, k_gp = jax.random.split(rng, 6)
        out = jax.tree.map(
            jax.lax.stop_gradient, self.forward(params, state, k_f)
        )
        u_g, i_g, img_item, txt_item, img_user, txt_user, _, _ = out
        users = batch.users
        ui_sim = self._u_sim(users, u_g, i_g)
        img_sim = self._u_sim(users, img_user, img_item)
        txt_sim = self._u_sim(users, txt_user, txt_item)
        inputf = jnp.concatenate([img_sim, txt_sim], 0)
        lossf = jnp.mean(self.discriminate(params, inputf, k_d1))
        u_ui = self.raw_ui[users]
        # Model/MMSSL.py:513-516: softmax(u_ui - scale * log(-log U + eps)
        # / tau). Precedence quirk: `/ real_data_tau` binds to the NOISE
        # TERM ONLY — the binary u_ui logits are NOT sharpened by 1/tau
        # (tau=0.005 would make them 200x sharper), and the noise enters
        # as log(-log U) (= MINUS a standard Gumbel), not -log(-log U).
        gum = jnp.log(-jnp.log(
            jax.random.uniform(k_gum, u_ui.shape) + 1e-8) + 1e-8)
        u_real = jax.nn.softmax(
            u_ui - self.log_log_scale * gum / self.real_data_tau, axis=1
        )
        u_real = l2norm(u_real + ui_sim * self.ui_pre_scale)
        inputr = jnp.concatenate([u_real, u_real], 0)
        lossr = -jnp.mean(self.discriminate(params, inputr, k_d2))
        alpha = jax.random.uniform(k_alpha, (inputr.shape[0], 1))
        interp = alpha * inputr + (1 - alpha) * inputf

        def d_sum(x):
            # gradient_penalty's D(interpolates) is a fresh train-mode
            # forward: dropout masks active (Model/MMSSL.py:205-210).
            return jnp.sum(self.discriminate(params, x, k_gp))

        grads = jax.grad(d_sum)(interp)
        gp = 0.3 * jnp.mean((jnp.sqrt(jnp.sum(grads ** 2, 1) + 1e-12) - 1) ** 2)
        return lossr + lossf + self.gp_rate * gp

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        k_f, k_d = jax.random.split(rng)
        out = self.forward(params, state, k_f)
        u_g, i_g, img_item, txt_item, img_user, txt_user, img_uid, txt_uid = out
        bu, bp, bn, w = batch.users, batch.pos_items, batch.neg_items, batch.weights
        u = u_g[bu]
        pos = i_g[bp]
        neg = i_g[bn]
        mf = -masked_mean(
            jax.nn.log_sigmoid(jnp.sum(u * pos, 1) - jnp.sum(u * neg, 1)), w
        )
        emb = self.reg_weight * 0.5 * (
            jnp.sum(u ** 2 * w[:, None]) + jnp.sum(pos ** 2 * w[:, None])
            + jnp.sum(neg ** 2 * w[:, None])
        ) / 1024.0
        feat_reg = self.feat_reg_decay * 0.5 * (
            jnp.sum(img_item ** 2) + jnp.sum(txt_item ** 2)
            + jnp.sum(img_user ** 2) + jnp.sum(txt_user ** 2)
        ) / self.num_item
        img_sim = self._u_sim(bu, img_user, img_item)
        txt_sim = self._u_sim(bu, txt_user, txt_item)
        cl = full_catalog_cl(img_uid[bu], u_g[bu], self.tau) + full_catalog_cl(
            txt_uid[bu], u_g[bu], self.tau
        )
        g_inputf = jnp.concatenate([img_sim, txt_sim], 0)
        g_lossf = -jnp.mean(self.discriminate(params, g_inputf, k_d))
        loss = mf + emb + feat_reg + self.cl_rate * cl + self.G_rate * g_lossf

        # T=1 rebuild state machine (see docstring)
        k = max(self.k_top, 1)
        img_top = jax.lax.top_k(jax.lax.stop_gradient(img_sim), k)[1]
        txt_top = jax.lax.top_k(jax.lax.stop_gradient(txt_sim), k)[1]

        def rebuild(_):
            valid = state["buf_valid"] > 0
            contrib = jnp.where(valid & (self.k_top > 0), 1.0, 0.0)
            img = jnp.zeros_like(state["image_cnt"]).at[
                state["buf_users"][:, None], state["buf_image"]
            ].add(contrib)
            txt = jnp.zeros_like(state["text_cnt"]).at[
                state["buf_users"][:, None], state["buf_text"]
            ].add(contrib)
            return {
                "image_cnt": img, "text_cnt": txt,
                "buf_users": state["buf_users"],
                "buf_image": state["buf_image"],
                "buf_text": state["buf_text"],
                "buf_valid": jnp.zeros(()),
            }

        def accumulate(_):
            return {
                "image_cnt": state["image_cnt"],
                "text_cnt": state["text_cnt"],
                "buf_users": bu, "buf_image": img_top, "buf_text": txt_top,
                "buf_valid": jnp.ones(()),
            }

        new_state = jax.lax.cond(batch.index > 0, rebuild, accumulate, None)
        return loss, jax.tree.map(jax.lax.stop_gradient, new_state)

    def embeddings_stateful(self, params: Params, state):
        u_g, i_g, *_ = self.forward(params, state)
        return u_g, i_g


class MMSSLTrainer:
    """Alternating D / generator steps (train_and_evaluate.py:49-71)."""

    def __init__(self, model, dataset, cfg, optimizer=None):
        from chaorec_tpu.train.loop import Trainer

        self._base = Trainer(model, dataset, cfg)
        base = self._base
        model = base.model
        cfg = base.cfg

        d_labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "d" if str(path[0].key).startswith("D_") else "frozen",
            model.init_params(jax.random.PRNGKey(0)),
        )
        self.opt_d = optax.multi_transform(
            {"d": optax.adam(3e-4, b1=0.5, b2=0.9),
             "frozen": optax.set_to_zero()},
            d_labels,
        )
        self.opt_main = optax.adamw(cfg.learning_rate, weight_decay=0.01)
        opt_d, opt_main = self.opt_d, self.opt_main

        from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives

        num_item = base.dataset.num_item

        def epoch(model, params, mstate, rng, edges, history):
            # optimizers re-created per epoch in the reference
            opt_d_state = opt_d.init(params)
            opt_main_state = opt_main.init(params)
            rng, shuffle_rng = jax.random.split(rng)
            users, pos, weights, _ = make_epoch_batches(
                shuffle_rng, edges, cfg.batch_size
            )

            def step(carry, xs):
                params, od, om, mstate, rng = carry
                u, p, w, idx = xs
                rng, k_neg, k_d, k_g = jax.random.split(rng, 4)
                neg = sample_negatives(k_neg, u, history, num_item,
                                       cfg.neg_candidates)
                batch = Batch(u, p, neg, w, idx)
                loss_d, g_d = jax.value_and_grad(model.loss_d)(
                    params, mstate, batch, k_d)
                upd, od = opt_d.update(g_d, od, params)
                params = optax.apply_updates(params, upd)
                (loss, mstate), g = jax.value_and_grad(
                    model.loss_stateful, has_aux=True
                )(params, mstate, batch, k_g)
                upd, om = opt_main.update(g, om, params)
                params = optax.apply_updates(params, upd)
                # the reference logs sum(loss_D + batch_loss)
                # (train_and_evaluate.py:69-70)
                return (params, od, om, mstate, rng), loss_d + loss

            (params, _, _, mstate, rng), losses = jax.lax.scan(
                step, (params, opt_d_state, opt_main_state, mstate, rng),
                (users, pos, weights,
                 jnp.arange(users.shape[0], dtype=jnp.int32)),
            )
            return params, mstate, rng, jnp.sum(losses)

        jitted = jax.jit(epoch, donate_argnums=(1,))
        base._epoch_fn = None

        def train_epoch(params, opt_state, rng, epoch_idx):
            new_params, base.model_state, rng, loss = jitted(
                base.model, params, base.model_state, rng,
                base.edges, base.history,
            )
            return new_params, opt_state, rng, loss

        base.train_epoch = train_epoch

    def run(self):
        return self._base.run()


MMSSL.trainer_cls = MMSSLTrainer
