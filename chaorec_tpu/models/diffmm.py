"""DiffMM: multi-modal diffusion-rebuilt graphs + modal-fused GCN.

Reference: Model/DiffMM.py + its three-phase epoch
(train_and_evaluate.py:140-244). Capabilities reproduced:

- two DiffRec-style denoisers (image/text) over dense user rows, dims
  "[1000]", time-emb 10, dropout 0.5, trained each epoch with *fresh*
  Adam(lr, wd=0) optimizers (train_and_evaluate.py:142-145); loss =
  SNR-weighted x0 MSE with **uniform** timesteps (Model/DiffMM.py:625-663,
  torch.randint — no importance sampling, unlike DiffRec) plus
  e_loss * modal-signal-injection MSE between ``x0_hat @ feats`` and
  ``x_start @ iEmbeds`` (both detached, Model/DiffMM.py:652-660);
- per-epoch UI-matrix rebuild: deterministic p_sample (sampling_steps=0)
  per modality, top-``rebuild_k`` items per user, binarized (U+I)^2 block
  adjacency + I, sym-normalized, then SpAdjDropEdge keep=0.5 (values/keep,
  no renorm, Model/DiffMM.py:26-40,166-180, train_and_evaluate.py:183-240).
  Here the rebuilt graph stays in fixed-shape form: per-user top-k item
  indices + the four normalized/dropped weight arrays (u->i, i->u, and the
  two self-loop diagonals get independent drop masks, exactly the nnz
  granularity of the reference's COO);
- recommendation loss (Model/DiffMM.py:203-353): forward_MM fuses, per
  modality, the eq20 two-hop feature propagation over the main adjacency
  plus ris_adj_lambda(=0.2) * one hop over the rebuilt modal adjacency,
  softmax([.5,.5])-weighted modal mix, n_layers GCN (sum incl. input),
  + ris_lambda * normalize(modal); BPR(+1e-5) + reg (mean of squares) +
  ssl_alpha * full-catalog contrast between the two forward_cl_MM views
  (cl_method=0: image-view vs text-view, Model/DiffMM.py:336-348);
- diffusion schedule beta[0] fixed to 1e-4 (Model/DiffMM.py:495), steps=5,
  noise_scale=0.1, noise in [1e-4, 0.02] (Model/DiffMM.py:58-62);
- eval ranks forward_MM embeddings with 1e-6 history masking
  (Model/DiffMM.py:364-380).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.graphs.knn import gather_weighted_sum
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops import diffusion as diff
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm, masked_mean


class ModalAdj(NamedTuple):
    """Fixed-shape rebuilt modal adjacency (buildUIMatrix + edgeDropper).

    ``topk``: (U, K) item indices; ``v_ui``/``v_iu``: (U, K) normalized and
    dropout-scaled edge weights for the two directions; ``self_u``: (U,),
    ``self_i``: (I,) self-loop weights. All four value arrays carry their
    own SpAdjDropEdge masks (each nnz of the reference COO is dropped
    independently).
    """

    topk: jnp.ndarray
    v_ui: jnp.ndarray
    v_iu: jnp.ndarray
    self_u: jnp.ndarray
    self_i: jnp.ndarray


def modal_prop(adj: ModalAdj, xu: jnp.ndarray, xi: jnp.ndarray):
    """One hop of ``spmm(modal_adj, concat([xu, xi]))`` split into parts."""
    new_u = gather_weighted_sum(xi, adj.v_ui, adj.topk)
    new_u = new_u + adj.self_u[:, None] * xu
    contrib = (adj.v_iu[:, :, None] * xu[:, None, :]).reshape(-1, xu.shape[-1])
    new_i = jnp.zeros_like(xi).at[adj.topk.reshape(-1)].add(contrib)
    new_i = new_i + adj.self_i[:, None] * xi
    return new_u, new_i


def build_modal_adj(topk: jnp.ndarray, num_item: int, keep_rate: float,
                    rng: jax.Array) -> ModalAdj:
    """buildUIMatrix (Model/DiffMM.py:166-180) + SpAdjDropEdge (:26-40).

    Binarized bipartite block + identity, D^-1/2 A D^-1/2; user degree is
    exactly K+1 (top-k indices are distinct), item degree = pick-count + 1.
    Every nnz keeps with prob ``keep_rate`` and is scaled by 1/keep_rate.
    """
    num_user, k = topk.shape
    cnt = jnp.zeros((num_item,), jnp.float32).at[topk.reshape(-1)].add(1.0)
    deg_u = float(k + 1)
    deg_i = cnt + 1.0
    inv_su = 1.0 / math.sqrt(deg_u)
    inv_si = jax.lax.rsqrt(deg_i)
    val = inv_su * inv_si[topk]  # (U, K) symmetric edge weight
    k_ui, k_iu, k_su, k_si = jax.random.split(rng, 4)
    scale = 1.0 / keep_rate

    def drop(key, v):
        return v * jax.random.bernoulli(key, keep_rate, v.shape) * scale

    return ModalAdj(
        topk=topk,
        v_ui=drop(k_ui, val),
        v_iu=drop(k_iu, val),
        self_u=drop(k_su, jnp.full((num_user,), 1.0 / deg_u)),
        self_i=drop(k_si, 1.0 / deg_i),
    )


def dnn_init(rng: jax.Array, num_item: int, hidden, emb_size: int) -> Params:
    """Denoise-MLP params (Model/DiffMM.py:377-435): weights N(0, xavier
    std), biases N(0, 0.001); same structure as DiffRec's DNN."""
    out_dims = list(hidden) + [num_item]
    in_dims = out_dims[::-1]

    def lin(key, d_out, d_in):
        k_w, k_b = jax.random.split(key)
        std = math.sqrt(2.0 / (d_in + d_out))
        return (std * jax.random.normal(k_w, (d_out, d_in)),
                0.001 * jax.random.normal(k_b, (d_out,)))

    ks = jax.random.split(rng, 1 + 2 * len(hidden) + 2)
    p = {}
    p["emb_w"], p["emb_b"] = lin(ks[0], emb_size, emb_size)
    in_full = [in_dims[0] + emb_size] + in_dims[1:]
    for i, (d_in, d_out) in enumerate(zip(in_full[:-1], in_full[1:])):
        p[f"in_w{i}"], p[f"in_b{i}"] = lin(ks[1 + i], d_out, d_in)
    off = 1 + len(in_dims) - 1
    for i, (d_in, d_out) in enumerate(zip(out_dims[:-1], out_dims[1:])):
        p[f"out_w{i}"], p[f"out_b{i}"] = lin(ks[off + i], d_out, d_in)
    return p


def dnn_forward(p: Params, x, ts, emb_size: int, n_layers: int,
                rng=None, dropout: float = 0.5, compute_dtype=None):
    """tanh MLP over [x, time_emb]; dropout on x only when training
    (Model/DiffMM.py:437-473; sampling passes mess_dropout=False).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the wide
    (B, num_nodes) x (num_nodes, hidden) matmuls on the MXU in reduced
    precision with fp32 accumulation — used by the no-gradient sampling
    paths (MHRec phase B, ~130 TFLOP/epoch on beauty) where only the
    ordinal top-k of the scores matters; ``None`` keeps exact fp32
    (training losses)."""
    if compute_dtype is None:
        mm = lambda h, w: h @ w.T
    else:
        mm = lambda h, w: jnp.dot(
            h.astype(compute_dtype), w.astype(compute_dtype).T,
            preferred_element_type=jnp.float32)
    emb = diff.timestep_embedding(ts, emb_size)
    emb = emb @ p["emb_w"].T + p["emb_b"]
    if rng is not None:
        keep = 1.0 - dropout
        x = x * jax.random.bernoulli(rng, keep, x.shape) / keep
    h = jnp.concatenate([x, emb], axis=-1)
    for i in range(n_layers):
        h = jnp.tanh(mm(h, p[f"in_w{i}"]) + p[f"in_b{i}"])
    for i in range(n_layers):
        h = mm(h, p[f"out_w{i}"]) + p[f"out_b{i}"]
        if i != n_layers - 1:
            h = jnp.tanh(h)
    return h


class DiffMM(RecModel):
    name = "DiffMM"
    stateful = True
    ris_adj_lambda = 0.2  # Model/DiffMM.py:57
    keep_rate = 0.5  # Model/DiffMM.py:85
    emb_size = 10  # d_emb_size, Model/DiffMM.py:110
    dnn_dropout = 0.5

    def __init__(self, num_user, num_item, graph: BipartiteGraph,
                 dense_interactions, v_feat, t_feat, dim_E, reg_weight,
                 n_layers, ssl_alpha, ssl_temp, ris_lambda, e_loss,
                 rebuild_k, hidden_dims=(1000,),
                 sample_compute_dtype="bfloat16"):
        super().__init__(num_user, num_item)
        # phase-B rebuild sampling precision (no-grad, ordinal top-k
        # output — same policy as MHRec phase B); training stays fp32
        self.sample_dtype = (jnp.bfloat16
                             if sample_compute_dtype == "bfloat16" else None)
        self.graph = graph
        self.x = dense_interactions
        self.v_feat = v_feat
        self.t_feat = t_feat
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_alpha = ssl_alpha
        self.ssl_temp = ssl_temp
        self.ris_lambda = ris_lambda
        self.e_loss = e_loss
        self.rebuild_k = min(int(rebuild_k), num_item)
        self.hidden_dims = tuple(hidden_dims)
        # steps=5, noise 0.1*[1e-4, 0.02], beta[0]=1e-4 (Model/DiffMM.py:58-62,495)
        self.sched = diff.make_schedule(0.1, 0.0001, 0.02, 5,
                                        beta_fixed_value=1e-4)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 8)
        img_w, img_b = torch_linear_init(ks[2], self.dim_E,
                                         self.v_feat.shape[1])
        txt_w, txt_b = torch_linear_init(ks[4], self.dim_E,
                                         self.t_feat.shape[1])
        return {
            "u_emb": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "i_emb": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
            # trans Linear: weight re-xavier'd, bias keeps torch default
            # (Model/DiffMM.py:89-93)
            "img_w": xavier_uniform(ks[3], (self.dim_E, self.v_feat.shape[1])),
            "img_b": img_b,
            "txt_w": xavier_uniform(ks[5], (self.dim_E, self.t_feat.shape[1])),
            "txt_b": txt_b,
            "modal_weight": jnp.array([0.5, 0.5], jnp.float32),
            "img_dn": dnn_init(ks[6], self.num_item, self.hidden_dims,
                               self.emb_size),
            "txt_dn": dnn_init(ks[7], self.num_item, self.hidden_dims,
                               self.emb_size),
        }

    def init_state(self, rng: jax.Array):
        """Placeholder modal graphs; phases A+B rebuild them before any use."""
        z_top = jnp.zeros((self.num_user, self.rebuild_k), jnp.int32)
        z_uk = jnp.zeros((self.num_user, self.rebuild_k), jnp.float32)
        empty = ModalAdj(z_top, z_uk, z_uk,
                         jnp.zeros((self.num_user,), jnp.float32),
                         jnp.zeros((self.num_item,), jnp.float32))
        return empty, empty

    # ------------------------------------------------------------------
    def _feats(self, params: Params):
        img = self.v_feat @ params["img_w"].T + params["img_b"]
        txt = self.t_feat @ params["txt_w"].T + params["txt_b"]
        return img, txt

    def _dnn(self, params: Params, prefix: str, x, ts, rng=None,
             compute_dtype=None):
        return dnn_forward(params[prefix], x, ts, self.emb_size,
                           len(self.hidden_dims),
                           rng=rng, dropout=self.dnn_dropout,
                           compute_dtype=compute_dtype)

    def _gcn_sum(self, eu, ei):
        su, si = eu, ei
        for _ in range(self.n_layers):
            eu, ei = self.graph.propagate(eu, ei)
            su = su + eu
            si = si + ei
        return su, si

    def _forward(self, params: Params, state):
        """forward_MM (Model/DiffMM.py:205-262)."""
        adj_img, adj_txt = state
        xu, xi = params["u_emb"], params["i_emb"]
        img_f, txt_f = self._feats(params)
        w = jax.nn.softmax(params["modal_weight"])

        def modal_branch(adj, feats):
            a_u, a_i = modal_prop(adj, xu, xi)  # modal-adj hop on id embeds
            b_u, b_i = self.graph.propagate(xu, l2norm(feats))  # eq20 hop 1
            c_u, c_i = self.graph.propagate(b_u, xi)  # eq20 hop 2
            return (b_u + c_u + self.ris_adj_lambda * a_u,
                    b_i + c_i + self.ris_adj_lambda * a_i)

        img_u, img_i = modal_branch(adj_img, img_f)
        txt_u, txt_i = modal_branch(adj_txt, txt_f)
        mod_u = w[0] * img_u + w[1] * txt_u
        mod_i = w[0] * img_i + w[1] * txt_i
        su, si = self._gcn_sum(mod_u, mod_i)
        return (su + self.ris_lambda * l2norm(mod_u),
                si + self.ris_lambda * l2norm(mod_i))

    def _forward_cl(self, params: Params, state):
        """forward_cl_MM (Model/DiffMM.py:264-300): modal-adj hop on
        [uEmbeds; normalize(feats)], then the shared GCN stack."""
        adj_img, adj_txt = state
        xu, xi = params["u_emb"], params["i_emb"]
        img_f, txt_f = self._feats(params)
        i_u, i_i = modal_prop(adj_img, xu, l2norm(img_f))
        t_u, t_i = modal_prop(adj_txt, xu, l2norm(txt_f))
        u1, i1 = self._gcn_sum(i_u, i_i)
        u2, i2 = self._gcn_sum(t_u, t_i)
        return u1, i1, u2, i2

    @staticmethod
    def _contrast(e1, e2, nodes, temp, weights):
        """contrastLoss (Model/DiffMM.py:354-362): full-catalog denominator
        (streamed on TPU via the Pallas logsumexp kernel)."""
        from chaorec_tpu.ops.losses import catalog_logsumexp

        n1, n2 = l2norm(e1), l2norm(e2)
        p1, p2 = n1[nodes], n2[nodes]
        nume = jnp.sum(p1 * p2, axis=-1) / temp
        return -masked_mean(nume - catalog_logsumexp(p1, n2, temp), weights)

    # ------------------------------------------------------------------
    def loss_bpr(self, params: Params, state, batch: Batch):
        """Phase-C loss (Model/DiffMM.py:329-353, cl_method=0)."""
        u_g, i_g = self._forward(params, state)
        ue = u_g[batch.users]
        pe = i_g[batch.pos_items]
        ne = i_g[batch.neg_items]
        pos = jnp.sum(ue * pe, axis=1)
        neg = jnp.sum(ue * ne, axis=1)
        l_bpr = bpr_loss(pos, neg, batch.weights)
        reg = emb_l2_reg(self.reg_weight, [ue, pe, ne], batch.weights)
        u1, i1, u2, i2 = self._forward_cl(params, state)
        cl = (self._contrast(u1, u2, batch.users, self.ssl_temp, batch.weights)
              + self._contrast(i1, i2, batch.pos_items, self.ssl_temp,
                               batch.weights)) * self.ssl_alpha
        return l_bpr + reg + cl

    def loss_stateful(self, params: Params, state, batch: Batch,
                      rng: jax.Array):
        return self.loss_bpr(params, state, batch), state

    def embeddings_stateful(self, params: Params, state):
        return self._forward(params, state)

    # ------------------------------------------------------------------
    def diffusion_loss(self, params: Params, users, weights, rng: jax.Array):
        """Phase-A joint image+text denoiser loss
        (train_and_evaluate.py:148-176). iEmbeds and trans feats detached
        (Model/DiffMM.py:652-658)."""
        rows = self.x[users]
        i_emb = jax.lax.stop_gradient(params["i_emb"])
        img_f, txt_f = self._feats(params)
        img_f = jax.lax.stop_gradient(img_f)
        txt_f = jax.lax.stop_gradient(txt_f)
        k_img, k_txt = jax.random.split(rng)
        usr_id = rows @ i_emb

        def one(prefix, feats, key):
            k_t, k_n, k_d = jax.random.split(key, 3)
            ts = jax.random.randint(k_t, (rows.shape[0],), 0,
                                    self.sched.steps)
            noise = jax.random.normal(k_n, rows.shape)
            x_t = diff.q_sample(self.sched, rows, ts, noise)
            out = self._dnn(params, prefix, x_t, ts, rng=k_d)
            mse = jnp.mean((rows - out) ** 2, axis=1)
            w = diff.snr(self.sched, ts - 1) - diff.snr(self.sched, ts)
            w = jnp.where(ts == 0, 1.0, w)
            diff_l = masked_mean(w * mse, weights)
            gc = masked_mean(
                jnp.mean((out @ feats - usr_id) ** 2, axis=1), weights
            )
            return diff_l + gc * self.e_loss

        return one("img_dn", img_f, k_img) + one("txt_dn", txt_f, k_txt)

    def rebuild_graphs(self, params: Params, rng: jax.Array):
        """Phase B (train_and_evaluate.py:183-240): deterministic p_sample
        per modality, top-k per user, normalize, edge-drop."""
        k_img, k_txt = jax.random.split(rng)

        def one(prefix, key):
            # no-grad sampling; only the top-k ORDER survives into the
            # rebuilt adjacency, so the wide matmuls run at sample_dtype
            # (bf16 MXU, fp32 accumulation; float32 config = exact)
            scores = diff.p_sample(
                self.sched,
                lambda x_t, ts: self._dnn(params, prefix, x_t, ts,
                                          compute_dtype=self.sample_dtype),
                self.x,
            )
            topk = jax.lax.top_k(scores, self.rebuild_k)[1]
            return build_modal_adj(topk, self.num_item, self.keep_rate, key)

        return one("img_dn", k_img), one("txt_dn", k_txt)


class DiffMMTrainer:
    """Three-phase epoch (train_and_evaluate.py:140-244): (A) denoiser
    training over shuffled dense user rows with *fresh* Adam(lr, wd=0)
    each epoch, (B) no-grad UI-matrix rebuild, (C) BPR batches against the
    rebuilt modal graphs with the persistent main Adam."""

    def __init__(self, model, dataset, cfg, optimizer=None):
        import logging

        import numpy as np
        import optax

        from chaorec_tpu.data.sampling import (make_epoch_batches,
                                               sample_negatives)
        from chaorec_tpu.train.loop import Trainer

        self._base = Trainer(model, dataset, cfg)
        base = self._base
        model = base.model
        cfg = base.cfg
        num_item = dataset.num_item
        num_user = dataset.num_user

        dn_labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "dn" if str(path[0].key).endswith("_dn")
            else "frozen",
            model.init_params(jax.random.PRNGKey(0)),
        )
        opt_dn = optax.multi_transform(
            {"dn": optax.adam(cfg.learning_rate),
             "frozen": optax.set_to_zero()},
            dn_labels,
        )
        user_edges = jnp.stack(
            [jnp.arange(num_user, dtype=jnp.int32),
             jnp.zeros((num_user,), jnp.int32)], axis=1,
        )

        def phase_a(model, params, rng):
            # denoise optimizers re-created per epoch
            # (train_and_evaluate.py:142-145)
            opt_state = opt_dn.init(params)
            rng, k_shuf = jax.random.split(rng)
            users, _, weights, _ = make_epoch_batches(
                k_shuf, user_edges, cfg.batch_size
            )

            def step(carry, xs):
                params, opt_state, rng = carry
                u, w = xs
                rng, k = jax.random.split(rng)
                loss, grads = jax.value_and_grad(model.diffusion_loss)(
                    params, u, w, k
                )
                upd, opt_state = opt_dn.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state, rng), loss

            (params, _, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), (users, weights)
            )
            return params, rng, losses

        def phase_b(model, params, rng):
            return model.rebuild_graphs(params, rng)

        def phase_c(model, params, opt_state, state, rng, edges, history):
            rng, k_shuf = jax.random.split(rng)
            users, pos, weights, _ = make_epoch_batches(
                k_shuf, edges, cfg.batch_size
            )

            def step(carry, xs):
                params, opt_state, rng = carry
                u, p, w = xs
                rng, k_neg = jax.random.split(rng)
                neg = sample_negatives(k_neg, u, history, num_item,
                                       cfg.neg_candidates)
                batch = Batch(u, p, neg, w)
                loss, grads = jax.value_and_grad(model.loss_bpr)(
                    params, state, batch
                )
                upd, opt_state = base.optimizer.update(grads, opt_state,
                                                       params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state, rng), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), (users, pos, weights)
            )
            return params, opt_state, rng, jnp.sum(losses)

        jit_a = jax.jit(phase_a, donate_argnums=(1,))
        jit_b = jax.jit(phase_b)
        jit_c = jax.jit(phase_c, donate_argnums=(1, 2))
        n_diff_batches = num_user // cfg.batch_size

        def train_epoch(params, opt_state, rng, epoch_idx):
            params, rng, dlosses = jit_a(model, params, rng)
            for i, dl in enumerate(np.asarray(dlosses)):
                logging.info("Diffusion Step %d/%d; Diffusion Loss %.6f"
                             % (i, n_diff_batches, dl))
            logging.info("")
            logging.info("Start to re-build UI matrix")
            rng, k_b = jax.random.split(rng)
            base.model_state = jit_b(model, params, k_b)
            logging.info("UI matrix built!")
            params, opt_state, rng, loss = jit_c(
                model, params, opt_state, base.model_state, rng,
                base.edges, base.history,
            )
            return params, opt_state, rng, loss

        base.train_epoch = train_epoch

    def run(self):
        return self._base.run()


DiffMM.trainer_cls = DiffMMTrainer
