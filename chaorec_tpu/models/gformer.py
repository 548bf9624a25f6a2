"""GFormer: masked graph-transformer autoencoder for recommendation.

Reference: Model/GFormer.py + its training loop
(train_and_evaluate.py:245-258, main.py:363-364). Capabilities reproduced:

- anchor-set positional encoding: 32 random anchor nodes, BFS shortest
  paths over the interaction graph, distance kernel 1/(d+1) (0 when
  unreachable) (Model/GFormer.py:493-526; computed here with scipy
  csgraph instead of networkx);
- PNN layer (Model/GFormer.py:152-181) incl. the reference's reshape
  quirk: the "self feature" tensor is ``embeds.repeat(A,1).reshape(N,A,E)``
  whose (i, a) element is ``embeds[(i*A + a) % N]`` — a strided scramble,
  NOT embeds[i] repeated; reproduced verbatim via a precomputed index map;
- edge-level graph transformer (GTLayer, Model/GFormer.py:184-231):
  per-edge q/k dot products clamped to [-10, 10], exp-normalized per
  destination row (+1e-8), 4 heads;
- LocalGraph sampler (every 10 steps, train_and_evaluate.py:245-252):
  PNN-positional embeds through the shared GTLayer over the base graph
  augmented with addRate=0.01 random edges (rows/cols sampled
  *independently* from the edge-endpoint marginals — reference quirk) +
  self loops; per-edge attention scores drive RandomMaskSubgraphs
  (Model/GFormer.py:234-394): encoder graph = weighted sample (without
  replacement, p ∝ 1/exp(clamp(att,3))) of keepRate=0.9 edges + self
  loops, rowsum^-0.5 normalized both sides; decoder graph = dropped edges
  + ext/reRate random resamples + self loops, deduped, unweighted;
  sub/cmp graphs = 10% samples with p ∝ att+0.001 / p ∝ 1/exp(att).
  All host-side sampling (numpy in the reference too) produces
  fixed-capacity padded edge arrays with validity masks so the jitted
  10-step training scan compiles once; without-replacement weighted
  draws use the Gumbel top-k trick (identical distribution);
- forward (Model/GFormer.py:531-574): gtw=0.1-weighted GT hops on
  sub/cmp, GCN stack on the encoder graph (sub/cmp streams fed from the
  encoder stream's last state), pnn_layer PNN hops (train only), one GT
  hop on the decoder graph, summed; eval uses the plain normalized adj
  and skips PNN/decoder (Model/GFormer.py:645-650);
- loss (Model/GFormer.py:612-643): bpr = mean(-sum(anc*pos)) (eq13, no
  sigmoid), auxiliary bpr on the sub stream (neg embeds from the MAIN
  stream — quirk) divided by hardcoded 1024, reg over 5 of the 7 passed
  embeds (quirk), contrast terms: +logsumexp over unique batch users /
  pos items (self tables), user-vs-item cross term, and ctra * elementwise
  NCE between sub and cmp streams;
- optimizer: Adam + global-norm gradient clipping at 20
  (train_and_evaluate.py:256).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import masked_mean


class GFGraphs(NamedTuple):
    """Fixed-capacity sampled graphs for one 10-step group."""

    enc_rows: jnp.ndarray
    enc_cols: jnp.ndarray
    enc_w: jnp.ndarray  # 0 on padding
    dec_rows: jnp.ndarray
    dec_cols: jnp.ndarray
    dec_valid: jnp.ndarray
    sub_rows: jnp.ndarray
    sub_cols: jnp.ndarray
    sub_w: jnp.ndarray
    sub_valid: jnp.ndarray
    cmp_rows: jnp.ndarray
    cmp_cols: jnp.ndarray
    cmp_w: jnp.ndarray
    cmp_valid: jnp.ndarray


class GFormer(RecModel):
    name = "GFormer"
    gtw = 0.1  # Model/GFormer.py:410
    anchor_set_num = 32
    head = 4
    add_rate = 0.01
    re_rate = 0.8
    sub_rate = 0.1
    ext_rate = 0.5
    keep_rate = 0.9
    fix_steps = 10  # train_and_evaluate.py:246

    def __init__(self, num_user, num_item, train_edges, dim_E, reg_weight,
                 n_layers, pnn_layer, ssl_reg, b2, ctra, seed: int = 0):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.pnn_layer = pnn_layer
        self.ssl_reg = ssl_reg
        self.b2 = b2
        self.ctra = ctra
        n = num_user + num_item
        self.num_nodes = n

        edges = np.asarray(train_edges)
        rows = np.concatenate([edges[:, 0], edges[:, 1] + num_user])
        cols = np.concatenate([edges[:, 1] + num_user, edges[:, 0]])
        deg = np.bincount(rows, minlength=n).astype(np.float64) + 1e-7
        d = deg ** -0.5
        self.base_rows_np = rows.astype(np.int32)
        self.base_cols_np = cols.astype(np.int32)
        self.adj_rows = jnp.asarray(rows, jnp.int32)
        self.adj_cols = jnp.asarray(cols, jnp.int32)
        self.adj_w = jnp.asarray(d[rows] * d[cols], jnp.float32)

        # anchor-set shortest paths (Model/GFormer.py:493-521), scipy BFS
        import scipy.sparse as sp
        from scipy.sparse.csgraph import dijkstra

        rs = np.random.default_rng(seed)
        anchors = rs.choice(n, size=min(self.anchor_set_num, n),
                            replace=False)
        g = sp.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                          shape=(n, n))
        dist = dijkstra(g, indices=anchors, unweighted=True)
        dists = np.where(np.isfinite(dist), 1.0 / (dist + 1.0), 0.0)
        self.anchor_ids = jnp.asarray(anchors, jnp.int32)
        self.dists = jnp.asarray(dists, jnp.float32)  # (A, N)
        a = len(anchors)
        # the repeat/reshape scramble of the reference "self feature"
        self.scramble = jnp.asarray(
            (np.arange(n)[:, None] * a + np.arange(a)[None]) % n, jnp.int32
        )

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        e = self.dim_E
        ks = jax.random.split(rng, 7 + self.pnn_layer)
        p = {
            "u_emb": xavier_uniform(ks[0], (self.num_user, e)),
            "i_emb": xavier_uniform(ks[1], (self.num_item, e)),
            "gt_q": xavier_uniform(ks[2], (e, e)),
            "gt_k": xavier_uniform(ks[3], (e, e)),
            "gt_v": xavier_uniform(ks[4], (e, e)),
        }
        # the sampler's own PNN (LocalGraph.pnn, Model/GFormer.py:40)
        p["smp_pnn_w"], p["smp_pnn_b"] = torch_linear_init(ks[5], e, 2 * e)
        for l in range(self.pnn_layer):
            p[f"pnn_w{l}"], p[f"pnn_b{l}"] = torch_linear_init(
                ks[6 + l], e, 2 * e)
        return p

    def _ego(self, params):
        return jnp.concatenate([params["u_emb"], params["i_emb"]], axis=0)

    # ------------------------------------------------------------------
    def _gt(self, params, rows, cols, valid, x):
        """GTLayer (Model/GFormer.py:184-231); invalid edges contribute 0."""
        h = self.head
        dh = self.dim_E // h
        q = (x[rows] @ params["gt_q"]).reshape(-1, h, dh)
        k = (x[cols] @ params["gt_k"]).reshape(-1, h, dh)
        v = (x[cols] @ params["gt_v"]).reshape(-1, h, dh)
        att = jnp.clip(jnp.sum(q * k, axis=-1), -10.0, 10.0)
        exp_att = jnp.exp(att) * valid[:, None]
        att_norm = jax.ops.segment_sum(exp_att, rows,
                                       num_segments=self.num_nodes)[rows]
        att = exp_att / (att_norm + 1e-8)
        res = (att[..., None] * v).reshape(-1, self.dim_E)
        res = jax.ops.segment_sum(res, rows, num_segments=self.num_nodes)
        return res, att

    def _gcn(self, rows, cols, w, x):
        return jax.ops.segment_sum(w[:, None] * x[cols], rows,
                                   num_segments=self.num_nodes)

    def _pnn(self, w, b, x):
        """PNNLayer (Model/GFormer.py:152-181) with the self-feature
        scramble reproduced."""
        anchor_emb = x[self.anchor_ids]  # (A, E)
        messages = self.dists.T[:, :, None] * anchor_emb[None]  # (N, A, E)
        self_feat = x[self.scramble]  # (N, A, E) -- scrambled (quirk)
        m = jnp.concatenate([messages, self_feat], axis=-1) @ w.T + b
        return jnp.mean(m, axis=1)

    # ------------------------------------------------------------------
    def sampler_att(self, params, rows, cols, valid):
        """LocalGraph.forward (Model/GFormer.py:116-149): PNN embeds ->
        GT attention per edge, summed over heads."""
        emb = self._pnn(params["smp_pnn_w"], params["smp_pnn_b"],
                        self._ego(params))
        _, att = self._gt(params, rows, cols, valid, emb)
        return jnp.sum(att, axis=-1)

    def _forward_train(self, params, g: GFGraphs):
        ego = self._ego(params)
        emb_c, _ = self._gt(params, g.cmp_rows, g.cmp_cols, g.cmp_valid, ego)
        c_sum = ego + self.gtw * emb_c
        emb_s, _ = self._gt(params, g.sub_rows, g.sub_cols, g.sub_valid, ego)
        s_sum = ego + self.gtw * emb_s
        total = ego
        last = ego
        for _ in range(self.n_layers):
            e1 = self._gcn(g.enc_rows, g.enc_cols, g.enc_w, last)
            s_sum = s_sum + self._gcn(g.sub_rows, g.sub_cols, g.sub_w, last)
            c_sum = c_sum + self._gcn(g.cmp_rows, g.cmp_cols, g.cmp_w, last)
            total = total + e1
            last = e1
        for l in range(self.pnn_layer):
            last = self._pnn(params[f"pnn_w{l}"], params[f"pnn_b{l}"], last)
            total = total + last
        dec, _ = self._gt(params, g.dec_rows, g.dec_cols, g.dec_valid, last)
        total = total + dec
        return (total[:self.num_user], total[self.num_user:],
                c_sum, s_sum)

    def embeddings(self, params):
        """Eval forward: plain adj, no PNN/decoder (Model/GFormer.py:645)."""
        total = self._ego(params)
        last = total
        for _ in range(self.n_layers):
            last = self._gcn(self.adj_rows, self.adj_cols, self.adj_w, last)
            total = total + last
        return total[:self.num_user], total[self.num_user:]

    # ------------------------------------------------------------------
    @staticmethod
    def _contrast_uniq(nodes, emb, weights):
        """mean over UNIQUE valid nodes of log sum_j exp(e_n . e_j)
        (Model/GFormer.py:597-603)."""
        valid = weights > 0
        key = nodes * 2 + (1 - valid.astype(nodes.dtype))
        order = jnp.argsort(key)
        sn = nodes[order]
        sv = valid[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sn[1:] != sn[:-1]])
        m = (first & sv).astype(jnp.float32)
        from chaorec_tpu.ops.losses import catalog_logsumexp

        lse = catalog_logsumexp(emb[sn], emb)
        return jnp.sum(lse * m) / jnp.maximum(jnp.sum(m), 1.0)

    def loss_graphs(self, params: Params, batch: Batch, g: GFGraphs):
        u_g, i_g, c_all, s_all = self._forward_train(params, g)
        anc = u_g[batch.users]
        pos = i_g[batch.pos_items]
        neg = i_g[batch.neg_items]
        s_u = s_all[:self.num_user]
        s_i = s_all[self.num_user:]
        anc2 = s_u[batch.users]
        pos2 = s_i[batch.pos_items]
        w = batch.weights

        bpr = masked_mean(-jnp.sum(anc * pos, axis=-1), w)  # eq13
        pos2_s = jnp.sum(anc2 * pos2, axis=1)
        neg2_s = jnp.sum(anc2 * neg, axis=1)  # neg from MAIN stream (quirk)
        bpr2 = -masked_mean(
            jnp.log(jax.nn.sigmoid(pos2_s - neg2_s) + 1e-5), w) / 1024.0
        reg = self.reg_weight * (
            masked_mean(jnp.mean(anc ** 2, -1), w)
            + masked_mean(jnp.mean(pos ** 2, -1), w)
            + masked_mean(jnp.mean(neg ** 2, -1), w)
            + masked_mean(jnp.mean(anc2 ** 2, -1), w)
            + masked_mean(jnp.mean(pos2 ** 2, -1), w)
        )
        contrast = (
            self._contrast_uniq(batch.users, u_g, w)
            + self._contrast_uniq(batch.pos_items, i_g, w)
        ) * self.ssl_reg
        from chaorec_tpu.ops.losses import catalog_logsumexp

        contrast = contrast + masked_mean(
            catalog_logsumexp(u_g[batch.users], i_g), w)
        nce = masked_mean(
            jax.nn.logsumexp(s_all[batch.users] * c_all[batch.users],
                             axis=-1), w)
        return bpr + reg + contrast + self.ctra * nce + self.b2 * bpr2


# ----------------------------------------------------------------------
def _gumbel_topk_choice(rng: np.random.Generator, n: int, k: int,
                        p: np.ndarray) -> np.ndarray:
    """Weighted sampling WITHOUT replacement via Gumbel top-k (identical
    in distribution to np.random.choice(replace=False, p=p))."""
    logp = np.log(np.maximum(p, 1e-30))
    gumbel = -np.log(-np.log(rng.random(n) + 1e-30) + 1e-30)
    return np.argpartition(-(logp + gumbel), k - 1)[:k] if k < n else \
        np.arange(n)


class GFormerTrainer:
    """Python-grouped epochs: resample graphs every fix_steps batches on
    the host (numpy, as the reference), run each group as one jitted
    lax.scan (train_and_evaluate.py:245-258)."""

    def __init__(self, model, dataset, cfg, optimizer=None):
        import optax

        from chaorec_tpu.train.loop import Trainer

        opt = optax.chain(
            optax.clip_by_global_norm(20.0),  # train_and_evaluate.py:256
            optax.adam(cfg.learning_rate),
        )
        self._base = Trainer(model, dataset, cfg, optimizer=opt)
        base = self._base
        self.model = base.model
        self.cfg = base.cfg
        self.np_rng = np.random.default_rng(cfg.seed + 7)
        m = self.model
        n = m.num_nodes
        e0 = len(m.base_rows_np)
        self.n_add = int(e0 * m.add_rate)
        self.cap_add = 2 * self.n_add + n + e0
        self.cap_enc = n + int(self.cap_add * m.keep_rate)
        self.cap_dec = 2 * int(self.cap_add * m.re_rate) + n + self.cap_enc
        self.cap_sub = n + int(self.cap_add * m.sub_rate)

        self._att_fn = jax.jit(
            lambda mm, p, r, c, v: mm.sampler_att(p, r, c, v))
        self._group_fns = {}
        self._optax = optax

        def train_epoch(params, opt_state, rng, epoch_idx):
            return self._train_epoch(params, opt_state, rng)

        base.train_epoch = train_epoch

    # ------------------------------------------------------------------
    def _pad(self, arr, cap, fill=0):
        out = np.full((cap,), fill, arr.dtype)
        out[:len(arr)] = arr
        return out

    def _sym_norm(self, rows, cols, n):
        rowsum = np.bincount(rows, minlength=n).astype(np.float64)
        d = np.where(rowsum > 0, rowsum, 1.0) ** -0.5
        d = np.where(rowsum > 0, d, 0.0)
        return (d[rows] * d[cols]).astype(np.float32)

    def _host_sample(self, params) -> GFGraphs:
        """LocalGraph + RandomMaskSubgraphs on the host."""
        m = self.model
        rng = self.np_rng
        n = m.num_nodes
        br, bc = m.base_rows_np, m.base_cols_np
        add_r = rng.choice(br, size=self.n_add)
        add_c = rng.choice(bc, size=self.n_add)
        new_r = np.concatenate([add_r, add_c, np.arange(n, dtype=np.int32),
                                br]).astype(np.int64)
        new_c = np.concatenate([add_c, add_r, np.arange(n, dtype=np.int32),
                                bc]).astype(np.int64)
        uniq = np.unique(new_r * n + new_c)
        er = (uniq // n).astype(np.int32)
        ec = (uniq % n).astype(np.int32)
        e_adj = len(er)

        r_pad = self._pad(er, self.cap_add)
        c_pad = self._pad(ec, self.cap_add)
        v_pad = np.zeros((self.cap_add,), np.float32)
        v_pad[:e_adj] = 1.0
        att = np.asarray(self._att_fn(
            m, params, jnp.asarray(r_pad), jnp.asarray(c_pad),
            jnp.asarray(v_pad)))[:e_adj].astype(np.float64)

        att = np.minimum(att, 3.0)  # att_f[att_f > 3] = 3
        inv = 1.0 / np.exp(att + 1e-8)
        p_inv = inv / inv.sum()

        # encoder: keep 90% by inverse-attention, + self loops
        keep_n = int(e_adj * m.keep_rate)
        keep_idx = np.sort(_gumbel_topk_choice(rng, e_adj, keep_n, p_inv))
        kr, kc = er[keep_idx], ec[keep_idx]
        enc_r = np.concatenate([np.arange(n, dtype=np.int32), kr])
        enc_c = np.concatenate([np.arange(n, dtype=np.int32), kc])
        enc_w = self._sym_norm(enc_r, enc_c, n)

        # decoder: dropped + ext/reRate resamples + self loops, deduped
        drop = np.ones(e_adj, bool)
        drop[keep_idx] = False
        drop_r, drop_c = er[drop], ec[drop]
        ext_r = rng.choice(enc_r, size=int(len(drop_r) * m.ext_rate))
        ext_c = rng.choice(enc_c, size=int(len(drop_c) * m.ext_rate))
        tmp_r = np.concatenate([ext_r, drop_r])
        tmp_c = np.concatenate([ext_c, drop_c])
        n_re = int(e_adj * m.re_rate)
        res_r = rng.choice(tmp_r, size=n_re) if len(tmp_r) else tmp_r
        res_c = rng.choice(tmp_c, size=n_re) if len(tmp_c) else tmp_c
        d_r = np.concatenate([res_r, res_c, np.arange(n), enc_r]).astype(
            np.int64)
        d_c = np.concatenate([res_c, res_r, np.arange(n), enc_c]).astype(
            np.int64)
        uniq_d = np.unique(d_r * n + d_c)
        dr = (uniq_d // n).astype(np.int32)
        dc = (uniq_d % n).astype(np.int32)

        # sub / cmp 10% samples (Model/GFormer.py:254-310)
        sub_n = int(e_adj * m.sub_rate)
        p_sub = (att + 0.001)
        p_sub = p_sub / p_sub.sum()
        si = np.sort(_gumbel_topk_choice(rng, e_adj, sub_n, p_sub))
        ci = np.sort(_gumbel_topk_choice(rng, e_adj, sub_n, p_inv))

        def sub_graph(idx, cap):
            rr = np.concatenate([np.arange(n, dtype=np.int32), er[idx]])
            cc = np.concatenate([np.arange(n, dtype=np.int32), ec[idx]])
            ww = self._sym_norm(rr, cc, n)
            vv = np.zeros((cap,), np.float32)
            vv[:len(rr)] = 1.0
            return (jnp.asarray(self._pad(rr, cap)),
                    jnp.asarray(self._pad(cc, cap)),
                    jnp.asarray(self._pad(ww, cap)),
                    jnp.asarray(vv))

        sub_g = sub_graph(si, self.cap_sub)
        cmp_g = sub_graph(ci, self.cap_sub)
        dec_v = np.zeros((self.cap_dec,), np.float32)
        dec_v[:len(dr)] = 1.0
        return GFGraphs(
            enc_rows=jnp.asarray(self._pad(enc_r, self.cap_enc)),
            enc_cols=jnp.asarray(self._pad(enc_c, self.cap_enc)),
            enc_w=jnp.asarray(self._pad(enc_w, self.cap_enc)),
            dec_rows=jnp.asarray(self._pad(dr, self.cap_dec)),
            dec_cols=jnp.asarray(self._pad(dc, self.cap_dec)),
            dec_valid=jnp.asarray(dec_v),
            sub_rows=sub_g[0], sub_cols=sub_g[1], sub_w=sub_g[2],
            sub_valid=sub_g[3],
            cmp_rows=cmp_g[0], cmp_cols=cmp_g[1], cmp_w=cmp_g[2],
            cmp_valid=cmp_g[3],
        )

    # ------------------------------------------------------------------
    def _group_fn(self, k: int):
        if k in self._group_fns:
            return self._group_fns[k]
        base = self._base
        cfg = self.cfg
        optimizer = base.optimizer
        num_item = base.dataset.num_item

        from chaorec_tpu.data.sampling import sample_negatives

        def group(model, params, opt_state, g, users, pos, weights, rng,
                  history):
            def step(carry, xs):
                params, opt_state, rng = carry
                u, p, w = xs
                rng, k_neg = jax.random.split(rng)
                neg = sample_negatives(k_neg, u, history, num_item,
                                       cfg.neg_candidates)
                batch = Batch(u, p, neg, w)
                loss, grads = jax.value_and_grad(model.loss_graphs)(
                    params, batch, g)
                upd, opt_state = optimizer.update(grads, opt_state, params)
                params = self._optax.apply_updates(params, upd)
                return (params, opt_state, rng), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), (users, pos, weights))
            return params, opt_state, rng, jnp.sum(losses)

        fn = jax.jit(group, donate_argnums=(1, 2))
        self._group_fns[k] = fn
        return fn

    def _train_epoch(self, params, opt_state, rng):
        from chaorec_tpu.data.sampling import make_epoch_batches

        base = self._base
        rng, k_shuf = jax.random.split(rng)
        users, pos, weights, _ = make_epoch_batches(
            k_shuf, base.edges, self.cfg.batch_size)
        nb = users.shape[0]
        total = 0.0
        fs = self.model.fix_steps
        for start in range(0, nb, fs):
            k = min(fs, nb - start)
            g = self._host_sample(params)
            fn = self._group_fn(k)
            params, opt_state, rng, loss = fn(
                self.model, params, opt_state, g,
                users[start:start + k], pos[start:start + k],
                weights[start:start + k], rng, base.history)
            total += float(loss)
        return params, opt_state, rng, total

    def run(self):
        return self._base.run()


GFormer.trainer_cls = GFormerTrainer
