"""LightGT: light graph transformer over per-user item histories.

Reference: Model/LightGT.py + its dedicated datasets/loops
(dataload.py:61-148, train_and_evaluate.py:126-132, 573-577,
main.py:197-199,349-350). Capabilities reproduced:

- LightGCN tower whose layer-prefix means feed the transformer: with
  transformer_layers == n_layers == L, ``user_emb/item_emb`` = mean of all
  L+1 propagation states and ``*_mean[i]`` = mean of the first i+2 states
  (Model/LightGT.py:156-209);
- per-sample token sequences: slot 0 is the user (id-tower means for the
  src streams, the trainable ``user_exp`` row for the input stream),
  slots 1..src_len are a random subset of the user's interacted items
  (src_len=50 train / 20 eval, padded with item 0 + key-padding mask,
  dataload.py:88-97,137-145). The reference reshuffles the eval subset
  every epoch via its DataLoader; here the eval subset is drawn once at
  construction (documented deviation — fixed random 20-subset);
- encoder stack (deepcopied => all layers share one init): single-head
  attention with separate q/k/v Linears, the reference's ``(q*d^-0.5)/100``
  scaling quirk, q=k=output+src[i] while value=output only, attention-
  weight dropout 0.1 (training only), out_proj then LayerNorm — no
  residual/FFN (they are commented out in the reference)
  (Model/LightGT.py:17-131);
- modal heads: v/t features row-normalized once at init, projected by
  ``*_linear``; src streams are sigmoid(*_mlp(detached id-tower means));
  slot-0 output through ``*_dense`` + leaky_relu (Model/LightGT.py:305-334);
- loss (Model/LightGT.py:337-369): score = 0.05 * id-score + 0.95 * modal
  score, plain -mean(log(sigmoid(pos - neg))) with NO epsilon (reference
  has none here), reg = reg_weight * mean over the FULL propagated tables;
- eval (Model/LightGT.py:371-410): full-catalog 0.05/0.95 mixed scores,
  history masked to **1e-5** (not the usual 1e-6 — reference quirk).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import l2norm, masked_mean
from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def _draw_eval_subsets(hist, rng, num_item: int, sl: int):
    """Random sl-subset of each user's padded history, device-side.

    Vectorizes the reference EvalDataset draw (dataload.py:124-145):
    shuffle the history, truncate/pad to ``sl``, prepend the user slot.
    Padded positions carry item 0 and mask True — the reference pads
    with ``num_user`` then subtracts the offset, landing on index 0 too.
    """
    n_user, H = hist.shape
    valid = hist < num_item
    pri = jnp.where(valid, jax.random.uniform(rng, (n_user, H)), jnp.inf)
    idx = jnp.argsort(pri, axis=1)[:, :min(sl, H)]
    items = jnp.take_along_axis(hist, idx, axis=1)
    ok = jnp.take_along_axis(valid, idx, axis=1)
    if H < sl:  # histories shorter than the eval window: pad out
        pad = sl - H
        items = jnp.pad(items, ((0, 0), (0, pad)))
        ok = jnp.pad(ok, ((0, 0), (0, pad)))
    ev_items = jnp.concatenate(
        [jnp.zeros((n_user, 1), jnp.int32),
         jnp.where(ok, items, 0).astype(jnp.int32)], axis=1)
    ev_mask = jnp.concatenate(
        [jnp.zeros((n_user, 1), bool), ~ok], axis=1)
    return ev_items, ev_mask


class LightGT(RecModel):
    name = "LightGT"
    rank_mode = "scores"
    mask_value = 1e-5  # Model/LightGT.py:396 (quirk: 1e-5, not 1e-6)
    score_weight1 = 0.05  # Model/LightGT.py:224
    train_src_len = 50
    eval_src_len = 20
    attn_dropout = 0.1

    def __init__(self, num_user, num_item, graph: BipartiteGraph,
                 history_values, v_feat, t_feat, dim_E, reg_weight,
                 n_layers, seed: int = 0):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.v_feat = l2norm(v_feat)  # F.normalize at init
        self.t_feat = l2norm(t_feat)
        self.hist = history_values  # (U, H) item ids, fill = num_item
        # ----- eval sequences: random 20-subset per user, REDRAWN on
        # every eval pass like the reference's EvalDataset __getitem__
        # reshuffle (dataload.py:124-145); deterministic stream keyed on
        # (seed, draw counter). The trainer calls resample_eval() before
        # each ranking pass (train/loop.py evaluate_async).
        self._eval_seed = seed
        # 0-d array, NOT a python int: ints land in the pytree's static
        # aux_data (base.py flatten), so bumping one per eval pass would
        # change the treedef and retrace/recompile the jitted scoring
        # program every evaluation (one executable per epoch).
        self._eval_draws = np.zeros((), np.int32)
        self.resample_eval()

    def resample_eval(self) -> None:
        """Draw fresh per-user eval subsequences (device-side)."""
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self._eval_seed), int(self._eval_draws))
        self._eval_draws = np.asarray(int(self._eval_draws) + 1, np.int32)
        self.eval_items, self.eval_mask = _draw_eval_subsets(
            jnp.asarray(self.hist), rng, self.num_item, self.eval_src_len)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        e = self.dim_E
        ks = jax.random.split(rng, 16)
        p = {
            "u_emb": xavier_normal(ks[0], (self.num_user, e)),
            "i_emb": xavier_normal(ks[1], (self.num_item, e)),
            "user_exp": xavier_normal(ks[2], (self.num_user, e)),
        }
        for j, (pre, feat) in enumerate((("v", self.v_feat),
                                         ("t", self.t_feat))):
            o = 3 + 6 * j
            p[f"{pre}_mlp_w"], p[f"{pre}_mlp_b"] = torch_linear_init(
                ks[o], e, e)
            p[f"{pre}_lin_w"], p[f"{pre}_lin_b"] = torch_linear_init(
                ks[o + 1], e, feat.shape[1])
            p[f"{pre}_dense_w"], p[f"{pre}_dense_b"] = torch_linear_init(
                ks[o + 2], e, e)
            # one encoder-layer init deepcopied across layers (reference
            # TransformerEncoder, Model/LightGT.py:139-140)
            qw, qb = torch_linear_init(ks[o + 3], e, e)
            kw, kb = torch_linear_init(ks[o + 4], e, e)
            vw, vb = torch_linear_init(ks[o + 5], e, e)
            ow, ob = torch_linear_init(
                jax.random.fold_in(ks[o + 5], 1), e, e)
            for l in range(self.n_layers):
                # jnp.copy: distinct buffers per layer (donation-safe)
                p[f"{pre}_q_w{l}"], p[f"{pre}_q_b{l}"] = (jnp.copy(qw),
                                                          jnp.copy(qb))
                p[f"{pre}_k_w{l}"], p[f"{pre}_k_b{l}"] = (jnp.copy(kw),
                                                          jnp.copy(kb))
                p[f"{pre}_v_w{l}"], p[f"{pre}_v_b{l}"] = (jnp.copy(vw),
                                                          jnp.copy(vb))
                p[f"{pre}_o_w{l}"], p[f"{pre}_o_b{l}"] = (jnp.copy(ow),
                                                          jnp.copy(ob))
                p[f"{pre}_ln_w{l}"] = jnp.ones((e,))
                p[f"{pre}_ln_b{l}"] = jnp.zeros((e,))
        return p

    # ------------------------------------------------------------------
    def _lightgcn(self, params: Params):
        """Model/LightGT.py:176-209: prefix means per transformer layer."""
        e_u, e_i = params["u_emb"], params["i_emb"]
        us, its = [e_u], [e_i]
        for _ in range(self.n_layers):
            e_u, e_i = self.graph.propagate(e_u, e_i)
            us.append(e_u)
            its.append(e_i)
        user_emb = sum(us) / len(us)
        item_emb = sum(its) / len(its)
        users_mean = [sum(us[:i + 2]) / (i + 2) for i in range(self.n_layers)]
        items_mean = [sum(its[:i + 2]) / (i + 2) for i in range(self.n_layers)]
        return user_emb, item_emb, users_mean, items_mean

    def _encoder(self, params: Params, pre: str, x_in, src, mask, rng=None):
        """src/key = output + src[l]; value = output; LayerNorm, no
        residual (Model/LightGT.py:17-151)."""
        scale = float(self.dim_E) ** -0.5 / 100.0  # the /100 quirk
        out = x_in
        neg = jnp.finfo(jnp.float32).min
        for l in range(self.n_layers):
            qk = out + src[l]
            q = (qk @ params[f"{pre}_q_w{l}"].T + params[f"{pre}_q_b{l}"])
            k = qk @ params[f"{pre}_k_w{l}"].T + params[f"{pre}_k_b{l}"]
            v = out @ params[f"{pre}_v_w{l}"].T + params[f"{pre}_v_b{l}"]
            scores = jnp.einsum("bqe,bke->bqk", q * scale, k)
            scores = jnp.where(mask[:, None, :], neg, scores)
            attn = jax.nn.softmax(scores, axis=-1)
            if rng is not None:
                keep = 1.0 - self.attn_dropout
                attn = attn * jax.random.bernoulli(
                    jax.random.fold_in(rng, l), keep, attn.shape) / keep
            a = jnp.einsum("bqk,bke->bqe", attn, v)
            a = a @ params[f"{pre}_o_w{l}"].T + params[f"{pre}_o_b{l}"]
            mean = jnp.mean(a, axis=-1, keepdims=True)
            var = jnp.var(a, axis=-1, keepdims=True)
            out = (a - mean) * jax.lax.rsqrt(var + 1e-5)
            out = out * params[f"{pre}_ln_w{l}"] + params[f"{pre}_ln_b{l}"]
        return out

    def _forward(self, params: Params, users, user_item, mask, rng=None):
        """Model/LightGT.py:305-334."""
        user_emb, item_emb, users_mean, items_mean = self._lightgcn(params)

        srcs = {"v": [], "t": []}
        for i in range(self.n_layers):
            temp = jax.lax.stop_gradient(items_mean[i])[user_item]
            u_slot = jax.lax.stop_gradient(users_mean[i])[users]
            temp = temp.at[:, 0].set(u_slot)
            for pre in ("v", "t"):
                srcs[pre].append(jax.nn.sigmoid(
                    temp @ params[f"{pre}_mlp_w"].T + params[f"{pre}_mlp_b"]
                ))

        outs = {}
        feats = {}
        for pre, feat in (("v", self.v_feat), ("t", self.t_feat)):
            proj = feat @ params[f"{pre}_lin_w"].T + params[f"{pre}_lin_b"]
            feats[pre] = proj
            x_in = proj[user_item].at[:, 0].set(params["user_exp"][users])
            enc = self._encoder(
                params, pre, x_in, srcs[pre], mask,
                jax.random.fold_in(rng, 0 if pre == "v" else 1)
                if rng is not None else None,
            )[:, 0]
            outs[pre] = jax.nn.leaky_relu(
                enc @ params[f"{pre}_dense_w"].T + params[f"{pre}_dense_b"],
                negative_slope=0.01,
            )
        return user_emb, item_emb, feats["v"], feats["t"], outs["v"], outs["t"]

    # ------------------------------------------------------------------
    def _train_sequences(self, users, rng):
        """Random src_len-subset of each user's history (dataload.py:88-97)."""
        rows = self.hist[users]  # (B, H), fill = num_item
        b, h = rows.shape
        valid = rows < self.num_item
        scores = jnp.where(valid, jax.random.uniform(rng, (b, h)), -1.0)
        sl = self.train_src_len
        if h > sl:
            vals, idx = jax.lax.top_k(scores, sl)
            items = jnp.take_along_axis(rows, idx, axis=1)
            sel = vals >= 0.0
        else:
            items, sel = rows, valid
            pad = sl - h
            if pad:
                items = jnp.pad(items, ((0, 0), (0, pad)))
                sel = jnp.pad(sel, ((0, 0), (0, pad)))
        items = jnp.where(sel, items, 0)
        user_item = jnp.concatenate(
            [jnp.zeros((b, 1), items.dtype), items], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((b, 1), bool), ~sel], axis=1)
        return user_item, mask

    def loss(self, params: Params, batch: Batch, rng: jax.Array):
        k_seq, k_drop = jax.random.split(rng)
        user_item, mask = self._train_sequences(batch.users, k_seq)
        user_emb, item_emb, v, t, v_out, t_out = self._forward(
            params, batch.users, user_item, mask, k_drop
        )
        s1_pos = jnp.sum(user_emb[batch.users] * item_emb[batch.pos_items], 1)
        s1_neg = jnp.sum(user_emb[batch.users] * item_emb[batch.neg_items], 1)
        s2_pos = (jnp.sum(v_out * v[batch.pos_items], 1)
                  + jnp.sum(t_out * t[batch.pos_items], 1))
        s2_neg = (jnp.sum(v_out * v[batch.neg_items], 1)
                  + jnp.sum(t_out * t[batch.neg_items], 1))
        w1, w2 = self.score_weight1, 1.0 - self.score_weight1
        pos = w1 * s1_pos + w2 * s2_pos
        neg = w1 * s1_neg + w2 * s2_neg
        # no epsilon inside the log here (Model/LightGT.py:357)
        loss = -masked_mean(jnp.log(jax.nn.sigmoid(pos - neg)), batch.weights)
        reg = self.reg_weight * (jnp.mean(user_emb ** 2)
                                 + jnp.mean(item_emb ** 2))
        return loss + reg

    def score_users(self, params: Params, user_ids: jnp.ndarray):
        user_item = self.eval_items[user_ids]
        mask = self.eval_mask[user_ids]
        user_emb, item_emb, v, t, v_out, t_out = self._forward(
            params, user_ids, user_item, mask
        )
        s1 = user_emb[user_ids] @ item_emb.T
        s2 = v_out @ v.T + t_out @ t.T
        return self.score_weight1 * s1 + (1.0 - self.score_weight1) * s2
