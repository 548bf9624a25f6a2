"""CF-Diff: collaborative diffusion with cross-attention hop fusion.

Reference: Model/CF_Diff.py + train/eval paths
(train_and_evaluate.py:316-331, 614-646; loaders main.py:213-218).
Capabilities reproduced:

- CAM_AE denoiser (Model/CF_Diff.py:16-147): one-hop row and a two-hop
  conditioning row both pass through the *same* ``encoder`` Linear(I->1024)
  (``encoder2`` exists but is never used — reference quirk, as are the
  unused ``in_layers``/``out_layers`` and the ``dims`` hyperparameter);
  each encoded row concat time-emb(10) becomes a 1034-token sequence of
  scalar tokens lifted to d_model=16; num_layers=2 rounds of 4-head cross
  attention (query = two-hop tokens, key/value = one-hop tokens; the query
  is NOT updated between rounds) with residual into the one-hop stream,
  dropouts 0.5 (encoded x), 0.5 (attention weights), 0.8 (attention
  output), 0.5 (post-residual); per-round Linear(16->16) with tanh between
  rounds; decode tokens back to scalars, tanh, Linear(1034->I).
  All Linears keep torch-default init (CAM_AE has no init_weights);
  attention in_proj is xavier_uniform with zero bias, out_proj bias zero
  (torch nn.MultiheadAttention._reset_parameters);
- two-hop rows (dataload.py:215-263): global item popularity
  ``colsum(X)/num_user`` masked to each user's interacted items;
- diffusion identical to DiffRec: x0 mean-type, SNR reweight, importance
  timestep sampling with Lt history, beta[0]=1e-5 (Model/CF_Diff.py:354),
  deterministic p_sample with sampling_steps=0 (ops/diffusion.py);
- training: AdamW(lr, wd=0) over CAM_AE params on shuffled dense user rows
  (train_and_evaluate.py:316-331). DOCUMENTED DEVIATION: the reference
  zips two *independently shuffled* loaders, pairing each one-hop row with
  a random user's two-hop row during training (eval pairs them aligned);
  here training rows are aligned too — the intended CF-Diff semantics;
- eval: p_sample scores, history masked to **-inf**, top-50
  (train_and_evaluate.py:627-646).

TPU note: attention materializes (micro, heads, 1034, 1034) scores; the
forward runs in rematerialized micro-batches of 64 rows under a
``lax.scan`` so peak HBM stays ~1GB regardless of batch size.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops import diffusion as diff
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.pallas_attn import fused_mha, use_fused_attn


class CF_Diff(RecModel):
    name = "CF_Diff"
    rank_mode = "scores"
    stateful = True
    trainer_mode = "user_rows"
    mask_value = -jnp.inf
    emb_size = 10  # Model/CF_Diff.py:362
    d_model = 16  # Model/CF_Diff.py:364
    num_heads = 4
    cam_layers = 2
    dim_inters = 1024  # Model/CF_Diff.py:41
    micro = 64  # TPU micro-batch for the 1034^2 attention

    def __init__(self, num_user, num_item, dense_interactions, noise_scale,
                 noise_min, noise_max, steps):
        super().__init__(num_user, num_item)
        self.x = dense_interactions
        pop = jnp.sum(dense_interactions, axis=0) / num_user
        # two-hop info: popularity masked to interacted items
        # (dataload.py:238-254; rows are binary so mask == multiply)
        self.sec = dense_interactions * pop[None, :]
        self.sched = diff.make_schedule(noise_scale, noise_min, noise_max,
                                        steps)
        self.steps = steps
        self.seq_len = self.dim_inters + self.emb_size  # 1034 tokens

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 12 + 4 * self.cam_layers)
        p = {}
        p["emb_w"], p["emb_b"] = torch_linear_init(ks[0], self.emb_size,
                                                   self.emb_size)
        p["enc_w"], p["enc_b"] = torch_linear_init(ks[1], self.dim_inters,
                                                   self.num_item)
        p["fh_w"], p["fh_b"] = torch_linear_init(ks[2], self.d_model, 1)
        p["sh_w"], p["sh_b"] = torch_linear_init(ks[3], self.d_model, 1)
        p["fhd_w"], p["fhd_b"] = torch_linear_init(ks[4], 1, self.d_model)
        p["dec_w"], p["dec_b"] = torch_linear_init(ks[5], self.num_item,
                                                   self.seq_len)
        for i in range(self.cam_layers):
            o = 6 + 4 * i
            p[f"fwd_w{i}"], p[f"fwd_b{i}"] = torch_linear_init(
                ks[o], self.d_model, self.d_model
            )
            p[f"attn_in_w{i}"] = xavier_uniform(
                ks[o + 1], (3 * self.d_model, self.d_model)
            )
            p[f"attn_in_b{i}"] = jnp.zeros((3 * self.d_model,))
            p[f"attn_out_w{i}"], _ = torch_linear_init(
                ks[o + 2], self.d_model, self.d_model
            )
            p[f"attn_out_b{i}"] = jnp.zeros((self.d_model,))
        return p

    def init_state(self, rng: jax.Array):
        return diff.init_lt_state(self.steps)

    # ------------------------------------------------------------------
    def _attention(self, p: Params, i: int, query, kv, rng=None):
        """torch MultiheadAttention(d=16, heads=4, dropout=0.5,
        batch_first) with packed in_proj."""
        e, h = self.d_model, self.num_heads
        dh = e // h
        w = p[f"attn_in_w{i}"]
        b = p[f"attn_in_b{i}"]
        q = query @ w[:e].T + b[:e]
        k = kv @ w[e:2 * e].T + b[e:2 * e]
        v = kv @ w[2 * e:].T + b[2 * e:]

        def heads(t):  # (B, L, E) -> (B, h, L, dh)
            bsz, ln, _ = t.shape
            return t.reshape(bsz, ln, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if use_fused_attn():
            # Fused VMEM kernel (ops/pallas_attn.py): never materializes
            # the (B, h, 1034, 1034) score/softmax/mask tensors in HBM;
            # attention-weight dropout bits come from the in-kernel
            # hardware PRNG (mask distribution identical, stream differs
            # from jax.random — same torch-vs-jax caveat as everywhere).
            if rng is not None:
                seed = jax.random.bits(rng, (1,)).astype(jnp.int32)
                out = fused_mha(q, k, v, seed, 0.5)
            else:
                out = fused_mha(q, k, v, jnp.zeros((1,), jnp.int32), 1.0)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
            attn = jax.nn.softmax(scores, axis=-1)
            if rng is not None:
                attn = attn * jax.random.bernoulli(rng, 0.5,
                                                   attn.shape) / 0.5
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape)
        return out @ p[f"attn_out_w{i}"].T + p[f"attn_out_b{i}"]

    def _cam_core(self, p: Params, x, sec, ts, rng=None):
        """CAM_AE.forward on one micro-batch (Model/CF_Diff.py:77-135).

        Dropout keys are converted to the ``rbg`` PRNG: the attention-weight
        masks are (micro, 4, 1034, 1034) — counter-based threefry bits
        dominate the step cost, while RngBitGenerator maps to the hardware
        PRNG on TPU. Mask quality requirements for dropout are trivial.
        """
        h1 = x @ p["enc_w"].T + p["enc_b"]
        h2 = sec @ p["enc_w"].T + p["enc_b"]  # same encoder (quirk)
        emb = diff.timestep_embedding(ts, self.emb_size)
        emb = emb @ p["emb_w"].T + p["emb_b"]
        if rng is not None:
            data = (jax.random.key_data(rng)
                    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng)
            rng = jax.random.wrap_key_data(jnp.tile(data, 2)[:4], impl="rbg")
        keys = (jax.random.split(rng, 1 + 3 * self.cam_layers)
                if rng is not None else None)
        if rng is not None:
            h1 = h1 * jax.random.bernoulli(keys[0], 0.5, h1.shape) / 0.5
        # scalar tokens lifted to d_model
        h = jnp.concatenate([h1, emb], axis=-1)[..., None]
        h = h * p["fh_w"][None, None, :, 0] + p["fh_b"]
        hs = jnp.concatenate([h2, emb], axis=-1)[..., None]
        hs = hs * p["sh_w"][None, None, :, 0] + p["sh_b"]
        for i in range(self.cam_layers):
            k_a = keys[1 + 3 * i] if rng is not None else None
            attn = self._attention(p, i, hs, h, k_a)
            if rng is not None:
                attn = attn * jax.random.bernoulli(
                    keys[2 + 3 * i], 0.2, attn.shape) / 0.2  # drop1 p=0.8
            h = h + attn
            if rng is not None:
                h = h * jax.random.bernoulli(keys[3 + 3 * i], 0.5,
                                             h.shape) / 0.5
            h = h @ p[f"fwd_w{i}"].T + p[f"fwd_b{i}"]
            if i != self.cam_layers - 1:
                h = jnp.tanh(h)
        h = (h @ p["fhd_w"].T + p["fhd_b"])[..., 0]  # (B, 1034)
        h = jnp.tanh(h)
        return h @ p["dec_w"].T + p["dec_b"]

    def _cam(self, p: Params, x, sec, ts, rng=None):
        """Micro-batched, rematerialized CAM_AE over arbitrary batch."""
        b = x.shape[0]
        m = min(self.micro, b)
        n = -(-b // m)
        pad = n * m - b

        def pad_to(t):
            return jnp.concatenate([t, jnp.zeros((pad,) + t.shape[1:],
                                                 t.dtype)]) if pad else t

        xr = pad_to(x).reshape(n, m, -1)
        sr = pad_to(sec).reshape(n, m, -1)
        tr = pad_to(ts).reshape(n, m)
        if rng is not None:
            kr = jax.random.split(rng, n)
            core = jax.checkpoint(
                lambda xc, sc, tc, kc: self._cam_core(p, xc, sc, tc, kc)
            )
            _, outs = jax.lax.scan(
                lambda c, inp: (c, core(*inp)), None, (xr, sr, tr, kr)
            )
        else:
            core = jax.checkpoint(
                lambda xc, sc, tc: self._cam_core(p, xc, sc, tc)
            )
            _, outs = jax.lax.scan(
                lambda c, inp: (c, core(*inp)), None, (xr, sr, tr)
            )
        return outs.reshape(n * m, -1)[:b]

    # ------------------------------------------------------------------
    def loss_stateful(self, params: Params, state, batch: Batch,
                      rng: jax.Array):
        rows = self.x[batch.users]
        sec = self.sec[batch.users]
        k_drop, k_diff = jax.random.split(rng)
        loss, new_state, _ = diff.training_loss(
            self.sched,
            lambda x_t, ts: self._cam(params, x_t, sec, ts, k_drop),
            k_diff, rows, state, batch.weights,
        )
        return loss, new_state

    def score_users(self, params: Params, user_ids: jnp.ndarray):
        rows = self.x[user_ids]
        sec = self.sec[user_ids]
        return diff.p_sample(
            self.sched, lambda x_t, ts: self._cam(params, x_t, sec, ts), rows
        )
