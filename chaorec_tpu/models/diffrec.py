"""DiffRec: Gaussian diffusion recommender over dense interaction rows.

Reference: Model/DiffRec.py + train/eval paths
(train_and_evaluate.py:304-315, 578-613). Capabilities reproduced:
- denoiser DNN: sinusoidal time embedding (size 10) through a Linear,
  concatenated with the (dropout 0.5) row, MLP dims [I+10 -> 1000 -> I]
  per the default dims="[1000]" with tanh between layers, weights
  N(0, xavier-std), biases N(0, 0.001) (Model/DiffRec.py:16-115);
- x0-mean-type diffusion with importance-sampled timesteps backed by the
  circular per-step loss history (stateful), SNR reweighting, /pt
  (ops/diffusion.py);
- training iterates dense USER rows (not BPR triples) with AdamW(wd=0) on
  the denoiser only — realized by UserRowTrainer;
- eval: deterministic p_sample over all rows, history masked to **-inf**
  (unlike the 1e-6 used elsewhere; train_and_evaluate.py:598-608), top-50.
"""

from __future__ import annotations

import ast
import math

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops import diffusion as diff


class DiffRec(RecModel):
    name = "DiffRec"
    rank_mode = "scores"
    stateful = True
    trainer_mode = "user_rows"
    mask_value = -jnp.inf
    emb_size = 10
    dnn_dropout = 0.5

    def __init__(self, num_user, num_item, dense_interactions, noise_scale,
                 noise_min, noise_max, steps, dims,
                 sample_compute_dtype="bfloat16"):
        super().__init__(num_user, num_item)
        # eval-scoring p_sample precision: ranking is ordinal, and the
        # eval matmul path already scores in bf16 (eval/ranking
        # _rank_chunk); training_loss always stays fp32
        self.sample_dtype = (jnp.bfloat16
                             if sample_compute_dtype == "bfloat16" else None)
        self.x = dense_interactions
        self.sched = diff.make_schedule(noise_scale, noise_min, noise_max, steps)
        hidden = ast.literal_eval(dims) if isinstance(dims, str) else list(dims)
        self.out_dims = list(hidden) + [num_item]  # e.g. [1000, I]
        self.in_dims = self.out_dims[::-1]  # [I, 1000]
        self.steps = steps

    def init_params(self, rng: jax.Array) -> Params:
        def lin(key, d_out, d_in):
            k_w, k_b = jax.random.split(key)
            std = math.sqrt(2.0 / (d_in + d_out))
            return (std * jax.random.normal(k_w, (d_out, d_in)),
                    0.001 * jax.random.normal(k_b, (d_out,)))

        ks = jax.random.split(rng, 8)
        p = {}
        p["emb_w"], p["emb_b"] = lin(ks[0], self.emb_size, self.emb_size)
        in_dims = [self.in_dims[0] + self.emb_size] + self.in_dims[1:]
        for i, (d_in, d_out) in enumerate(zip(in_dims[:-1], in_dims[1:])):
            p[f"in_w{i}"], p[f"in_b{i}"] = lin(ks[1 + i], d_out, d_in)
        for i, (d_in, d_out) in enumerate(zip(self.out_dims[:-1], self.out_dims[1:])):
            p[f"out_w{i}"], p[f"out_b{i}"] = lin(ks[4 + i], d_out, d_in)
        return p

    def init_state(self, rng: jax.Array):
        return diff.init_lt_state(self.steps)

    def _dnn(self, params, x, ts, rng=None, compute_dtype=None):
        if compute_dtype is None:
            mm = lambda h, w: h @ w.T
        else:
            mm = lambda h, w: jnp.dot(
                h.astype(compute_dtype), w.astype(compute_dtype).T,
                preferred_element_type=jnp.float32)
        emb = diff.timestep_embedding(ts, self.emb_size)
        emb = emb @ params["emb_w"].T + params["emb_b"]
        if rng is not None:
            keep = 1.0 - self.dnn_dropout
            x = x * jax.random.bernoulli(rng, keep, x.shape) / keep
        h = jnp.concatenate([x, emb], axis=-1)
        n_in = len(self.in_dims) - 1
        for i in range(n_in):
            h = jnp.tanh(mm(h, params[f"in_w{i}"]) + params[f"in_b{i}"])
        n_out = len(self.out_dims) - 1
        for i in range(n_out):
            h = mm(h, params[f"out_w{i}"]) + params[f"out_b{i}"]
            if i != n_out - 1:
                h = jnp.tanh(h)
        return h

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        rows = self.x[batch.users]
        k_drop, k_diff = jax.random.split(rng)
        loss, new_state, _ = diff.training_loss(
            self.sched,
            lambda x_t, ts: self._dnn(params, x_t, ts, k_drop),
            k_diff, rows, state, batch.weights,
        )
        return loss, new_state

    def score_users(self, params: Params, user_ids: jnp.ndarray) -> jnp.ndarray:
        rows = self.x[user_ids]
        return diff.p_sample(
            self.sched,
            lambda x_t, ts: self._dnn(params, x_t, ts,
                                      compute_dtype=self.sample_dtype),
            rows,
        )
