"""Gaussian diffusion over interaction rows (DiffRec/DiffMM/CF_Diff/MHRec).

Pure-functional port of the reference's diffusion machinery
(Model/DiffRec.py:117-541, reused with modality conditioning by
Model/DiffMM.py and over hyperedge rows by Model/MHRec.py):

- linear beta schedule ``noise_scale * [noise_min..noise_max]`` with
  beta[0] fixed to 1e-5 (Model/DiffRec.py:148-151,204-212);
- q_sample forward noising, x0-parameterized denoiser, posterior-mean
  reverse steps (p_sample as a ``lax.scan``, deterministic when
  sampling_noise is off — the reference default);
- SNR-weighted x0 loss (weight = SNR(t-1) - SNR(t), 1 at t=0) with
  importance-sampled timesteps driven by a circular per-step loss history
  (Model/DiffRec.py:425-541). History updates here append one aggregated
  value per step per batch instead of one per sample (vectorized circular
  buffer; documented deviation — fills more slowly, same stationary
  distribution).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HISTORY_PER_TERM = 10  # Model/DiffRec.py:143


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DiffusionSchedule:
    steps: int
    noise_scale: float
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray

    def tree_flatten(self):
        leaves = (self.betas, self.alphas_cumprod, self.alphas_cumprod_prev,
                  self.sqrt_alphas_cumprod, self.sqrt_one_minus_alphas_cumprod,
                  self.posterior_mean_coef1, self.posterior_mean_coef2,
                  self.posterior_log_variance_clipped)
        return leaves, (self.steps, self.noise_scale)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], *leaves)


def make_schedule(noise_scale: float, noise_min: float, noise_max: float,
                  steps: int, beta_fixed: bool = True,
                  beta_fixed_value: float = 1e-5) -> DiffusionSchedule:
    """``beta_fixed_value``: 1e-5 for DiffRec (Model/DiffRec.py:150) but
    1e-4 for DiffMM (Model/DiffMM.py:495)."""
    start = noise_scale * noise_min
    end = noise_scale * noise_max
    betas = np.linspace(start, end, steps, dtype=np.float64)
    if beta_fixed:
        betas[0] = beta_fixed_value
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    plvc = np.log(np.concatenate([[posterior_variance[1]],
                                  posterior_variance[1:]]))
    return DiffusionSchedule(
        steps=steps,
        noise_scale=noise_scale,
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        alphas_cumprod_prev=jnp.asarray(acp_prev, jnp.float32),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(acp), jnp.float32),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1 - acp), jnp.float32),
        posterior_mean_coef1=jnp.asarray(
            betas * np.sqrt(acp_prev) / (1.0 - acp), jnp.float32),
        posterior_mean_coef2=jnp.asarray(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp), jnp.float32),
        posterior_log_variance_clipped=jnp.asarray(plvc, jnp.float32),
    )


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    return (
        sched.sqrt_alphas_cumprod[t][:, None] * x_start
        + sched.sqrt_one_minus_alphas_cumprod[t][:, None] * noise
    )


def snr(sched: DiffusionSchedule, t):
    acp = sched.alphas_cumprod[t]
    return acp / (1.0 - acp)


def sample_timesteps(rng, state, batch_size: int, steps: int,
                     uniform_prob: float = 0.001):
    """Importance sampling once every step has a full loss history;
    uniform otherwise (Model/DiffRec.py:507-541). Returns (ts, pt)."""
    lt_hist, lt_count = state
    ready = jnp.all(lt_count >= HISTORY_PER_TERM)
    lt_sqrt = jnp.sqrt(jnp.mean(lt_hist ** 2, axis=1))
    pt_all = lt_sqrt / jnp.maximum(jnp.sum(lt_sqrt), 1e-12)
    pt_all = pt_all * (1.0 - uniform_prob) + uniform_prob / steps
    uniform = jnp.full((steps,), 1.0 / steps)
    probs = jnp.where(ready, pt_all, uniform)
    ts = jax.random.choice(rng, steps, (batch_size,), p=probs)
    pt = jnp.where(ready, probs[ts] * steps, jnp.ones((batch_size,)))
    return ts, pt


def update_lt_history(state, ts, reloss, weights):
    """Push one aggregated loss per sampled step into the circular buffer."""
    lt_hist, lt_count = state
    steps = lt_hist.shape[0]
    w = weights
    sums = jax.ops.segment_sum(reloss * w, ts, num_segments=steps)
    cnts = jax.ops.segment_sum(w, ts, num_segments=steps)
    present = cnts > 0
    mean_loss = sums / jnp.maximum(cnts, 1.0)
    # circular append for present steps
    shifted = jnp.concatenate([lt_hist[:, 1:], mean_loss[:, None]], axis=1)
    appended = lt_hist.at[
        jnp.arange(steps), jnp.minimum(lt_count, HISTORY_PER_TERM - 1)
    ].set(mean_loss)
    full = lt_count >= HISTORY_PER_TERM
    new_hist = jnp.where(
        present[:, None], jnp.where(full[:, None], shifted, appended), lt_hist
    )
    new_count = jnp.where(present, jnp.minimum(lt_count + 1, HISTORY_PER_TERM),
                          lt_count)
    return new_hist, new_count


def training_loss(sched: DiffusionSchedule, denoise_fn: Callable, rng,
                  x_start, state, weights, reweight: bool = True):
    """SNR-weighted x0 loss; returns (mean_loss, new_state, aux).

    ``denoise_fn(x_t, ts) -> x0_hat``. weights mask padded batch rows.
    """
    k_t, k_n = jax.random.split(rng)
    b = x_start.shape[0]
    ts, pt = sample_timesteps(k_t, state, b, sched.steps)
    noise = jax.random.normal(k_n, x_start.shape)
    x_t = q_sample(sched, x_start, ts, noise) if sched.noise_scale != 0.0 else x_start
    out = denoise_fn(x_t, ts)
    mse = jnp.mean((x_start - out) ** 2, axis=1)
    if reweight and sched.noise_scale != 0.0:
        weight = snr(sched, ts - 1) - snr(sched, ts)
        weight = jnp.where(ts == 0, 1.0, weight)
    else:
        weight = jnp.ones_like(mse)
    reloss = weight * mse
    new_state = update_lt_history(state, ts, jax.lax.stop_gradient(reloss),
                                  weights)
    loss = jnp.sum((reloss / pt) * weights) / jnp.maximum(jnp.sum(weights), 1.0)
    return loss, new_state, (x_t, ts, out)


def p_sample(sched: DiffusionSchedule, denoise_fn: Callable, x_start,
             sampling_steps: int = 0, rng=None):
    """Deterministic reverse process (sampling_noise=False default).

    With ``sampling_steps > 0`` the chain starts from q_sample at
    t=sampling_steps-1; the torch reference draws fresh Gaussian noise
    there (MHRec's sampling_steps=5) — pass ``rng`` to match; without it
    the init is noise-free. The reverse loop always runs the FULL
    schedule (Model/DiffMM.py:560-577)."""
    x_t = x_start
    if sampling_steps > 0:
        t0 = jnp.full((x_start.shape[0],), sampling_steps - 1, jnp.int32)
        noise = (jax.random.normal(rng, x_start.shape) if rng is not None
                 else jnp.zeros_like(x_start))
        x_t = q_sample(sched, x_start, t0, noise)

    def body(x_t, i):
        t = jnp.full((x_t.shape[0],), i, jnp.int32)
        x0_hat = denoise_fn(x_t, t)
        mean = (
            sched.posterior_mean_coef1[t][:, None] * x0_hat
            + sched.posterior_mean_coef2[t][:, None] * x_t
        )
        return mean, None

    x_t, _ = jax.lax.scan(body, x_t, jnp.arange(sched.steps - 1, -1, -1))
    return x_t


def init_lt_state(steps: int):
    return (jnp.zeros((steps, HISTORY_PER_TERM), jnp.float32),
            jnp.zeros((steps,), jnp.int32))


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal time embedding (Model/DiffRec.py:85-101)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
