"""MultVAE: variational autoencoder with multinomial likelihood.

Reference: Model/MultVAE.py. Capabilities reproduced:
- single-layer encoder ``Linear(num_item -> 2*dim_E)`` (mu | logvar) over
  L2-normalized, dropout(0.5) user interaction rows; single-layer decoder
  ``Linear(dim_E -> num_item)`` (p_dims=[64, I], q reversed,
  Model/MultVAE.py:37-70); weights AND biases initialized U[0,1)
  (reference quirk, nn.init.uniform_, :53-69);
- loss = -mean(sum(log_softmax(logits) * x)) + anneal * KL + 2 * reg,
  where anneal = min(0.2, update_count / 200000) with a per-step counter
  (**stateful**), and reg carries the reference's double reg_weight
  multiplication: loss adds ``2 * reg_weight * (reg_weight * 0.5 *
  sum ||param||^2)`` (Model/MultVAE.py:130-160 — l2_regularization already
  multiplies by reg_weight, then loss multiplies again);
- ranking: decoder logits over the full dense interaction matrix, history
  masked to 1e-6 (Model/MultVAE.py:162-196). Deviation: inference uses the
  posterior mean z = mu (the reference samples eps even in eval mode; the
  deterministic mean is the published inference rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import uniform01_init
from chaorec_tpu.ops.losses import l2norm, masked_mean


class MultVAE(RecModel):
    name = "MultVAE"
    rank_mode = "scores"
    stateful = True
    keep_prob = 0.5
    total_anneal_steps = 200000
    anneal_cap = 0.2

    def __init__(self, num_user, num_item, dense_interactions: jnp.ndarray,
                 dim_E, reg_weight):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.x = dense_interactions  # (U, I) float32

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 4)
        return {
            "q_w": uniform01_init(ks[0], (2 * self.dim_E, self.num_item)),
            "q_b": uniform01_init(ks[1], (2 * self.dim_E,)),
            "p_w": uniform01_init(ks[2], (self.num_item, self.dim_E)),
            "p_b": uniform01_init(ks[3], (self.num_item,)),
        }

    def init_state(self, rng: jax.Array):
        return jnp.zeros((), jnp.float32)  # update_count

    def _encode(self, params, x, rng=None):
        h = l2norm(x)
        if rng is not None:
            h = h * jax.random.bernoulli(rng, self.keep_prob, h.shape) / self.keep_prob
        h = h @ params["q_w"].T + params["q_b"]
        mu, logvar = jnp.split(h, 2, axis=1)
        return mu, logvar

    def _decode(self, params, z):
        return z @ params["p_w"].T + params["p_b"]

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        k_drop, k_eps = jax.random.split(rng)
        x = self.x[batch.users]
        w = batch.weights
        mu, logvar = self._encode(params, x, k_drop)
        std = jnp.exp(0.5 * logvar)
        kl = masked_mean(
            jnp.sum(0.5 * (-logvar + jnp.exp(logvar) + mu ** 2 - 1.0), axis=1), w
        )
        z = mu + jax.random.normal(k_eps, std.shape) * std
        logits = self._decode(params, z)
        log_softmax = jax.nn.log_softmax(logits, axis=-1)
        neg_ll = -masked_mean(jnp.sum(log_softmax * x, axis=-1), w)
        anneal = jnp.minimum(
            self.anneal_cap, state / self.total_anneal_steps
        ) if self.total_anneal_steps > 0 else self.anneal_cap
        # double reg_weight quirk (see docstring)
        reg = self.reg_weight * (
            self.reg_weight * 0.5 * sum(jnp.sum(p ** 2) for p in params.values())
        )
        return neg_ll + anneal * kl + 2.0 * reg, state + 1.0

    def score_users(self, params: Params, user_ids: jnp.ndarray) -> jnp.ndarray:
        mu, _ = self._encode(params, self.x[user_ids])
        return self._decode(params, mu)
