"""MacridVAE: macro-disentangled VAE over concept prototypes.

Reference: Model/MacridVAE.py. Capabilities reproduced:
- kfac = 10 concept prototypes; item-concept assignment
  cates = gumbel_softmax((norm_items @ norm_cores^T)/tau, tau=1) in
  training, plain softmax at eval (Model/MacridVAE.py:77-95, tau=0.1,
  std=0.01, layers [600]);
- per concept: encoder MLP(num_item -> 600 -> 2*dim_E) on concept-gated,
  L2-normalized, dropout(0.5) rows; mu L2-normalized; z = mu + eps*std
  with eps ~ N(0, 0.01^2) scaled by exp(0.5 logvar) in training, z = mu at
  eval; decoder logits_k = (norm(z) @ norm_items^T)/tau, probs =
  sum_k exp(logits_k) * cates_k, output = log(probs)
  (Model/MacridVAE.py:96-129);
- loss = CE + anneal * KL where KL keeps the reference's formula
  ``-0.5 mean(sum(1 + logvar - exp(logvar)))`` (no mu^2 term —
  Model/MacridVAE.py:146-148 quirk), anneal counter stateful; regs [0,0]
  -> no reg term (Model/MacridVAE.py:33,153-156);
- score-mode ranking over the full dense matrix (Model/MacridVAE.py:168-193).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import l2norm, masked_mean


class MacridVAE(RecModel):
    name = "MacridVAE"
    rank_mode = "scores"
    stateful = True
    drop_out = 0.5
    kfac = 10
    hidden = 600
    tau = 0.1
    std = 0.01
    total_anneal_steps = 200000
    anneal_cap = 0.2

    def __init__(self, num_user, num_item, dense_interactions: jnp.ndarray,
                 dim_E, reg_weight):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.x = dense_interactions

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 4)
        w1, b1 = torch_linear_init(ks[0], self.hidden, self.num_item)
        w2, b2 = torch_linear_init(ks[1], 2 * self.dim_E, self.hidden)
        return {
            "enc_w1": w1, "enc_b1": b1, "enc_w2": w2, "enc_b2": b2,
            "item_embedding": xavier_normal(ks[2], (self.num_item, self.dim_E)),
            "k_embedding": xavier_normal(ks[3], (self.kfac, self.dim_E)),
        }

    def init_state(self, rng: jax.Array):
        return jnp.zeros((), jnp.float32)

    def _encoder(self, params, x):
        h = jnp.tanh(x @ params["enc_w1"].T + params["enc_b1"])
        return h @ params["enc_w2"].T + params["enc_b2"]

    def _forward(self, params, rows, rng=None):
        """Returns (logits, mus, logvars). rng=None -> eval mode."""
        cores = l2norm(params["k_embedding"])
        items = l2norm(params["item_embedding"])
        x = l2norm(rows)
        cates_logits = jnp.dot(items, cores.T,
                               preferred_element_type=jnp.float32) / self.tau
        if rng is not None:
            rng, k_drop, k_gumbel = jax.random.split(rng, 3)
            x = x * jax.random.bernoulli(k_drop, 1 - self.drop_out, x.shape) / (
                1 - self.drop_out
            )
            g = -jnp.log(-jnp.log(
                jax.random.uniform(k_gumbel, cates_logits.shape) + 1e-10) + 1e-10)
            cates = jax.nn.softmax(cates_logits + g, axis=-1)
        else:
            cates = jax.nn.softmax(cates_logits, axis=-1)

        probs = 0.0
        mus, logvars = [], []
        for k in range(self.kfac):
            cates_k = cates[:, k][None, :]  # (1, I)
            x_k = x * cates_k
            h = self._encoder(params, x_k)
            mu = l2norm(h[:, : self.dim_E])
            logvar = h[:, self.dim_E:]
            mus.append(mu)
            logvars.append(logvar)
            if rng is not None:
                rng, k_eps = jax.random.split(rng)
                std = jnp.exp(0.5 * logvar)
                z = mu + self.std * jax.random.normal(k_eps, std.shape) * std
            else:
                z = mu
            z_k = l2norm(z)
            logits_k = jnp.dot(z_k, items.T,
                               preferred_element_type=jnp.float32) / self.tau
            probs = probs + jnp.exp(logits_k) * cates_k
        return jnp.log(probs + 1e-12), mus, logvars

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        rows = self.x[batch.users]
        w = batch.weights
        logits, mus, logvars = self._forward(params, rows, rng)
        kl = 0.0
        for lv in logvars:
            # reference formula omits the mu^2 term (Model/MacridVAE.py:147)
            kl = kl + masked_mean(
                -0.5 * jnp.sum(1.0 + lv - jnp.exp(lv), axis=1), w
            )
        ce = -masked_mean(jnp.sum(jax.nn.log_softmax(logits, 1) * rows, axis=1), w)
        anneal = jnp.minimum(self.anneal_cap, state / self.total_anneal_steps)
        return ce + anneal * kl, state + 1.0

    def score_users(self, params: Params, user_ids: jnp.ndarray) -> jnp.ndarray:
        logits, _, _ = self._forward(params, self.x[user_ids])
        return logits
