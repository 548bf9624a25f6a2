"""DualVAE: dual user/item VAEs with cross-decoding and aspect contrast.

Reference: Model/DualVAE.py. Capabilities reproduced:
- a = 5 aspects, k = 25 latent dims, tanh encoders [I->20]/[U->20] with
  sigmoid std heads, tanh decoders [25->20], Poisson likelihood
  (Model/DualVAE.py:37-41,50-111);
- aspect gates: item-side softmax(<beta, item_topics>), user-side
  softmax(<theta, user_preferences>) weight the dense input rows per
  aspect (Model/DualVAE.py:179-258);
- cross-decoding: sigmoid(theta beta^T + tanh(dec(theta) dec(beta)^T)),
  aspect-weighted and accumulated; KL per aspect averaged; aspect-wise
  contrastive loss between latents and their decoded neighborhoods with
  both aspect-level and node-level negatives (Model/DualVAE.py:152-177);
- **cross-batch latent caches**: theta/beta/mu tables are scatter-updated
  with each batch's latents and drive the other side's aspect gates and
  the final ranking (Model/DualVAE.py:56-67,288-301) -> stateful protocol;
- ranking: aspect-weighted decode of the cached mu tables with 1e-6
  masking (Model/DualVAE.py:305-337).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init
from chaorec_tpu.ops.losses import l2norm, masked_mean

EPS = 1e-10


class DualVAE(RecModel):
    name = "DualVAE"
    rank_mode = "scores"
    stateful = True
    k = 25
    a = 5
    hidden = 20

    def __init__(self, num_user, num_item, dense_interactions, kl_weight,
                 ssl_reg):
        super().__init__(num_user, num_item)
        self.kl_weight = kl_weight
        self.ssl_reg = ssl_reg
        self.x = dense_interactions  # (U, I)
        self.xt = dense_interactions.T  # (I, U)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 12)
        p = {}
        # kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ..) with fan_in=k
        bound = 1.0 / math.sqrt(self.k)
        p["user_preferences"] = jax.random.uniform(
            ks[0], (self.a, self.k), minval=-bound, maxval=bound)
        p["item_topics"] = jax.random.uniform(
            ks[1], (self.a, self.k), minval=-bound, maxval=bound)
        for name, kk, (o, i) in [
            ("u_enc", ks[2], (self.hidden, self.num_item)),
            ("i_enc", ks[3], (self.hidden, self.num_user)),
            ("u_mu", ks[4], (self.k, self.hidden)),
            ("u_std", ks[5], (self.k, self.hidden)),
            ("i_mu", ks[6], (self.k, self.hidden)),
            ("i_std", ks[7], (self.k, self.hidden)),
            ("u_dec", ks[8], (self.hidden, self.k)),
            ("i_dec", ks[9], (self.hidden, self.k)),
        ]:
            w, b = torch_linear_init(kk, o, i)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        return p

    def init_state(self, rng: jax.Array):
        k1, k2 = jax.random.split(rng)
        return {
            "theta": 0.01 * jax.random.normal(k1, (self.num_user, self.a, self.k)),
            "beta": 0.01 * jax.random.normal(k2, (self.num_item, self.a, self.k)),
            "mu_theta": jnp.zeros((self.num_user, self.a, self.k)),
            "mu_beta": jnp.zeros((self.num_item, self.a, self.k)),
        }

    def _lin(self, params, name, x):
        return x @ params[f"{name}_w"].T + params[f"{name}_b"]

    def _decode(self, params, theta, beta):
        th = jnp.tanh(self._lin(params, "u_dec", theta))
        bh = jnp.tanh(self._lin(params, "i_dec", beta))
        h_hidden = jnp.tanh(th @ bh.T)
        return jax.nn.sigmoid(theta @ beta.T + h_hidden)

    def _contrast(self, z, nei, weights):
        z = l2norm(z)
        nei = l2norm(nei)
        pos = jnp.exp(jnp.sum(nei * z, -1) / 0.2)  # (B, a)
        acl = jnp.sum(jnp.exp(jnp.einsum("bak,bck->bac", nei, z) / 0.2), -1)
        ncl = jnp.sum(jnp.exp(jnp.einsum("bak,cak->bac", nei, z) / 0.2), -1)
        term = jnp.log(pos / (acl + ncl))
        return -masked_mean(jnp.sum(term, -1), weights)

    def _side(self, params, rows, other_latents, gate_proj, enc, mu_h, std_h,
              user_side, rng, weights):
        """One VAE side; returns (z (B,a,k), mu (B,a,k), loss)."""
        gate = jax.nn.softmax(
            jnp.sum(other_latents * gate_proj[None], -1), axis=1
        )  # (N_other, a)
        probs = 0.0
        kl = 0.0
        zs, mus, neis = [], [], []
        for a in range(self.a):
            ga = gate[:, a][None, :]  # (1, N_other)
            h = jnp.tanh(self._lin(params, enc, rows * ga))
            mu = self._lin(params, mu_h, h)
            std = jax.nn.sigmoid(self._lin(params, std_h, h))
            kl_a = -0.5 * (1 + 2 * jnp.log(std + EPS) - mu ** 2 - std ** 2)
            kl = kl + masked_mean(jnp.sum(kl_a, -1), weights)
            rng, k = jax.random.split(rng)
            z = mu + jax.random.normal(k, mu.shape) * std
            other_a = other_latents[:, a, :]
            if user_side:
                probs_a = self._decode(params, z, other_a) * ga
            else:
                probs_a = self._decode(params, other_a, z).T * ga
            probs = probs + probs_a
            zs.append(z)
            mus.append(mu)
            neis.append(probs_a @ other_a)
        z = jnp.stack(zs, 1)
        mu = jnp.stack(mus, 1)
        nei = jnp.stack(neis, 1)
        kl = kl / self.a
        cl = self._contrast(z, nei, weights)
        ll = masked_mean(
            jnp.sum(rows * jnp.log(probs + EPS) - probs, -1), weights
        )  # Poisson
        loss = self.kl_weight * kl - ll + self.ssl_reg * cl
        return z, mu, loss

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        k_i, k_u = jax.random.split(rng)
        w = batch.weights
        # item side first (reference order), gated by cached user prefs
        i_rows = self.xt[batch.pos_items]
        z_i, mu_i, item_loss = self._side(
            params, i_rows, state["theta"], params["user_preferences"],
            "i_enc", "i_mu", "i_std", user_side=False, rng=k_i, weights=w,
        )
        beta = state["beta"].at[batch.pos_items].set(jax.lax.stop_gradient(z_i))
        mu_beta = state["mu_beta"].at[batch.pos_items].set(
            jax.lax.stop_gradient(mu_i))
        u_rows = self.x[batch.users]
        z_u, mu_u, user_loss = self._side(
            params, u_rows, beta, params["item_topics"],
            "u_enc", "u_mu", "u_std", user_side=True, rng=k_u, weights=w,
        )
        theta = state["theta"].at[batch.users].set(jax.lax.stop_gradient(z_u))
        mu_theta = state["mu_theta"].at[batch.users].set(
            jax.lax.stop_gradient(mu_u))
        new_state = {"theta": theta, "beta": beta,
                     "mu_theta": mu_theta, "mu_beta": mu_beta}
        return item_loss + user_loss, new_state

    def score_users_stateful(self, params: Params, state, user_ids):
        theta = state["mu_theta"][user_ids]  # (C, a, k)
        beta = state["mu_beta"]  # (I, a, k)
        gate = jax.nn.softmax(
            jnp.sum(beta * params["item_topics"][None], -1), axis=1
        )  # (I, a)
        scores = 0.0
        for a in range(self.a):
            s = self._decode(params, theta[:, a, :], beta[:, a, :])
            scores = scores + s * gate[:, a][None, :]
        return scores

    def embeddings(self, params):
        raise NotImplementedError
