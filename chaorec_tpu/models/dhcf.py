"""DHCF: dual-channel hypergraph CF with jump connections.

Reference: Model/DHCF.py. Capabilities reproduced:
- hypergraph incidence with jumps: Hu = [H, H(H^T H)] for users,
  Hi = [H^T, (H(H^T H))^T] for items; per layer
  ``M x = D_v^-1/2 Hu D_e^-1 Hu^T D_v^-1/2 x + x`` applied as a chain of
  MXU matmuls (the reference materializes dense Hu and uses multi_dot,
  Model/DHCF.py:32-52 — here G = H (H^T H) is precomputed once and the
  operator is applied factored, never concatenated);
- per layer: elementwise dropout on the inputs, then DJconv
  ``M x @ W + b`` (Model/DHCF.py:54-69,115-127). **Reference quirk kept:**
  the DJconv layers live in a plain Python list, so their W/b never reach
  ``model.parameters()`` and are frozen at init (main.py:397 optimizer);
  W is xavier-uniform, and b — uninitialized memory in the reference — is
  zero here (documented deviation);
- output = concat of ego + all layer outputs per side; BPR(+1e-5) +
  mean-style reg on the concatenated embeddings (Model/DHCF.py:133-171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


class DHCF(RecModel):
    name = "DHCF"

    def __init__(self, num_user, num_item, dense_h: jnp.ndarray, dim_E,
                 reg_weight, n_layers, dropout, rng):
        super().__init__(num_user, num_item)
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.dropout = dropout
        h = dense_h.astype(jnp.float32)  # (U, I)
        hth = jnp.dot(h.T, h, preferred_element_type=jnp.float32)
        g = jnp.dot(h, hth, preferred_element_type=jnp.float32)  # (U, I)
        self.h = h
        self.g = g
        # user side: Hu = [H, G] (U x 2I)
        row_u = jnp.sum(h, axis=1) + jnp.sum(g, axis=1)
        col_u = jnp.concatenate([jnp.sum(h, axis=0), jnp.sum(g, axis=0)])
        self.dv_u = (row_u + 1e-7) ** -0.5
        self.de_u = 1.0 / (col_u + 1e-7)
        # item side: Hi = [H^T, G^T] (I x 2U)
        row_i = jnp.sum(h, axis=0) + jnp.sum(g, axis=0)
        col_i = jnp.concatenate([jnp.sum(h, axis=1), jnp.sum(g, axis=1)])
        self.dv_i = (row_i + 1e-7) ** -0.5
        self.de_i = 1.0 / (col_i + 1e-7)
        # frozen per-layer conv weights (reference quirk, see docstring)
        ks = jax.random.split(rng, n_layers)
        self.frozen_w = [xavier_uniform(k, (dim_E, dim_E)) for k in ks]

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def _m_user(self, x):
        xv = self.dv_u[:, None] * x
        y1 = jnp.dot(self.h.T, xv, preferred_element_type=jnp.float32)
        y2 = jnp.dot(self.g.T, xv, preferred_element_type=jnp.float32)
        z = jnp.dot(self.h, self.de_u[: self.num_item][:, None] * y1,
                    preferred_element_type=jnp.float32)
        z = z + jnp.dot(self.g, self.de_u[self.num_item:][:, None] * y2,
                        preferred_element_type=jnp.float32)
        return self.dv_u[:, None] * z + x

    def _m_item(self, x):
        xv = self.dv_i[:, None] * x
        y1 = jnp.dot(self.h, xv, preferred_element_type=jnp.float32)
        y2 = jnp.dot(self.g, xv, preferred_element_type=jnp.float32)
        z = jnp.dot(self.h.T, self.de_i[: self.num_user][:, None] * y1,
                    preferred_element_type=jnp.float32)
        z = z + jnp.dot(self.g.T, self.de_i[self.num_user:][:, None] * y2,
                        preferred_element_type=jnp.float32)
        return self.dv_i[:, None] * z + x

    def forward(self, params: Params, rng=None):
        u = params["user_embedding"]
        i = params["item_embedding"]
        out_u, out_i = [u], [i]
        cu, ci = u, i
        for l in range(self.n_layers):
            if rng is not None and self.dropout > 0:
                rng, ku, ki = jax.random.split(rng, 3)
                keep = 1.0 - self.dropout
                cu = cu * jax.random.bernoulli(ku, keep, cu.shape) / keep
                ci = ci * jax.random.bernoulli(ki, keep, ci.shape) / keep
            w = self.frozen_w[l]
            cu = jnp.dot(self._m_user(cu), w, preferred_element_type=jnp.float32)
            ci = jnp.dot(self._m_item(ci), w, preferred_element_type=jnp.float32)
            out_u.append(cu)
            out_i.append(ci)
        return jnp.concatenate(out_u, axis=1), jnp.concatenate(out_i, axis=1)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi = self.forward(params, rng)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        return bpr + reg

    def embeddings(self, params: Params):
        return self.forward(params)
