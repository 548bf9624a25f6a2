"""LightGCL: SVD-augmented contrastive graph CF.

Reference: Model/LightGCL.py. Capabilities reproduced:
- normalized adjacency R/sqrt(du*di) (Model/LightGCL.py:75-95);
- rank-q SVD (q = 5) of the normalized R — randomized SVD on device
  (ops/svd.py replaces ``torch.svd_lowrank``, Model/LightGCL.py:43-49);
- forward: E-lists, layer k = plain propagation of layer k-1, final =
  SUM over layers 0..L (Model/LightGCL.py:129-153);
- SVD-view: G_u[k] = U S (V^T E_i[k-1]), G_i[k] = V S (U^T E_u[k-1]),
  summed over layers (Model/LightGCL.py:181-190);
- ssl: full-catalog ``log(sum exp(G b @ E^T / t))`` mean + clamped(+-5)
  positive mean, scaled by lambda_1 (Model/LightGCL.py:192-199; the raw
  exp-sum-log is computed here as logsumexp for fp32 stability —
  difference is the 1e-8 floor, negligible);
- BPR **without** epsilon and reg = lambda_2 * sum of squared L2 norms of
  ALL parameters (Model/LightGCL.py:155-176);
- ranking from the forward embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import masked_mean


class LightGCL(RecModel):
    name = "LightGCL"
    q = 5  # Model/LightGCL.py:29

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_alpha, ssl_temp, svd_u_s, svd_v_s,
                 svd_ut, svd_vt):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.lambda_2 = reg_weight
        self.lambda_1 = ssl_alpha
        self.temp = ssl_temp
        self.n_layers = n_layers
        # u_mul_s (U, q), v_mul_s (I, q), ut (q, U), vt (q, I)
        self.u_mul_s = svd_u_s
        self.v_mul_s = svd_v_s
        self.ut = svd_ut
        self.vt = svd_vt

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def forward(self, params: Params):
        """Returns summed embeddings + per-layer lists."""
        xu, xi = params["user_embedding"], params["item_embedding"]
        layers_u, layers_i = [xu], [xi]
        for _ in range(self.n_layers):
            nu, ni = self.graph.propagate(layers_u[-1], layers_i[-1])
            layers_u.append(nu)
            layers_i.append(ni)
        return sum(layers_u), sum(layers_i), layers_u, layers_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        w = batch.weights
        e_u, e_i, layers_u, layers_i = self.forward(params)

        u = e_u[batch.users]
        pos = e_i[batch.pos_items]
        neg = e_i[batch.neg_items]
        pos_scores = jnp.sum(u * pos, axis=1)
        neg_scores = jnp.sum(u * neg, axis=1)
        # no epsilon (Model/LightGCL.py:169)
        bpr = -masked_mean(jnp.log(jax.nn.sigmoid(pos_scores - neg_scores)), w)
        reg = self.lambda_2 * sum(jnp.sum(p ** 2) for p in params.values())

        # SVD global view
        g_u = params["user_embedding"]
        g_i = params["item_embedding"]
        acc_gu, acc_gi = g_u, g_i
        for l in range(1, self.n_layers + 1):
            vt_ei = jnp.dot(self.vt, layers_i[l - 1], preferred_element_type=jnp.float32)
            gu = jnp.dot(self.u_mul_s, vt_ei, preferred_element_type=jnp.float32)
            ut_eu = jnp.dot(self.ut, layers_u[l - 1], preferred_element_type=jnp.float32)
            gi = jnp.dot(self.v_mul_s, ut_eu, preferred_element_type=jnp.float32)
            acc_gu = acc_gu + gu
            acc_gi = acc_gi + gi

        neg_score = masked_mean(
            jax.nn.logsumexp(
                jnp.dot(acc_gu[batch.users], e_u.T,
                        preferred_element_type=jnp.float32) / self.temp,
                axis=1,
            ),
            w,
        ) + masked_mean(
            jax.nn.logsumexp(
                jnp.dot(acc_gi[batch.pos_items], e_i.T,
                        preferred_element_type=jnp.float32) / self.temp,
                axis=1,
            ),
            w,
        )
        pos_score = masked_mean(
            jnp.clip(jnp.sum(acc_gu[batch.users] * u, axis=1) / self.temp, -5.0, 5.0), w
        ) + masked_mean(
            jnp.clip(jnp.sum(acc_gi[batch.pos_items] * pos, axis=1) / self.temp, -5.0, 5.0), w
        )
        ssl = self.lambda_1 * (neg_score - pos_score)
        return bpr + reg + ssl

    def embeddings(self, params: Params):
        e_u, e_i, _, _ = self.forward(params)
        return e_u, e_i
