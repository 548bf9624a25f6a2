"""FKAN_GCF: Fourier-KAN bi-interaction graph CF.

Reference: Model/FKAN_GCF.py + kanlayer.py. Capabilities reproduced:
- per layer: ``out = x + Ax + FourierKAN(Ax * x)`` on the (node-dropout)
  normalized adjacency, then LeakyReLU(0.2) -> dropout(message_dropout)
  -> row L2-normalize (Model/FKAN_GCF.py:30-41,157-171);
- **layer-count quirk kept**: GNN layers are built from
  ``zip(h[:-1], h[1:])`` of ``[dim_E]*n_layers``, i.e. n_layers-1 actual
  layers (Model/FKAN_GCF.py:96-98);
- node dropout = value dropout on the normalized adjacency scaled
  1/keep (SparseDropout, Model/FKAN_GCF.py:45-64);
- final = concat of all layer outputs incl. ego; BPR(+1e-5) + mean reg on
  raw embedding tables (Model/FKAN_GCF.py:173-216).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.kan import fourier_kan, fourier_kan_init
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


class FKAN_GCF(RecModel):
    name = "FKAN_GCF"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, node_dropout, message_dropout, grid_size):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_gnn = max(n_layers - 1, 0)  # zip quirk (see docstring)
        self.node_dropout = node_dropout
        self.message_dropout = message_dropout
        self.grid_size = grid_size

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 2 + self.n_gnn)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(ks[1], (self.num_item, self.dim_E)),
        }
        for l in range(self.n_gnn):
            params[f"kan_{l}"] = fourier_kan_init(
                ks[2 + l], self.dim_E, self.dim_E, self.grid_size
            )
        return params

    def _propagate(self, rng, xu, xi):
        g = self.graph
        if rng is None or self.node_dropout <= 0:
            return g.propagate(xu, xi)
        keep = 1.0 - self.node_dropout
        ku, ki = jax.random.split(rng)
        mu = jax.random.bernoulli(ku, keep, g.w_by_u.shape).astype(jnp.float32) / keep
        mi = jax.random.bernoulli(ki, keep, g.w_by_i.shape).astype(jnp.float32) / keep
        r_u = jnp.zeros((self.num_user, self.num_item), jnp.float32).at[
            g.u_by_u, g.i_by_u
        ].add(g.w_by_u.astype(jnp.float32) * mu)
        r_i = jnp.zeros((self.num_item, self.num_user), jnp.float32).at[
            g.i_by_i, g.u_by_i
        ].add(g.w_by_i.astype(jnp.float32) * mi)
        return (
            jnp.dot(r_u, xi, preferred_element_type=jnp.float32),
            jnp.dot(r_i, xu, preferred_element_type=jnp.float32),
        )

    def forward(self, params: Params, rng=None):
        xu, xi = params["user_embedding"], params["item_embedding"]
        outs_u, outs_i = [xu], [xi]
        for l in range(self.n_gnn):
            if rng is not None:
                rng, k_adj, k_mu, k_mi = jax.random.split(rng, 4)
            else:
                k_adj = None
            au, ai = self._propagate(k_adj, xu, xi)
            cf = params[f"kan_{l}"]
            nu = xu + au + fourier_kan(au * xu, cf)
            ni = xi + ai + fourier_kan(ai * xi, cf)
            nu = jax.nn.leaky_relu(nu, 0.2)
            ni = jax.nn.leaky_relu(ni, 0.2)
            if rng is not None and self.message_dropout > 0:
                keep = 1.0 - self.message_dropout
                nu = nu * jax.random.bernoulli(k_mu, keep, nu.shape) / keep
                ni = ni * jax.random.bernoulli(k_mi, keep, ni.shape) / keep
            xu, xi = l2norm(nu), l2norm(ni)
            outs_u.append(xu)
            outs_i.append(xi)
        return jnp.concatenate(outs_u, axis=1), jnp.concatenate(outs_i, axis=1)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi = self.forward(params, rng)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(
            self.reg_weight,
            (
                params["user_embedding"][batch.users],
                params["item_embedding"][batch.pos_items],
                params["item_embedding"][batch.neg_items],
            ),
            w,
        )
        return bpr + reg

    def embeddings(self, params: Params):
        return self.forward(params)
