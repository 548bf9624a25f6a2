"""DGCF: disentangled graph CF with neighbor routing.

Reference: Model/DGCF.py. Capabilities reproduced:
- embeddings split into n_factors chunks; per layer, n_iterations of
  routing: S (n_factors, E) softmax-normalized across factors, each factor
  chunk propagated with per-edge weight ``deg_norm * s_k`` over the
  undirected graph (DGCFConv, Model/DGCF.py:20-46), and S incremented by
  ``<normalize(x_k[u]), tanh(normalize(ego_k[i_global]))>`` per directed
  train edge (eq. 11, Model/DGCF.py:124-144);
- **S is persistent training state** (initialized to ones,
  Model/DGCF.py:75-76, mutated every batch) — modeled here through the
  stateful-model protocol (loss_stateful threads S through the epoch scan);
- final = SUM over layer embeddings incl. ego (Model/DGCF.py:149-152);
- loss = BPR(+1e-5) + mean reg (propagated) + corDecay * mean distance
  correlation between consecutive factor chunks of the batch
  [user; pos_item] embeddings (Model/DGCF.py:180-199; utils.py:83-108).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.ell import build_segment_transpose, seg_gather, seg_sum
from chaorec_tpu.ops.distcorr import distance_correlation
from chaorec_tpu.ops.init import xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


from chaorec_tpu.ops.losses import l2norm as _norm  # zero-row safe


class DGCF(RecModel):
    name = "DGCF"
    stateful = True

    def __init__(self, num_user, num_item, edges: np.ndarray, dim_E,
                 reg_weight, cor_decay, n_factors, n_iterations, n_layers):
        super().__init__(num_user, num_item)
        assert dim_E % n_factors == 0
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.cor_decay = cor_decay
        self.n_factors = n_factors
        self.n_iterations = n_iterations
        self.n_layers = n_layers
        # Directed train edges; undirected propagation applies the same
        # per-edge score to both directions (DGCFConv duplicates S).
        self.edge_u = jnp.asarray(edges[:, 0], jnp.int32)
        self.edge_i = jnp.asarray(edges[:, 1], jnp.int32)
        # sorted layouts: factor propagation (n_factors x n_iterations x
        # n_layers segment reductions per step) runs scatter-free
        self._perm_u, self._ptr_u = build_segment_transpose(
            self.edge_u, num_user)
        self._perm_i, self._ptr_i = build_segment_transpose(
            self.edge_i, num_item)
        du = np.bincount(edges[:, 0], minlength=num_user).astype(np.float32)
        di = np.bincount(edges[:, 1], minlength=num_item).astype(np.float32)
        dd = 1.0 / np.sqrt(np.maximum(du[edges[:, 0]] * di[edges[:, 1]], 1.0))
        self.edge_w = jnp.asarray(dd)

    def init_params(self, rng: jax.Array) -> Params:
        k_u, k_i = jax.random.split(rng)
        return {
            "user_embedding": xavier_uniform(k_u, (self.num_user, self.dim_E)),
            "item_embedding": xavier_uniform(k_i, (self.num_item, self.dim_E)),
        }

    def init_state(self, rng: jax.Array):
        return jnp.ones((self.n_factors, self.edge_u.shape[0]), jnp.float32)

    def _propagate_factor(self, xu, xi, s):
        w = self.edge_w * s
        new_u = seg_sum(
            w[:, None] * seg_gather(xi, self.edge_i, self._perm_i,
                                    self._ptr_i),
            self.edge_u, self._perm_u, self._ptr_u)
        new_i = seg_sum(
            w[:, None] * seg_gather(xu, self.edge_u, self._perm_u,
                                    self._ptr_u),
            self.edge_i, self._perm_i, self._ptr_i)
        return new_u, new_i

    def forward(self, params: Params, s_state):
        d = self.dim_E // self.n_factors
        ego_u, ego_i = params["user_embedding"], params["item_embedding"]
        acc_u, acc_i = ego_u, ego_i
        s = s_state
        for _ in range(self.n_layers):
            chunks_u = jnp.split(ego_u, self.n_factors, axis=1)
            chunks_i = jnp.split(ego_i, self.n_factors, axis=1)
            layer_u, layer_i = None, None
            for _t in range(self.n_iterations):
                s_soft = jax.nn.softmax(s, axis=0)
                iter_u, iter_i, s_updates = [], [], []
                for k in range(self.n_factors):
                    xu, xi = self._propagate_factor(
                        chunks_u[k], chunks_i[k], s_soft[k]
                    )
                    iter_u.append(xu)
                    iter_i.append(xi)
                    # eq. 11: updated user chunk vs pre-update item chunk
                    uk = _norm(xu[self.edge_u])
                    ik = _norm(chunks_i[k][self.edge_i])
                    s_updates.append(jnp.sum(uk * jnp.tanh(ik), axis=1))
                layer_u, layer_i = iter_u, iter_i
                s = s_soft + jnp.stack(s_updates, axis=0)
            ego_u = jnp.concatenate(layer_u, axis=1)
            ego_i = jnp.concatenate(layer_i, axis=1)
            acc_u = acc_u + ego_u
            acc_i = acc_i + ego_i
        return acc_u, acc_i, s

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        w = batch.weights
        fu, fi, new_s = self.forward(params, state)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        ui = jnp.concatenate([u, pos], axis=0)
        chunks = jnp.split(ui, self.n_factors, axis=1)
        cor = 0.0
        for k in range(self.n_factors - 1):
            cor = cor + distance_correlation(chunks[k], chunks[k + 1])
        cor = cor / ((self.n_factors + 1) * self.n_factors / 2)
        return bpr + reg + self.cor_decay * cor, jax.lax.stop_gradient(new_s)

    def embeddings_stateful(self, params: Params, state):
        fu, fi, _ = self.forward(params, state)
        return fu, fi
