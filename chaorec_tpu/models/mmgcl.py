"""MMGCL: multimodal graph contrastive learning (ED+MM+CN).

Reference: Model/MMGCL.py. Capabilities reproduced:
- three LightGCN towers (mean layers 0..n) over the shared user table with
  id / projected-visual / projected-textual item inputs (raw features
  L2-normalized at init), fused by read_user/read_item Linears over the
  concatenation (Model/MMGCL.py:147-191);
- edge-dropout view: all three towers run on a renormalized
  edge-dropped adjacency (Model/MMGCL.py:136-145,214-245);
- modality-masking view: node-dropout adjacency (drop_rate of users AND
  items removed, renormalized) applied to ONE randomly chosen modality's
  tower (p = [0.5, 0.5]), others use the full graph
  (Model/MMGCL.py:119-134,247-287);
- ssl (ED+MM+CN): CE(u_1 @ i_1^T) + CE(u_1 @ i_2^T) on normalized fused
  batch rows; the reference computes a third "CN" term but never adds it
  (Model/MMGCL.py:289-344 quirk kept by omission);
- loss = BPR(+1e-5) + ssl_alpha * ssl (reg commented out in reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.models.slmrec import in_batch_ce
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, l2norm


class MMGCL(RecModel):
    name = "MMGCL"
    p_vat = 0.5

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, ssl_alpha, ssl_temp,
                 dropout):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_alpha = ssl_alpha
        self.ssl_temp = ssl_temp
        self.dropout_rate = dropout
        self.v_feat = l2norm(v_feat)
        self.t_feat = l2norm(t_feat)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 6)
        d = self.dim_E
        p = {
            "user_embeddings": xavier_uniform(ks[0], (self.num_user, d)),
            "item_embeddings": xavier_uniform(ks[1], (self.num_item, d)),
        }
        for name, k, in_dim in [
            ("v_dense", ks[2], self.v_feat.shape[1]),
            ("t_dense", ks[3], self.t_feat.shape[1]),
            ("read_user", ks[4], 3 * d),
            ("read_item", ks[5], 3 * d),
        ]:
            _, b = torch_linear_init(jax.random.fold_in(k, 1), d, in_dim)
            p[f"{name}_w"] = xavier_uniform(k, (d, in_dim))
            p[f"{name}_b"] = b
        return p

    def _dropped_r(self, rng, mode):
        """Renormalized dense R under edge (mode=0) / node (mode=1) drop."""
        g = self.graph
        e = g.u_by_u.shape[0]
        if mode == 0:
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout_rate, (e,))
            keep = keep.astype(jnp.float32)
        else:
            ku, ki = jax.random.split(rng)
            keep_u = jax.random.bernoulli(ku, 1.0 - self.dropout_rate,
                                          (self.num_user,)).astype(jnp.float32)
            keep_i = jax.random.bernoulli(ki, 1.0 - self.dropout_rate,
                                          (self.num_item,)).astype(jnp.float32)
            keep = keep_u[g.u_by_u] * keep_i[g.i_by_u]
        du = jax.ops.segment_sum(keep, g.u_by_u, num_segments=self.num_user)
        di = jax.ops.segment_sum(keep, g.i_by_u, num_segments=self.num_item)
        w = keep * jax.lax.rsqrt(jnp.maximum(du[g.u_by_u] * di[g.i_by_u], 1e-12))
        return jnp.zeros((self.num_user, self.num_item), jnp.float32).at[
            g.u_by_u, g.i_by_u
        ].add(w)

    def _tower(self, xu, xi, r=None):
        acc_u, acc_i = xu, xi
        cu, ci = xu, xi
        for _ in range(self.n_layers):
            if r is None:
                cu, ci = self.graph.propagate(cu, ci)
            else:
                cu, ci = (
                    jnp.dot(r, ci, preferred_element_type=jnp.float32),
                    jnp.dot(r.T, cu, preferred_element_type=jnp.float32),
                )
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        s = 1.0 / (self.n_layers + 1)
        return acc_u * s, acc_i * s

    def _fused(self, params, towers_u, towers_i):
        u = jnp.concatenate(towers_u, 1) @ params["read_user_w"].T + params["read_user_b"]
        i = jnp.concatenate(towers_i, 1) @ params["read_item_w"].T + params["read_item_b"]
        return u, i

    def _all_towers(self, params, r_id=None, r_v=None, r_t=None):
        xu = params["user_embeddings"]
        v_emb = self.v_feat @ params["v_dense_w"].T + params["v_dense_b"]
        t_emb = self.t_feat @ params["t_dense_w"].T + params["t_dense_b"]
        if r_id is r_v and r_v is r_t:
            # all three towers share one operator: a single 3d-wide
            # propagation is exactly the per-tower results (columnwise
            # independence) — one operator read instead of three.
            # NOTE: detected by OBJECT IDENTITY — callers wanting the
            # batched path must pass the same array object for all three
            # (loss/embeddings pass all-None or r_ed, r_ed, r_ed);
            # equal-valued copies silently fall back to 3 propagations
            au, ai = self._tower(
                jnp.concatenate([xu, xu, xu], 1),
                jnp.concatenate([params["item_embeddings"], v_emb, t_emb],
                                1), r_id)
            return tuple(jnp.split(au, 3, 1)), tuple(jnp.split(ai, 3, 1))
        iu, ii = self._tower(xu, params["item_embeddings"], r_id)
        vu, vi = self._tower(xu, v_emb, r_v)
        tu, ti = self._tower(xu, t_emb, r_t)
        return (iu, vu, tu), (ii, vi, ti)

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        k_ed, k_nd, k_mod = jax.random.split(rng, 3)
        tw_u, tw_i = self._all_towers(params)
        user, item = self._fused(params, tw_u, tw_i)
        bu, bi, bn, w = batch.users, batch.pos_items, batch.neg_items, batch.weights
        u = user[bu]
        pos = item[bi]
        neg = item[bn]
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)

        # view 1: edge dropout on all towers
        r_ed = self._dropped_r(k_ed, 0)
        u1_t, i1_t = self._all_towers(params, r_ed, r_ed, r_ed)
        u1, i1 = self._fused(params, [x[bu] for x in u1_t], [x[bi] for x in i1_t])
        u1, i1 = l2norm(u1), l2norm(i1)
        # view 2: node dropout on a random modality tower. Only the
        # dropped tower differs from the clean pass: batch the v/t
        # node-dropout towers through one 2d-wide propagation and reuse
        # the clean towers for the rest (was 6 towers, now 2).
        r_nd = self._dropped_r(k_nd, 1)
        pick_image = jax.random.bernoulli(k_mod, self.p_vat)
        xu = params["user_embeddings"]
        v_emb = self.v_feat @ params["v_dense_w"].T + params["v_dense_b"]
        t_emb = self.t_feat @ params["t_dense_w"].T + params["t_dense_b"]
        au, ai = self._tower(jnp.concatenate([xu, xu], 1),
                             jnp.concatenate([v_emb, t_emb], 1), r_nd)
        vu_nd, tu_nd = jnp.split(au, 2, 1)
        vi_nd, ti_nd = jnp.split(ai, 2, 1)
        uv_t, iv_t = (tw_u[0], vu_nd, tw_u[2]), (tw_i[0], vi_nd, tw_i[2])
        ut_t, it_t = (tw_u[0], tw_u[1], tu_nd), (tw_i[0], tw_i[1], ti_nd)
        u2_t = jax.tree.map(lambda a, b: jnp.where(pick_image, a, b), uv_t, ut_t)
        i2_t = jax.tree.map(lambda a, b: jnp.where(pick_image, a, b), iv_t, it_t)
        u2, i2 = self._fused(params, [x[bu] for x in u2_t], [x[bi] for x in i2_t])
        u2, i2 = l2norm(u2), l2norm(i2)

        ssl = in_batch_ce(u1, i1, self.ssl_temp, w) + in_batch_ce(
            u1, i2, self.ssl_temp, w
        )
        return bpr + self.ssl_alpha * ssl

    def embeddings(self, params: Params):
        tw_u, tw_i = self._all_towers(params)
        return self._fused(params, tw_u, tw_i)
