"""GRCN: graph-refined convolutional network.

Reference: Model/GRCN.py. Capabilities reproduced:
- per-step directed-edge dropout (p=dropout) shared by all branches
  (Model/GRCN.py:161-168);
- CGCN content branches: tanh/LReLU-projected features + normalized user
  preference, GAT attention ``softmax(<x_tgt, x_src>)`` per target on the
  doubled edges; **routing quirk kept**: the reference's routing loop
  propagates over the DIRECTED edge list, whose targets are all items, so
  the user-preference update adds zeros and routing is a no-op — we skip
  it (Model/GRCN.py:89-121);
- edge weights: per-modality attention alphas (2E,) stacked, multiplied by
  node confidences gathered source-first (rows 0..E-1 use the user end,
  rows E.. the item end), max over modalities, ReLU pruning
  (Model/GRCN.py:169-230);
- EGCN id branch: x normalized, two weighted SAGE convs (message =
  x_src * w_edge, sum aggregation) with LReLU, output x + x1 + x2
  (Model/GRCN.py:63-87);
- fusion 'concat': [id_rep || v_rep || t_rep]; pair-format BPR (no eps)
  + reg on id table + preferences at batch rows (Model/GRCN.py:232-260);
- ranking uses the result of the last forward (dropped edges), like the
  reference's gene_ranklist-on-self.result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import l2norm, masked_mean


class GRCN(RecModel):
    name = "GRCN"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, dim_C, reg_weight, dropout, num_routing):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.dim_C = dim_C
        self.reg_weight = reg_weight
        self.dropout = dropout
        self.v_feat = v_feat
        self.t_feat = t_feat
        g = graph
        self.e_u = g.u_by_u  # (E,) directed user end
        self.e_i = g.i_by_u  # (E,) directed item end (0-based)
        self.n_nodes = num_user + num_item
        # Fixed doubled-edge topology with per-step traced weights
        # (attention alphas / gated confidences): EllPattern keeps every
        # aggregation AND its VJP on gathers (~140 GB/s on v5e) instead
        # of the unsorted scatter-adds (~25 GB/s) that segment_sum
        # lowers to — the r4 speed gap on netfilx (0.60x) was exactly
        # these scatters (parity_logs/gather_rates.txt).
        import numpy as np

        from chaorec_tpu.ops.ell import EllPattern

        e_u = np.asarray(g.u_by_u)
        e_i = np.asarray(g.i_by_u) + num_user
        src = np.concatenate([e_u, e_i])
        dst = np.concatenate([e_i, e_u])
        self.pat = EllPattern.from_coo(dst, src, self.n_nodes, self.n_nodes)
        import os

        # lane-packed v/t CGCN towers (see _cgcn_packed); escape hatch
        # for A/B timing
        self._packed = os.environ.get("CHAOREC_GRCN_PACKED", "1") == "1"

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 6)
        p = {
            "id_embedding": xavier_normal(ks[0], (self.n_nodes, self.dim_E)),
            "model_specific_conf": xavier_normal(ks[1], (self.n_nodes, 2)),
            "v_preference": xavier_normal(ks[2], (self.num_user, self.dim_C)),
            "t_preference": xavier_normal(ks[3], (self.num_user, self.dim_C)),
        }
        for mod, k, feat in (("v", ks[4], self.v_feat), ("t", ks[5], self.t_feat)):
            w, b = torch_linear_init(k, self.dim_C, feat.shape[1])
            p[f"{mod}_mlp_w"], p[f"{mod}_mlp_b"] = w, b
        return p

    def _cgcn(self, params, mod, feat, keep2):
        """Returns (rep (N, dim_C), alpha (2E,)) on the dropped graph.

        x rows are l2-normalized, so |<x_dst, x_src>| <= 1 and the
        per-destination softmax needs no max-subtraction (shift
        invariance): alpha = exp(inner)*keep / rowsum(exp(inner)*keep),
        identical to PyG's softmax with -inf-masked dropped edges."""
        f = jax.nn.leaky_relu(
            feat @ params[f"{mod}_mlp_w"].T + params[f"{mod}_mlp_b"], 0.01
        )
        pref = l2norm(params[f"{mod}_preference"])
        f = l2norm(f)
        x = jnp.concatenate([pref, f], axis=0)
        # Plain-indexing edge algebra, KEPT after an r5 A/B: the
        # scatter-free ellp_pair_inner/ellp_row_expand rewrite (see
        # ops/ell.py) measured SLOWER on the real chip (netfilx 37.6 s
        # vs 33.8 s, beauty 5.47 s vs 4.40 s epochs) — same lesson as
        # NGCF's sorted rewrite: autodiff's unsorted scatters cost about
        # the same as gathers here, and the rewrite's extra passes lose.
        inner = jnp.sum(x[self.pat.rows] * x[self.pat.cols], axis=1)
        e = jnp.exp(inner) * keep2
        denom = self.pat.weighted_rowsum(e)
        alpha = e / jnp.maximum(denom, 1e-16)[self.pat.rows]
        out = self.pat.weighted_matvec(alpha, x)
        return x + jax.nn.leaky_relu(out, 0.01), alpha

    def _cgcn_packed(self, params, keep2):
        """Both CGCN towers in lane-packed form: a (N, 64) fp32 table
        tiles to 128 lanes on TPU (half the row bytes are padding), so
        the v/t towers run their edge passes on ONE (N, 128) packed
        table — same math as two :meth:`_cgcn` calls, half the gather
        traffic. Returns (v_rep, t_rep, alpha_v, alpha_t)."""
        from chaorec_tpu.ops.ell import (ellp_matvec_grouped,
                                         ellp_pair_inner_grouped)

        towers = []
        for mod, feat in (("v", self.v_feat), ("t", self.t_feat)):
            f = jax.nn.leaky_relu(
                feat @ params[f"{mod}_mlp_w"].T + params[f"{mod}_mlp_b"],
                0.01)
            towers.append(jnp.concatenate(
                [l2norm(params[f"{mod}_preference"]), l2norm(f)], axis=0))
        x_cat = jnp.concatenate(towers, axis=1)          # (N, 2*dim_C)
        inner = ellp_pair_inner_grouped(self.pat, x_cat, 2)   # (2E, 2)
        e = jnp.exp(inner) * keep2[:, None]
        den = jnp.stack([self.pat.weighted_rowsum(e[:, 0]),
                         self.pat.weighted_rowsum(e[:, 1])], axis=1)
        alpha = e / jnp.maximum(den, 1e-16)[self.pat.rows]
        out = ellp_matvec_grouped(self.pat, alpha, x_cat)     # (N, 2*dim_C)
        d = self.dim_C
        v_rep = towers[0] + jax.nn.leaky_relu(out[:, :d], 0.01)
        t_rep = towers[1] + jax.nn.leaky_relu(out[:, d:], 0.01)
        return v_rep, t_rep, alpha[:, 0], alpha[:, 1]

    def forward(self, params: Params, rng=None):
        e = self.e_u.shape[0]
        if rng is not None and self.dropout > 0:
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, (e,)).astype(
                jnp.float32
            )
        else:
            keep = jnp.ones((e,), jnp.float32)

        keep2 = jnp.concatenate([keep, keep])
        if self._packed:
            v_rep, t_rep, alpha_v, alpha_t = self._cgcn_packed(params, keep2)
        else:
            v_rep, alpha_v = self._cgcn(params, "v", self.v_feat, keep2)
            t_rep, alpha_t = self._cgcn(params, "t", self.t_feat, keep2)
        # Per-edge gated max over modalities (plain indexing — see the
        # r5 A/B note in _cgcn; the ellp_col_expand variant measured
        # slower on-chip).
        weight = jnp.stack([alpha_v, alpha_t], axis=1)  # (2E, 2)
        conf = jnp.concatenate(
            [params["model_specific_conf"][self.e_u],
             params["model_specific_conf"][self.e_i + self.num_user]], axis=0,
        )  # (2E, 2)
        w_edge = jnp.max(weight * conf, axis=1)
        w_edge = jax.nn.relu(w_edge)  # pruning
        w_edge = w_edge * keep2

        # EGCN id branch: weighted sum aggregation over doubled edges
        x = l2norm(params["id_embedding"])

        def conv(z):
            return self.pat.weighted_matvec(w_edge, z)

        x1 = jax.nn.leaky_relu(conv(x), 0.01)
        x2 = jax.nn.leaky_relu(conv(x1), 0.01)
        id_rep = x + x1 + x2
        rep = jnp.concatenate([id_rep, v_rep, t_rep], axis=1)
        return rep[: self.num_user], rep[self.num_user:]

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi = self.forward(params, rng)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = -masked_mean(
            jnp.log(jax.nn.sigmoid(jnp.sum(u * pos, 1) - jnp.sum(u * neg, 1))
                    + 1e-12), w,
        )
        idt = params["id_embedding"]
        reg = self.reg_weight * (
            masked_mean(jnp.mean(
                idt[batch.users] ** 2
                + idt[self.num_user + batch.pos_items] ** 2, 1), w)
            + masked_mean(jnp.mean(
                idt[batch.users] ** 2
                + idt[self.num_user + batch.neg_items] ** 2, 1), w)
        ) / 2.0
        reg = reg + self.reg_weight * (
            masked_mean(jnp.mean(params["v_preference"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["t_preference"][batch.users] ** 2, 1), w)
        )
        return bpr + reg

    def embeddings(self, params: Params):
        return self.forward(params)
