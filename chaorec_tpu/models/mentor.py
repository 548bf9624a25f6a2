"""MENTOR: multi-level SSL with Gaussian alignment.

Reference: Model/MENTOR.py. Capabilities reproduced:
- seven 2-layer (x + h + h^2) GCN towers, each with its own user
  preference table and feature MLP: clean v/t, id, and two noisy copies
  per modality (sign-noise 0.1 after each conv; Model/MENTOR.py:18-56,
  225-275);
- fusion: user = weight_u-scaled concat of v/t tower users (guide/v/t
  reps duplicate their single tower 2x); item reps += one mm-graph
  propagation (frozen 0.5/0.5 kNN 1/k laplacian) (Model/MENTOR.py:276-350);
- losses (Model/MENTOR.py:372-428): BPR(+1e-5) + reg(preferences +
  weight_u) + align_weight * 6-pair |var/mean| Gaussian alignment +
  mask_weight_f * feature-mask cosine terms (computed entirely under
  stop_gradient — the reference wraps both operands in no_grad, so the
  term is a constant and its MLP never trains; quirk kept) +
  mask_weight_g * full-table InfoNCE between the two noisy views.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.knn import ELLGraph, build_knn_graph
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import bpr_loss, l2norm, masked_mean


def _full_table_infonce(e1, e2, temp):
    n1, n2 = l2norm(e1), l2norm(e2)
    pos = jnp.sum(n1 * n2, axis=1) / temp
    logits = jnp.dot(n1, n2.T, preferred_element_type=jnp.float32) / temp
    return jnp.mean(jax.nn.logsumexp(logits, axis=1) - pos)


class MENTOR(RecModel):
    name = "MENTOR"
    knn_k = 10
    mm_image_weight = 0.5
    noise_eps = 0.1

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, mm_layers, reg_weight, ssl_temp, dropout,
                 align_weight, mask_weight_g, mask_weight_f):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.mm_layers = mm_layers
        self.reg_weight = reg_weight
        self.temp = ssl_temp
        self.dropout = dropout
        self.align_weight = align_weight
        self.mask_weight_g = mask_weight_g
        self.mask_weight_f = mask_weight_f
        self.v_feat = v_feat
        self.t_feat = t_feat
        k = min(self.knn_k, num_item)
        gv = build_knn_graph(v_feat, k, norm="ref_laplacian")
        gt = build_knn_graph(t_feat, k, norm="ref_laplacian")
        self.mm_graph = ELLGraph(
            jnp.concatenate([gv.indices, gt.indices], axis=1),
            jnp.concatenate(
                [self.mm_image_weight * gv.weights,
                 (1 - self.mm_image_weight) * gt.weights], axis=1,
            ),
        )

    _TOWERS = ("v", "t", "id", "v_n1", "t_n1", "v_n2", "t_n2")

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 2 + 3 * len(self._TOWERS))
        d = self.dim_E
        p = {
            "id_feat": xavier_normal(ks[0], (self.num_item, d)),
            "weight_u": jax.nn.softmax(
                xavier_normal(ks[1], (self.num_user, 2, 1)), axis=1
            ),
        }
        w, b = torch_linear_init(jax.random.fold_in(ks[1], 9), 2 * d, 2 * d)
        p["mlp_w"], p["mlp_b"] = w, b  # dead-weight MLP (quirk, see docstring)
        for i, name in enumerate(self._TOWERS):
            in_dim = {"v": self.v_feat.shape[1], "t": self.t_feat.shape[1],
                      "id": d}[name.split("_")[0]]
            p[f"{name}_preference"] = xavier_normal(ks[2 + 3 * i], (self.num_user, d))
            w1, b1 = torch_linear_init(ks[3 + 3 * i], 4 * d, in_dim)
            w2, b2 = torch_linear_init(ks[4 + 3 * i], d, 4 * d)
            p[f"{name}_mlp_w1"], p[f"{name}_mlp_b1"] = w1, b1
            p[f"{name}_mlp_w2"], p[f"{name}_mlp_b2"] = w2, b2
        return p

    def _towers(self, params, specs):
        """All towers through ONE 7d-wide propagation pair: the shared
        adjacency is columnwise-independent and the inter-layer noise is
        elementwise per column slice, so splitting the batched result is
        exactly the per-tower outputs (2 edge gathers instead of 14)."""
        d = params["v_preference"].shape[1]
        cus, cis = [], []
        for name, feat, _ in specs:
            tf = jax.nn.leaky_relu(
                feat @ params[f"{name}_mlp_w1"].T
                + params[f"{name}_mlp_b1"], 0.01)
            tf = tf @ params[f"{name}_mlp_w2"].T + params[f"{name}_mlp_b2"]
            x = l2norm(jnp.concatenate(
                [params[f"{name}_preference"], tf], axis=0))
            cus.append(x[: self.num_user])
            cis.append(x[self.num_user:])
        cu = jnp.concatenate(cus, axis=1)
        ci = jnp.concatenate(cis, axis=1)

        def perturb_slices(step, xu, xi):
            outs_u, outs_i = [], []
            for j, (_, _, key) in enumerate(specs):
                su = xu[:, j * d:(j + 1) * d]
                si = xi[:, j * d:(j + 1) * d]
                if key is not None:
                    k = jax.random.fold_in(key, step)
                    ku, ki = jax.random.split(k)
                    nu = l2norm(jax.random.uniform(ku, su.shape))
                    ni = l2norm(jax.random.uniform(ki, si.shape))
                    su = su + jnp.sign(su) * nu * self.noise_eps
                    si = si + jnp.sign(si) * ni * self.noise_eps
                outs_u.append(su)
                outs_i.append(si)
            return jnp.concatenate(outs_u, 1), jnp.concatenate(outs_i, 1)

        h_u, h_i = self.graph.propagate(cu, ci)
        h_u, h_i = perturb_slices(0, h_u, h_i)
        h1_u, h1_i = self.graph.propagate(h_u, h_i)
        h1_u, h1_i = perturb_slices(1, h1_u, h1_i)
        au, ai = cu + h_u + h1_u, ci + h_i + h1_i
        n = len(specs)
        return jnp.split(au, n, 1), jnp.split(ai, n, 1)

    def forward(self, params: Params, rng=None):
        ks = list(jax.random.split(rng, 4)) if rng is not None else [None] * 4
        specs = [("v", self.v_feat, None), ("t", self.t_feat, None),
                 ("id", params["id_feat"], None),
                 ("v_n1", self.v_feat, ks[0]), ("t_n1", self.t_feat, ks[1]),
                 ("v_n2", self.v_feat, ks[2]), ("t_n2", self.t_feat, ks[3])]
        us, is_ = self._towers(params, specs)
        (v_u, t_u, id_u, vn1_u, tn1_u, vn2_u, tn2_u) = us
        (v_i, t_i, id_i, vn1_i, tn1_i, vn2_i, tn2_i) = is_

        w = params["weight_u"]  # (U, 2, 1)

        def fuse_u(a, b):
            return jnp.concatenate([w[:, 0] * a, w[:, 1] * b], axis=1)

        user_rep = fuse_u(v_u, t_u)
        item_rep = jnp.concatenate([v_i, t_i], axis=1)
        item_rep = item_rep + self._mm(item_rep)
        guide_u = jnp.concatenate([id_u, id_u], axis=1)
        guide_i = jnp.concatenate([id_i, id_i], axis=1)
        guide_i = guide_i + self._mm(guide_i)
        vv_u = jnp.concatenate([v_u, v_u], axis=1)
        vv_i = jnp.concatenate([v_i, v_i], axis=1)
        vv_i = vv_i + self._mm(vv_i)
        tt_u = jnp.concatenate([t_u, t_u], axis=1)
        tt_i = jnp.concatenate([t_i, t_i], axis=1)
        tt_i = tt_i + self._mm(tt_i)
        n1_u = fuse_u(vn1_u, tn1_u)
        n1_i = jnp.concatenate([vn1_i, tn1_i], axis=1)
        n1_i = n1_i + self._mm(n1_i)
        n2_u = fuse_u(vn2_u, tn2_u)
        n2_i = jnp.concatenate([vn2_i, tn2_i], axis=1)
        n2_i = n2_i + self._mm(n2_i)
        return {
            "main": (user_rep, item_rep), "guide": (guide_u, guide_i),
            "v": (vv_u, vv_i), "t": (tt_u, tt_i),
            "n1": (n1_u, n1_i), "n2": (n2_u, n2_i),
        }

    def _mm(self, item_rep):
        h = item_rep
        for _ in range(self.mm_layers):
            h = self.mm_graph.propagate(h)
        return h

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        k_fwd, k_drop = jax.random.split(rng)
        reps = self.forward(params, k_fwd)
        fu, fi = reps["main"]
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * (
            masked_mean(jnp.mean(params["v_preference"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["t_preference"][batch.users] ** 2, 1), w)
            + jnp.mean(params["weight_u"] ** 2)
        )

        # feature-mask term: fully stop-gradient (reference no_grad quirk)
        u_sg = jax.lax.stop_gradient(fu)
        i_sg = jax.lax.stop_gradient(fi)
        u2 = u_sg @ jax.lax.stop_gradient(params["mlp_w"]).T + params["mlp_b"]
        i2 = i_sg @ jax.lax.stop_gradient(params["mlp_w"]).T + params["mlp_b"]
        keep = 1.0 - self.dropout
        ku, ki = jax.random.split(k_drop)
        u1 = u_sg * jax.random.bernoulli(ku, keep, u_sg.shape) / keep
        i1 = i_sg * jax.random.bernoulli(ki, keep, i_sg.shape) / keep
        mask_f = self.mask_weight_f * jax.lax.stop_gradient(
            (1 - jnp.mean(jnp.sum(l2norm(u1) * l2norm(u2), 1)))
            + (1 - jnp.mean(jnp.sum(l2norm(i1) * l2norm(i2), 1)))
        )

        def stats(pair):
            e = jnp.concatenate(pair, axis=0)
            return jnp.var(e), jnp.mean(e)

        r_v, r_m = stats(reps["main"])
        g_v, g_m = stats(reps["guide"])
        v_v, v_m = stats(reps["v"])
        t_v, t_m = stats(reps["t"])
        align = self.align_weight * (
            jnp.abs(g_v - r_v) + jnp.abs(g_m - r_m)
            + jnp.abs(g_v - v_v) + jnp.abs(g_m - v_m)
            + jnp.abs(g_v - t_v) + jnp.abs(g_m - t_m)
            + jnp.abs(r_v - v_v) + jnp.abs(r_m - v_m)
            + jnp.abs(r_v - t_v) + jnp.abs(r_m - t_m)
            + jnp.abs(v_v - t_v) + jnp.abs(v_m - t_m)
        )

        n1 = jnp.concatenate(reps["n1"], axis=0)
        n2 = jnp.concatenate(reps["n2"], axis=0)
        mask_g = self.mask_weight_g * (
            _full_table_infonce(n1[: self.num_user], n2[: self.num_user], self.temp)
            + _full_table_infonce(n1[self.num_user:], n2[self.num_user:], self.temp)
        )
        return bpr + reg + align + mask_f + mask_g

    def embeddings(self, params: Params):
        reps = self.forward(params)
        return reps["main"]
