"""MGAT: gated graph attention per modality.

Reference: Model/MGAT.py. Capabilities reproduced:
- GraphGAT conv (Model/MGAT.py:18-70): x W per node, per edge
  ``inner = <x_tgt, LReLU(x_src)>``, gate = sigmoid(deg_src^-1/2 * inner),
  attention = per-target softmax(inner * gate) (ops/edge_softmax), output
  = segment-sum + bias, then row-normalized; weights U(-1/sqrt(in), ..),
  conv weight re-initialized xavier-normal per the GNN module;
- GNN: 3 rounds of x_{k+1} = LReLU(g_k(h) + LReLU(lin_k(x_k)) + id);
  visual tower projects to 256, textual to 100 via tanh MLP; outputs
  concat(x_1, x_2, x_3) (Model/MGAT.py:73-135);
- final = (v + t)/2; BPR(+1e-5) + mean reg on final embeddings; raw
  features are frozen-by-omission (requires_grad tensors never registered,
  Model/MGAT.py:147-149 quirk kept).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.edge_softmax import segment_softmax
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm


class MGAT(RecModel):
    name = "MGAT"
    dim_latent_v = 256
    dim_latent_t = 100

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.v_feat = v_feat  # frozen (quirk)
        self.t_feat = t_feat
        # doubled edge list in (src, dst) node-id space
        g = graph
        src = jnp.concatenate([g.u_by_u, g.i_by_u + num_user])
        dst = jnp.concatenate([g.i_by_u + num_user, g.u_by_u])
        self.src, self.dst = src, dst
        n = num_user + num_item
        deg = jnp.zeros((n,), jnp.float32).at[src].add(1.0)
        self.deg_inv_sqrt_src = (jnp.maximum(deg, 1.0) ** -0.5)[src]
        self.n_nodes = n
        from chaorec_tpu.ops.ell import build_segment_transpose

        # sorted layouts: GAT gathers and the message reduce run
        # scatter-free; the scalar softmax denominators stay on
        # segment_max/segment_sum (non-negative — see ops/ell.py CAVEAT)
        self._perm_src, self._ptr_src = build_segment_transpose(src, n)
        self._perm_dst, self._ptr_dst = build_segment_transpose(dst, n)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 2)
        p = {"id_embedding": xavier_normal(ks[0], (self.n_nodes, self.dim_E))}
        k = ks[1]
        for mod, dim_latent, feat in (
            ("v", self.dim_latent_v, self.v_feat),
            ("t", self.dim_latent_t, self.t_feat),
        ):
            k, k_pref, k_mlp = jax.random.split(k, 3)
            p[f"{mod}_preference"] = xavier_normal(k_pref, (self.num_user, dim_latent))
            w, b = torch_linear_init(k_mlp, dim_latent, feat.shape[1])
            p[f"{mod}_mlp_w"], p[f"{mod}_mlp_b"] = w, b
            dims = [dim_latent, self.dim_E, self.dim_E]
            for i in range(3):
                d_in = dims[i] if i < len(dims) else self.dim_E
                k, kc, kl, kg, kb = jax.random.split(k, 5)
                p[f"{mod}_conv{i}_w"] = xavier_normal(kc, (d_in, d_in))
                bound = 1.0 / jnp.sqrt(jnp.asarray(float(d_in)))
                p[f"{mod}_conv{i}_b"] = jax.random.uniform(
                    kb, (d_in,), minval=-bound, maxval=bound
                )
                wl, bl = torch_linear_init(kl, self.dim_E, d_in)
                p[f"{mod}_lin{i}_w"] = xavier_normal(
                    jax.random.fold_in(kl, 3), (self.dim_E, d_in))
                p[f"{mod}_lin{i}_b"] = bl
                wg, bg = torch_linear_init(kg, self.dim_E, d_in)
                p[f"{mod}_g{i}_w"] = xavier_normal(
                    jax.random.fold_in(kg, 3), (self.dim_E, d_in))
                p[f"{mod}_g{i}_b"] = bg
        return p

    def _gat(self, params, mod, i, x):
        from chaorec_tpu.ops.ell import seg_gather, seg_sum

        xw = x @ params[f"{mod}_conv{i}_w"]  # weight applied as x @ W
        src, dst = self.src, self.dst
        xw_src = seg_gather(xw, src, self._perm_src, self._ptr_src)
        xw_dst = seg_gather(xw, dst, self._perm_dst, self._ptr_dst)
        inner = jnp.sum(xw_dst * jax.nn.leaky_relu(xw_src, 0.01), axis=1)
        gate = jax.nn.sigmoid(self.deg_inv_sqrt_src * inner)
        att = segment_softmax(inner * gate, dst, self.n_nodes)
        out = seg_sum(att[:, None] * xw_src, dst,
                      self._perm_dst, self._ptr_dst)
        out = out + params[f"{mod}_conv{i}_b"]
        return l2norm(out)

    def _tower(self, params, mod, feat, id_emb):
        tf = jnp.tanh(feat @ params[f"{mod}_mlp_w"].T + params[f"{mod}_mlp_b"])
        x = l2norm(jnp.concatenate([params[f"{mod}_preference"], tf], axis=0))
        outs = []
        for i in range(3):
            h = jax.nn.leaky_relu(self._gat(params, mod, i, x), 0.01)
            x_hat = jax.nn.leaky_relu(
                x @ params[f"{mod}_lin{i}_w"].T + params[f"{mod}_lin{i}_b"], 0.01
            ) + id_emb
            x = jax.nn.leaky_relu(
                h @ params[f"{mod}_g{i}_w"].T + params[f"{mod}_g{i}_b"] + x_hat,
                0.01,
            )
            outs.append(x)
        return jnp.concatenate(outs, axis=1)

    def forward(self, params: Params):
        id_emb = params["id_embedding"]
        v = self._tower(params, "v", self.v_feat, id_emb)
        t = self._tower(params, "t", self.t_feat, id_emb)
        rep = (v + t) / 2.0
        return rep[: self.num_user], rep[self.num_user:]

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi = self.forward(params)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        return bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5) + \
            emb_l2_reg(self.reg_weight, (u, pos, neg), w)

    def embeddings(self, params: Params):
        return self.forward(params)
