"""GraphAug: learned-view graph augmentation with information bottleneck.

Reference: Model/GraphAug.py. Capabilities reproduced:
- main branch: plain propagation layers summed incl. ego (GCNLayer,
  Model/GraphAug.py:47-55,411-423);
- MixHop view learner (Model/GraphAug.py:99-245): 3 sparse NGCN layers
  (relu(dropout(XW+b)) propagated i-1 times, concat 600) -> 3 dense NGCN
  layers (XW dropout propagated i-1 times + b, concat 600) -> Linear to
  2*IB_size (=64); edge MLP scores each directed edge of the normalized
  adjacency, gumbel-noised sigmoid **detached**, clamped, relaxed-
  Bernoulli(temp 0.9) sample, thresholded at 0.2 (Model/GraphAug.py:
  247-310) — as in the reference, gradients reach the view learner only
  through the IB KL term;
- **unoffset random edges quirk kept**: 100000 random (user, item-id)
  pairs with weight 0.05 are added in raw node coordinates, so the item
  end lands in the user block (Model/GraphAug.py:553-558);
- two generated views propagated by the main GCN stack; loss = BPR(+1e-5)
  + mean reg (raw tables) + ssl_reg * full-catalog contrast between the
  views at batch rows + 1e-5 * KL(mu, softplus(s - IB_size))/ln2
  (Model/GraphAug.py:543-575). Random-edge count is scaled down for tiny
  catalogs (min(100000, 10 * E)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm, masked_mean


class GraphAug(RecModel):
    name = "GraphAug"
    IB_size = 32
    gen = 2
    mixhop_width = 200
    mixhop_dropout = 0.5
    n_random_edges = 100000

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_reg):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_reg = ssl_reg
        g = graph
        self.n_nodes = num_user + num_item
        # doubled normalized edges in node space
        self.src = jnp.concatenate([g.u_by_u, g.i_by_u + num_user])
        self.dst = jnp.concatenate([g.i_by_u + num_user, g.u_by_u])
        self.w_norm = jnp.concatenate([g.w_by_u, g.w_by_u]).astype(jnp.float32)
        self.n_rand = min(self.n_random_edges, 10 * int(self.src.shape[0]))

    def init_params(self, rng: jax.Array) -> Params:
        d = self.dim_E
        wdt = self.mixhop_width
        ks = jax.random.split(rng, 16)
        p = {
            "uEmbeds": xavier_uniform(ks[0], (self.num_user, d)),
            "iEmbeds": xavier_uniform(ks[1], (self.num_item, d)),
        }
        dims_in_1 = [d] * 3
        for i in range(3):
            p[f"sp{i}_w"] = xavier_uniform(ks[2 + i], (dims_in_1[i], wdt))
            p[f"sp{i}_b"] = xavier_uniform(jax.random.fold_in(ks[2 + i], 1), (1, wdt))
        for i in range(3):
            p[f"dn{i}_w"] = xavier_uniform(ks[5 + i], (3 * wdt, wdt))
            p[f"dn{i}_b"] = xavier_uniform(jax.random.fold_in(ks[5 + i], 1), (1, wdt))
        fw, fb = torch_linear_init(ks[8], 2 * self.IB_size, 3 * wdt)
        p["fc_w"], p["fc_b"] = fw, fb
        w1, _ = torch_linear_init(ks[9], d, 2 * self.IB_size * 2)
        # edge MLP: Linear(2*input_dim -> dim) -> ReLU -> Linear(dim -> 1)
        p["edge_w1"] = xavier_uniform(ks[10], (d, 2 * 2 * self.IB_size))
        p["edge_b1"] = jnp.zeros((d,), jnp.float32)
        p["edge_w2"] = xavier_uniform(ks[11], (1, d))
        p["edge_b2"] = jnp.zeros((1,), jnp.float32)
        return p

    def _prop(self, x, src, dst, w):
        return jax.ops.segment_sum(w[:, None] * x[src], dst,
                                   num_segments=self.n_nodes)

    def _main(self, params, src=None, dst=None, w=None):
        x = jnp.concatenate([params["uEmbeds"], params["iEmbeds"]], axis=0)
        if src is None:
            src, dst, w = self.src, self.dst, self.w_norm
        acc = x
        cur = x
        for _ in range(self.n_layers):
            cur = self._prop(cur, src, dst, w)
            acc = acc + cur
        return acc

    def _mixhop(self, params, feats, rng):
        ks = jax.random.split(rng, 6)

        def drop(k, x):
            keep = 1.0 - self.mixhop_dropout
            return x * jax.random.bernoulli(k, keep, x.shape) / keep

        ups = []
        for i in range(3):
            h = jax.nn.relu(drop(ks[i], feats @ params[f"sp{i}_w"] + params[f"sp{i}_b"]))
            for _ in range(i):
                h = self._prop(h, self.src, self.dst, self.w_norm)
            ups.append(h)
        a1 = jnp.concatenate(ups, axis=1)
        downs = []
        for i in range(3):
            h = drop(ks[3 + i], a1 @ params[f"dn{i}_w"])
            for _ in range(i):
                h = self._prop(h, self.src, self.dst, self.w_norm)
            downs.append(h + params[f"dn{i}_b"])
        a2 = jnp.concatenate(downs, axis=1)
        return a2 @ params["fc_w"].T + params["fc_b"]  # (N, 2*IB)

    def _view_adj(self, params, node_emb, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        edge_emb = jnp.concatenate([node_emb[self.src], node_emb[self.dst]], 1)
        h = jax.nn.relu(edge_emb @ params["edge_w1"].T + params["edge_b1"])
        logits = (h @ params["edge_w2"].T + params["edge_b2"])[:, 0]
        bias = 0.0001
        eps = jax.random.uniform(k1, logits.shape, minval=bias, maxval=1 - bias)
        gate = jax.nn.sigmoid(jnp.log(eps) - jnp.log(1 - eps) + logits)
        att = jnp.clip(jax.lax.stop_gradient(gate), 0.01, 0.99)
        # RelaxedBernoulli(temp=0.9) rsample
        u = jax.random.uniform(k2, att.shape, minval=1e-6, maxval=1 - 1e-6)
        lw = jax.nn.sigmoid(
            (jnp.log(att) - jnp.log(1 - att) + jnp.log(u) - jnp.log(1 - u)) / 0.9
        )
        lw = lw * (lw > 0.2).astype(jnp.float32)
        # extra random edges, raw-coordinate quirk (see docstring)
        r_src = jax.random.randint(k3, (self.n_rand,), 0, self.num_user)
        r_dst = jax.random.randint(jax.random.fold_in(k3, 1), (self.n_rand,),
                                   0, self.num_item)
        src = jnp.concatenate([self.src, r_src])
        dst = jnp.concatenate([self.dst, r_dst])
        w = jnp.concatenate([lw, jnp.full((self.n_rand,), 0.05, jnp.float32)])
        return src, dst, w

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        k_mix, k_v1, k_v2 = jax.random.split(rng, 3)
        main = self._main(params)
        node_embs = []
        views = []
        for k in (k_v1, k_v2):
            emb = self._mixhop(params, jax.lax.stop_gradient(main), k_mix)
            node_embs.append(emb)
            views.append(self._view_adj(params, jax.lax.stop_gradient(emb), k))
        node_embs = (node_embs[0] + node_embs[1]) / 2.0
        mu = node_embs[:, : self.IB_size]
        std = jax.nn.softplus(node_embs[:, self.IB_size:] - self.IB_size)
        kl = -0.5 * jnp.mean(
            jnp.sum(1 + 2 * jnp.log(std + 1e-12) - mu ** 2 - std ** 2, axis=1)
        ) / math.log(2)

        v_embs = [self._main(params, *v) for v in views]
        U = self.num_user
        u = main[: U][batch.users]
        pos = main[U:][batch.pos_items]
        neg = main[U:][batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = emb_l2_reg(
            self.reg_weight,
            (params["uEmbeds"][batch.users], params["iEmbeds"][batch.pos_items],
             params["iEmbeds"][batch.neg_items]),
            w,
        )

        def contrast(e1, e2, rows):
            n1, n2 = l2norm(e1), l2norm(e2)
            p1, p2 = n1[rows], n2[rows]
            nume = jnp.sum(p1 * p2, 1) / self.ssl_temp
            logits = jnp.dot(p1, n2.T, preferred_element_type=jnp.float32) / self.ssl_temp
            return masked_mean(jax.nn.logsumexp(logits, 1) - nume, w)

        cl = self.ssl_reg * (
            contrast(v_embs[0][:U], v_embs[1][:U], batch.users)
            + contrast(v_embs[0][U:], v_embs[1][U:], batch.pos_items)
        )
        return bpr + reg + cl + 1e-5 * kl

    def embeddings(self, params: Params):
        main = self._main(params)
        return main[: self.num_user], main[self.num_user:]
