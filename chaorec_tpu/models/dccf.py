"""DCCF: disentangled contrastive CF with intent prototypes.

Reference: Model/DCCF.py. Capabilities reproduced:
- per layer, four views of the previous state: (1) gnn = normalized-
  adjacency propagation; (2) int = softmax(x @ intent) @ intent^T with
  per-side (dim_E, n_intents) xavier-normal prototypes
  (Model/DCCF.py:139-143); (3)/(4) adaptive-augmentation views where
  per-edge weights alpha = (cos(head, tail)+1)/2 on the gnn / int
  embeddings build an *unnormalized, user-row-only* operator — the
  reference's SparseA holds only (user, global-item) entries, so item
  rows of these views are zero (Model/DCCF.py:106-118,146-158); kept
  bit-faithful via a user-side segment-sum;
- layer state = gnn + int + gaa + iaa + prev; final = SUM over all layer
  states incl. ego (Model/DCCF.py:166-176);
- ssl: per layer, 6 InfoNCE pairs (u/i x {gnn-int, gnn-gaa, gnn-iaa}) at
  batch rows, in-batch negatives, per-pair mean (Model/DCCF.py:180-215);
- loss = BPR(+1e-5 on summed) + mean reg (raw tables) + cen_reg *
  (||u_intent||^2 + ||i_intent||^2) + ssl_alpha * ssl
  (Model/DCCF.py:246-260).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.ell import build_segment_transpose, seg_gather, seg_sum
from chaorec_tpu.ops.init import xavier_normal
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg


from chaorec_tpu.ops.losses import l2norm as _norm  # zero-row safe


def _pair_cl(e1, e2, temp, weights):
    """mean over batch of -log(exp(pos/t)/sum_j exp(<e1, e2_j>/t))."""
    pos = jnp.sum(e1 * e2, axis=1) / temp
    logits = jnp.dot(e1, e2.T, preferred_element_type=jnp.float32) / temp
    s = jnp.sum((jax.nn.logsumexp(logits, axis=1) - pos) * weights)
    return s / jnp.maximum(jnp.sum(weights), 1.0)


class DCCF(RecModel):
    name = "DCCF"

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_alpha, n_intents, cen_reg):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        self.n_intents = n_intents
        self.cen_reg = cen_reg
        # sorted layouts for scatter-free adaptive-view reduction (both
        # the u-reduction and the gather VJPs)
        self._perm_u, self._ptr_u = build_segment_transpose(
            graph.u_by_u, num_user)
        self._perm_i, self._ptr_i = build_segment_transpose(
            graph.i_by_u, num_item)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 4)
        return {
            "user_embedding": xavier_normal(ks[0], (self.num_user, self.dim_E)),
            "item_embedding": xavier_normal(ks[1], (self.num_item, self.dim_E)),
            "user_intent": xavier_normal(ks[2], (self.dim_E, self.n_intents)),
            "item_intent": xavier_normal(ks[3], (self.dim_E, self.n_intents)),
        }

    def _adaptive_user_view(self, head_emb_u, tail_emb_i, prev_i):
        """User rows of SparseA @ prev: alpha-weighted item gather."""
        g = self.graph
        h = seg_gather(_norm(head_emb_u), g.u_by_u, self._perm_u, self._ptr_u)
        t = seg_gather(_norm(tail_emb_i), g.i_by_u, self._perm_i, self._ptr_i)
        alpha = (jnp.sum(h * t, axis=1) + 1.0) / 2.0
        msgs = alpha[:, None] * seg_gather(prev_i, g.i_by_u,
                                           self._perm_i, self._ptr_i)
        return seg_sum(msgs, g.u_by_u, self._perm_u, self._ptr_u)

    def forward(self, params: Params):
        eu, ei = params["user_embedding"], params["item_embedding"]
        prev_u, prev_i = eu, ei
        acc_u, acc_i = eu, ei
        views = []  # per layer: (gnn_u, gnn_i, int_u, int_i, gaa_u, iaa_u)
        for _ in range(self.n_layers):
            gnn_u, gnn_i = self.graph.propagate(prev_u, prev_i)
            int_u = jax.nn.softmax(prev_u @ params["user_intent"], axis=1) @ params["user_intent"].T
            int_i = jax.nn.softmax(prev_i @ params["item_intent"], axis=1) @ params["item_intent"].T
            gaa_u = self._adaptive_user_view(gnn_u, gnn_i, prev_i)
            iaa_u = self._adaptive_user_view(int_u, int_i, prev_i)
            views.append((gnn_u, gnn_i, int_u, int_i, gaa_u, iaa_u))
            # item rows of gaa/iaa are zero (reference quirk, see docstring)
            nxt_u = gnn_u + int_u + gaa_u + iaa_u + prev_u
            nxt_i = gnn_i + int_i + prev_i
            acc_u = acc_u + nxt_u
            acc_i = acc_i + nxt_i
            prev_u, prev_i = nxt_u, nxt_i
        return acc_u, acc_i, views

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        w = batch.weights
        acc_u, acc_i, views = self.forward(params)
        u = acc_u[batch.users]
        pos = acc_i[batch.pos_items]
        neg = acc_i[batch.neg_items]
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
        cen = self.cen_reg * (
            jnp.sum(params["user_intent"] ** 2) + jnp.sum(params["item_intent"] ** 2)
        )
        ssl = 0.0
        zeros_i = None
        for gnn_u, gnn_i, int_u, int_i, gaa_u, iaa_u in views:
            bu = batch.users
            bi = batch.pos_items
            ug = _norm(gnn_u[bu])
            ssl = ssl + _pair_cl(ug, _norm(int_u[bu]), self.ssl_temp, w)
            ssl = ssl + _pair_cl(ug, _norm(gaa_u[bu]), self.ssl_temp, w)
            ssl = ssl + _pair_cl(ug, _norm(iaa_u[bu]), self.ssl_temp, w)
            ig = _norm(gnn_i[bi])
            if zeros_i is None:
                zeros_i = jnp.zeros_like(ig)
            ssl = ssl + _pair_cl(ig, _norm(int_i[bi]), self.ssl_temp, w)
            # item rows of gaa/iaa views are zero in the reference; their
            # normalized form is the zero vector -> pos=0, logits=0.
            ssl = ssl + 2.0 * _pair_cl(ig, zeros_i, self.ssl_temp, w)
        return bpr + reg + self.ssl_alpha * ssl + cen

    def embeddings(self, params: Params):
        acc_u, acc_i, _ = self.forward(params)
        return acc_u, acc_i
