"""COHESION: tri-branch dual-stage fusion with adaptive optimization.

Reference: Model/COHESION.py (the repository's default CLI model).
Capabilities reproduced:
- three GCNLayer towers (id / visual / textual): per tower a trainable
  user preference table, item features fused as
  ``sqrt(|(id^2 + mlp(feat)^2)/2| + 1e-8)``, row-normalized, LayerGCN-style
  cosine-weighted layers summed incl. ego (Model/COHESION.py:13-45);
- the id tower's output is **detached** (``id_rep.data``,
  Model/COHESION.py:319-325) so its MLP/preference train only through the
  modality towers' use of id_feat;
- user rep = concat of the three towers' user parts (U, 3d); item rep =
  concat of tower item parts; item side += mm_adj^mm_layers (frozen 1/k
  kNN mix, FREEDOM-style); user side += user-graph aggregation with k=40
  per-epoch resampled co-occurrence neighbors (Model/COHESION.py:336-353);
- per-epoch degree-weighted U-I edge pruning (dropout) like FREEDOM
  (Model/COHESION.py:469-483 region);
- adaptive optimization: per-modality-chunk score softmax ->
  ``1 - softmax`` detached reweighting of the score dims
  (Model/COHESION.py:356-364);
- loss = -mean(log2(sigmoid(pos - neg))) [log base 2 quirk] + reg_weight *
  (mean v_pref[u]^2 + mean t_pref[u]^2 + mean weight_u^2)
  (Model/COHESION.py:366-380).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.dropout import masked_dense_r
from chaorec_tpu.graphs.knn import ELLGraph, build_knn_graph, gather_weighted_sum
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.graphs.user_graph import build_user_cooccurrence, topk_sample
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.mxu import bdot
from chaorec_tpu.ops.init import torch_linear_init, xavier_normal
from chaorec_tpu.ops.losses import cosine_rows, l2norm, masked_mean


class COHESION(RecModel):
    name = "COHESION"
    uu_k = 40  # Model/COHESION.py:83

    def __init__(self, num_user, num_item, graph: BipartiteGraph, edges,
                 v_feat, t_feat, dim_E, reg_weight, dropout, n_layers,
                 mm_layers, ii_topk, mm_image_weight):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_latent = dim_E
        self.reg_weight = reg_weight
        self.dropout = dropout
        self.num_layer = n_layers
        self.mm_layers = mm_layers
        self.v_feat = v_feat
        self.t_feat = t_feat
        gv = build_knn_graph(v_feat, ii_topk, norm="ref_laplacian")
        gt = build_knn_graph(t_feat, ii_topk, norm="ref_laplacian")
        self.mm_graph = ELLGraph(
            jnp.concatenate([gv.indices, gt.indices], axis=1),
            jnp.concatenate(
                [mm_image_weight * gv.weights, (1 - mm_image_weight) * gt.weights], 1
            ),
        )
        uu_idx, uu_cnt, uu_len = build_user_cooccurrence(
            np.asarray(edges), num_user, num_item
        )
        self._uu = (uu_idx, uu_cnt, uu_len)
        rs = np.random.default_rng(0)
        idx, w = topk_sample(uu_idx, uu_cnt, uu_len, self.uu_k, rs)
        self.user_nbr_idx = jnp.asarray(idx)
        self.user_nbr_w = jnp.asarray(w)
        self.masked_r = graph.dense_r
        self._edge_u = np.asarray(graph.u_by_u)
        self._edge_i = np.asarray(graph.i_by_u)
        self._edge_w = np.asarray(graph.w_by_u, dtype=np.float64)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 12)
        d = self.dim_latent
        p = {
            "id_feat": xavier_normal(ks[0], (self.num_item, d)),
            "weight_u": jax.nn.softmax(
                xavier_normal(ks[1], (self.num_user, 2, 1)), axis=1
            ),
        }
        for i, (mod, in_dim) in enumerate(
            [("id", d), ("v", self.v_feat.shape[1]), ("t", self.t_feat.shape[1])]
        ):
            p[f"{mod}_preference"] = xavier_normal(
                ks[2 + i], (self.num_user, d)
            )
            w1, b1 = torch_linear_init(ks[5 + 2 * i], 4 * d, in_dim)
            w2, b2 = torch_linear_init(ks[6 + 2 * i], d, 4 * d)
            p[f"{mod}_mlp_w1"], p[f"{mod}_mlp_b1"] = w1, b1
            p[f"{mod}_mlp_w2"], p[f"{mod}_mlp_b2"] = w2, b2
        return p

    def pre_epoch(self, params, rng, epoch: int) -> None:
        rs = np.random.default_rng(epoch * 92821 + 3)
        idx, w = topk_sample(*self._uu, self.uu_k, rs)
        self.user_nbr_idx = jnp.asarray(idx)
        self.user_nbr_w = jnp.asarray(w)
        if self.dropout <= 0.0:
            self.masked_r = self.graph.dense_r
            return
        E = self._edge_u.shape[0]
        keep_len = int(E * (1.0 - self.dropout))
        # degree-weighted without-replacement keep as an on-device Gumbel
        # top-k — identical distribution to np.random.choice(p,
        # replace=False); see FREEDOM.pre_epoch
        key = jax.random.fold_in(jax.random.PRNGKey(92821), epoch)
        scores = jnp.log(jnp.asarray(self._edge_w, jnp.float32)) + \
            jax.random.gumbel(key, (E,))
        keep_idx = jax.lax.top_k(scores, keep_len)[1]
        mask = jnp.zeros((E,), jnp.float32).at[keep_idx].set(1.0)
        r, _, _ = masked_dense_r(
            jnp.asarray(self._edge_u), jnp.asarray(self._edge_i),
            mask, self.num_user, self.num_item,
        )
        self.masked_r = r

    def _tower_input(self, params, mod, feat):
        tf = jax.nn.leaky_relu(
            feat @ params[f"{mod}_mlp_w1"].T + params[f"{mod}_mlp_b1"], 0.01
        )
        tf = tf @ params[f"{mod}_mlp_w2"].T + params[f"{mod}_mlp_b2"]
        idf = params["id_feat"]
        tf = jnp.sqrt(jnp.abs((idf * idf + tf * tf) / 2.0) + 1e-8)
        return l2norm(jnp.concatenate([params[f"{mod}_preference"], tf], axis=0))

    def _towers(self, params):
        """All three towers batched along the feature axis: the per-layer
        adjacency matmuls read the (U, I) matrix ONCE for id+v+t instead
        of three times (the towers share ``masked_r`` and the epoch is
        HBM-bound on it); the cosine layer-weighting is computed per
        d-block so the split results equal the per-tower ones exactly."""
        d = self.dim_latent
        x = jnp.concatenate(
            [self._tower_input(params, "id", params["id_feat"]),
             self._tower_input(params, "v", self.v_feat),
             self._tower_input(params, "t", self.t_feat)], axis=1)
        r = self.masked_r
        cu, ci = x[: self.num_user], x[self.num_user:]
        acc_u, acc_i = cu, ci
        ego_u, ego_i = cu, ci

        def block_cosine(a, b, n):
            # == cosine_rows per d-block (same safe_norm eps semantics)
            a3 = a.reshape(n, 3, d)
            b3 = b.reshape(n, 3, d)
            return cosine_rows(a3, b3)[:, :, None]  # (n, 3, 1)

        for _ in range(self.num_layer):
            cu, ci = (
                bdot(r, ci),
                bdot(r.T, cu),
            )
            wu = block_cosine(cu, ego_u, self.num_user)
            wi = block_cosine(ci, ego_i, self.num_item)
            cu = (cu.reshape(-1, 3, d) * wu).reshape(-1, 3 * d)
            ci = (ci.reshape(-1, 3, d) * wi).reshape(-1, 3 * d)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        return acc_u, acc_i

    def forward(self, params: Params):
        d = self.dim_latent
        acc_u, acc_i = self._towers(params)
        # id tower detached (reference id_rep.data, Model/COHESION.py:319-325)
        id_u = jax.lax.stop_gradient(acc_u[:, :d])
        id_i = jax.lax.stop_gradient(acc_i[:, :d])
        user_rep = jnp.concatenate([id_u, acc_u[:, d:]], axis=1)  # (U, 3d)
        item_rep = jnp.concatenate([id_i, acc_i[:, d:]], axis=1)
        h_i = item_rep
        for _ in range(self.mm_layers):
            h_i = self.mm_graph.propagate(h_i)
        h_u = gather_weighted_sum(user_rep, self.user_nbr_w,
                                  self.user_nbr_idx)
        return user_rep + h_u, item_rep + h_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        # The tower propagation needs the full graph, but the user-graph
        # and mm-graph aggregations are per-row independent: compute them
        # only for the batch rows instead of all U (40-neighbor) and all I
        # (2k-neighbor) rows — identical math to forward()+gather, ~2x on
        # the sports epoch.
        user_rep, item_rep = self._towers(params)
        user_rep = jnp.concatenate(
            [jax.lax.stop_gradient(user_rep[:, : self.dim_latent]),
             user_rep[:, self.dim_latent:]], axis=1)
        item_rep = jnp.concatenate(
            [jax.lax.stop_gradient(item_rep[:, : self.dim_latent]),
             item_rep[:, self.dim_latent:]], axis=1)
        bu = batch.users
        u = user_rep[bu] + gather_weighted_sum(
            user_rep, self.user_nbr_w[bu], self.user_nbr_idx[bu])
        items2 = jnp.concatenate([batch.pos_items, batch.neg_items])
        if self.mm_layers == 1:
            h_rows = gather_weighted_sum(
                item_rep, self.mm_graph.weights[items2],
                self.mm_graph.indices[items2])
        else:
            h = item_rep
            for _ in range(self.mm_layers):
                h = self.mm_graph.propagate(h)
            h_rows = h[items2]
        both = item_rep[items2] + h_rows
        b = batch.pos_items.shape[0]
        pos, neg = both[:b], both[b:]
        w = batch.weights
        d = self.dim_latent
        pos_m = jnp.sum((u * pos).reshape(-1, 3, d), axis=-1)  # (B, 3)
        neg_m = jnp.sum((u * neg).reshape(-1, 3, d), axis=-1)
        indicator = jax.lax.stop_gradient(
            1.0 - jax.nn.softmax(pos_m - neg_m, axis=-1)
        )
        aw = jnp.repeat(indicator, d, axis=1)  # (B, 3d)
        pos_scores = jnp.sum(u * pos * aw, axis=1)
        neg_scores = jnp.sum(u * neg * aw, axis=1)
        # log2 quirk (Model/COHESION.py:372)
        bpr = -masked_mean(
            jnp.log2(jax.nn.sigmoid(pos_scores - neg_scores) + 1e-12), w
        )
        reg = self.reg_weight * (
            masked_mean(jnp.mean(params["v_preference"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["t_preference"][batch.users] ** 2, 1), w)
            + jnp.mean(params["weight_u"] ** 2)
        )
        return bpr + reg

    def embeddings(self, params: Params):
        return self.forward(params)
