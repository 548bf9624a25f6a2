"""POWERec: prompt-enhanced weak-modality negatives.

Reference: Model/POWERec.py. Capabilities reproduced:
- three 4-layer cosine-weighted LayerGCN towers (id / visual / textual)
  sharing the user table; each adds the SUM of its prompt embeddings to
  the users; the id tower passes item *embeddings* through Linear+Tanh,
  modal towers do the same with raw features (Model/POWERec.py:17-54);
- per-epoch alternating random/multinomial U-I edge pruning (LayerGCN
  semantics; training uses the pruned graph, ranking the full one,
  Model/POWERec.py:148-170,255-258);
- weak-modality fake negatives: per-modality score gaps softmaxed, the
  weakest modality's chunk swapped from pos to neg, extra BPR with weight
  neg_weight (Model/POWERec.py:186-231);
- BPR(+1e-5) + mean reg on concat embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.dropout import masked_dense_r
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, cosine_rows, emb_l2_reg


class POWERec(RecModel):
    name = "POWERec"
    tower_layers = 4
    num_modal = 3

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, prompt_num, neg_weight,
                 dropout):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.prompt_num = max(int(prompt_num), 1)
        self.neg_weight = neg_weight
        self.dropout = dropout
        self.v_feat = v_feat
        self.t_feat = t_feat
        self.pruning_random = False
        self.masked_r = graph.dense_r
        self._edge_u = np.asarray(graph.u_by_u)
        self._edge_i = np.asarray(graph.i_by_u)
        self._edge_w = np.asarray(graph.w_by_u, dtype=np.float64)

    def init_params(self, rng: jax.Array) -> Params:
        ks = jax.random.split(rng, 9)
        d = self.dim_E
        p = {
            "user_embeddings": xavier_uniform(ks[0], (self.num_user, d)),
            "item_embeddings": xavier_uniform(ks[1], (self.num_item, d)),
            "id_prompt": xavier_uniform(ks[2], (self.prompt_num, d)),
            "v_prompt": xavier_uniform(ks[3], (self.prompt_num, d)),
            "t_prompt": xavier_uniform(ks[4], (self.prompt_num, d)),
        }
        for name, k, in_dim in [
            ("id_mlp", ks[5], d),
            ("v_mlp", ks[6], self.v_feat.shape[1]),
            ("t_mlp", ks[7], self.t_feat.shape[1]),
        ]:
            w, b = torch_linear_init(k, d, in_dim)
            p[f"{name}_w"], p[f"{name}_b"] = w, b
        return p

    def pre_epoch(self, params, rng, epoch: int) -> None:
        if self.dropout <= 0.0:
            self.masked_r = self.graph.dense_r
            return
        E = self._edge_u.shape[0]
        keep_len = int(E * (1.0 - self.dropout))
        rs = np.random.default_rng(epoch * 52361 + 11)
        if self.pruning_random:
            keep_idx = rs.choice(E, size=keep_len, replace=False)
        else:
            p = self._edge_w / self._edge_w.sum()
            keep_idx = rs.choice(E, size=keep_len, replace=False, p=p)
        self.pruning_random = not self.pruning_random
        mask = np.zeros((E,), np.float32)
        mask[keep_idx] = 1.0
        r, _, _ = masked_dense_r(
            jnp.asarray(self._edge_u), jnp.asarray(self._edge_i),
            jnp.asarray(mask), self.num_user, self.num_item,
        )
        self.masked_r = r

    def forward(self, params: Params, r):
        """All three prompt towers through ONE 3d-wide propagation pair
        per layer: the shared R matmul is columnwise-independent and the
        self-feature cosine gate is applied per tower slice — exactly the
        per-tower results, with one (U, I) operator read per direction
        instead of three."""
        r = r.astype(jnp.float32)
        d = params["user_embeddings"].shape[1]
        xus, xis = [], []
        for prompt_key, mlp_key, item_in in (
            ("id_prompt", "id_mlp", params["item_embeddings"]),
            ("v_prompt", "v_mlp", self.v_feat),
            ("t_prompt", "t_mlp", self.t_feat),
        ):
            prompt = jnp.sum(params[prompt_key], axis=0)
            xus.append(params["user_embeddings"] + prompt[None, :])
            xis.append(jnp.tanh(
                item_in @ params[f"{mlp_key}_w"].T + params[f"{mlp_key}_b"]))
        ego_u = jnp.concatenate(xus, 1)
        ego_i = jnp.concatenate(xis, 1)

        def gate(x, ego):
            cols = []
            for j in range(3):
                s = slice(j * d, (j + 1) * d)
                cols.append(cosine_rows(x[:, s], ego[:, s])[:, None] * x[:, s])
            return jnp.concatenate(cols, 1)

        acc_u, acc_i = ego_u, ego_i
        cu, ci = ego_u, ego_i
        for _ in range(self.tower_layers):
            cu, ci = (
                jnp.dot(r, ci, preferred_element_type=jnp.float32),
                jnp.dot(r.T, cu, preferred_element_type=jnp.float32),
            )
            cu = gate(cu, ego_u)
            ci = gate(ci, ego_i)
            acc_u = acc_u + cu
            acc_i = acc_i + ci
        return acc_u, acc_i

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        fu, fi = self.forward(params, self.masked_r)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        pos_scores = jnp.sum(u * pos, 1)
        neg_scores = jnp.sum(u * neg, 1)
        bpr = bpr_loss(pos_scores, neg_scores, w, eps=1e-5)
        d = self.dim_E
        pos_m = jnp.sum((u * pos).reshape(-1, self.num_modal, d), axis=-1)
        neg_m = jnp.sum((u * neg).reshape(-1, self.num_modal, d), axis=-1)
        indicator = jax.lax.stop_gradient(jax.nn.softmax(pos_m - neg_m, -1))
        weak = (indicator == jnp.min(indicator, axis=-1, keepdims=True)).astype(
            jnp.float32
        )
        weak = jnp.repeat(weak, d, axis=1)  # (B, 3d)
        fake_neg = (1.0 - weak) * pos + weak * neg
        fake_scores = jnp.sum(u * fake_neg, 1)
        weak_loss = bpr_loss(pos_scores, fake_scores, w, eps=1e-5)
        reg = emb_l2_reg(self.reg_weight, (u, pos, neg), w)
        return bpr + self.neg_weight * weak_loss + reg

    def embeddings(self, params: Params):
        return self.forward(params, self.graph.dense_r)
