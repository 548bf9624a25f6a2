"""AdaGCL: adaptive graph contrastive learning with two learned generators.

Reference: Model/AdaGCL.py + the 4-loss/3-optimizer loop
(train_and_evaluate.py:72-97). Capabilities reproduced:
- main branch: plain normalized propagation, sum of layers incl. ego;
- generator 1 (VGAE): mean/std MLP heads over the main forward, edge
  classifier ``sigmoid(dec(x_src * x_dst))``; generated view keeps edges
  with prob >= 0.5 and rescales kept values by total/kept
  (Model/AdaGCL.py:370-505; static shapes via mask weights);
- generator 2 (DenoisingNet): per-layer hard-concrete edge gates
  (gamma=-0.45, zeta=1.05) from attention MLPs over the **frozen initial
  embedding copy** captured at construction (reference quirk kept),
  per-layer renormalization clipped at 10, L0 regularizer with
  lambda0=1e-4 (Model/AdaGCL.py:490-716);
- per-batch updates (AdaGCLTrainer): (1) Adam step on ssl_alpha *
  graphcl(out1, out2); (2) Adam step on ib_reg * (graphcl vs detached
  prior views); (3) Adam step on bpr+reg plus generator losses, with the
  generator sub-optimizers (Adam, gen2 eps=1e-3) applying the same
  gradients again — reproducing the reference's shared-parameter double
  update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.ell import build_segment_transpose, seg_gather, seg_sum
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, emb_l2_reg, l2norm, masked_mean

GAMMA, ZETA = -0.45, 1.05


class AdaGCL(RecModel):
    name = "AdaGCL"
    ib_reg = 0.01
    lambda0 = 1e-4

    def __init__(self, num_user, num_item, graph: BipartiteGraph, dim_E,
                 reg_weight, n_layers, ssl_temp, ssl_alpha, init_rng):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        g = graph
        self.src = jnp.concatenate([g.u_by_u, g.i_by_u + num_user])
        self.dst = jnp.concatenate([g.i_by_u + num_user, g.u_by_u])
        self.w_norm = jnp.concatenate([g.w_by_u, g.w_by_u]).astype(jnp.float32)
        self.n_nodes = num_user + num_item
        # static sorted layouts: every per-view propagation (weights vary,
        # pattern fixed) runs scatter-free in BOTH directions (seg_sum /
        # seg_gather) instead of XLA scatter-add segment_sum
        self.perm_dst, self.ptr_dst = build_segment_transpose(
            self.dst, self.n_nodes)
        self.perm_src, self.ptr_src = build_segment_transpose(
            self.src, self.n_nodes)
        # frozen initial-embedding copy used by the DenoisingNet (quirk)
        k_u, k_i = jax.random.split(init_rng)
        self.frozen_feats = jnp.concatenate(
            [xavier_uniform(k_u, (num_user, dim_E)),
             xavier_uniform(k_i, (num_item, dim_E))], axis=0,
        )

    def init_params(self, rng: jax.Array) -> Params:
        d = self.dim_E
        ks = jax.random.split(rng, 20)
        k_u, k_i = jax.random.split(ks[0])
        p = {
            # identical init stream as the frozen copy
            "uEmbeds": self.frozen_feats[: self.num_user],
            "iEmbeds": self.frozen_feats[self.num_user:],
        }
        for i, name in enumerate(["enc_mean1", "enc_mean2", "enc_std1",
                                  "enc_std2", "dec1", "dec2"]):
            o = 1 if name == "dec2" else d
            w, b = torch_linear_init(ks[1 + i], o, d)
            p[f"g1_{name}_w"], p[f"g1_{name}_b"] = w, b
        for layer in (0, 1):
            for name in ("nb", "self"):
                w, b = torch_linear_init(ks[8 + 2 * layer], d, d)
                p[f"g2_{name}{layer}_w"], p[f"g2_{name}{layer}_b"] = w, b
            w, b = torch_linear_init(ks[12 + layer], 1, 2 * d)
            p[f"g2_att{layer}_w"], p[f"g2_att{layer}_b"] = w, b
        return p

    # ------------- propagation helpers -------------
    def _prop(self, x, w):
        msgs = w[:, None] * seg_gather(x, self.src, self.perm_src,
                                       self.ptr_src)
        return seg_sum(msgs, self.dst, self.perm_dst, self.ptr_dst)

    def forward_graphcl(self, params, w_edges=None):
        x = jnp.concatenate([params["uEmbeds"], params["iEmbeds"]], 0)
        w = self.w_norm if w_edges is None else w_edges
        acc = x
        cur = x
        for _ in range(self.n_layers):
            cur = self._prop(cur, w)
            acc = acc + cur
        return acc

    # ------------- generator 1 (VGAE) -------------
    def _g1_encode(self, params, rng=None):
        x = self.forward_graphcl(params)
        mean = jax.nn.relu(x @ params["g1_enc_mean1_w"].T + params["g1_enc_mean1_b"])
        mean = mean @ params["g1_enc_mean2_w"].T + params["g1_enc_mean2_b"]
        std = jax.nn.relu(x @ params["g1_enc_std1_w"].T + params["g1_enc_std1_b"])
        std = jax.nn.softplus(std @ params["g1_enc_std2_w"].T + params["g1_enc_std2_b"])
        if rng is None:
            return mean, mean, std
        z = mean + std * jax.random.normal(rng, mean.shape)
        return z, mean, std

    def _g1_edge_prob(self, params, x, src_x, dst_x):
        h = jax.nn.relu(src_x * dst_x)
        h = jax.nn.relu(h @ params["g1_dec1_w"].T + params["g1_dec1_b"])
        return jax.nn.sigmoid(h @ params["g1_dec2_w"].T + params["g1_dec2_b"])

    def g1_generate(self, params):
        x, _, _ = self._g1_encode(params)
        prob = self._g1_edge_prob(params, x, x[self.src], x[self.dst])[:, 0]
        keep = (prob >= 0.5).astype(jnp.float32)
        total = float(self.src.shape[0])
        scale = total / jnp.maximum(jnp.sum(keep), 1.0)
        return jax.lax.stop_gradient(self.w_norm * keep * scale)

    def g1_loss(self, params, batch, rng):
        z, mean, std = self._g1_encode(params, rng)
        zu, zi = z[: self.num_user], z[self.num_user:]
        u = zu[batch.users]
        pos = zi[batch.pos_items]
        neg = zi[batch.neg_items]
        w = batch.weights
        pos_pred = self._g1_edge_prob(params, z, u, pos)[:, 0]
        neg_pred = self._g1_edge_prob(params, z, u, neg)[:, 0]
        rec = -jnp.log(pos_pred + 1e-8) - jnp.log(1 - neg_pred + 1e-8)
        kl = -0.5 * jnp.sum(1 + 2 * jnp.log(std + 1e-8) - mean ** 2 - std ** 2, 1)
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        enc_reg = self.reg_weight * sum(
            jnp.sum(params[k] ** 2) for k in params if k.startswith("g1_enc")
        )
        return masked_mean(rec, w) + 0.1 * jnp.mean(kl) + bpr + enc_reg

    # ------------- generator 2 (DenoisingNet) -------------
    def _g2_gate(self, params, x, layer, rng=None, beta=1.0):
        # seg_gather: the cotangent wrt x is a scatter-free seg_sum
        # (g2_loss differentiates through the layer-1 gate input)
        f1 = jax.nn.relu(
            seg_gather(x, self.src, self.perm_src, self.ptr_src)
            @ params[f"g2_nb{layer}_w"].T + params[f"g2_nb{layer}_b"])
        f2 = jax.nn.relu(
            seg_gather(x, self.dst, self.perm_dst, self.ptr_dst)
            @ params[f"g2_self{layer}_w"].T + params[f"g2_self{layer}_b"])
        log_alpha = (jnp.concatenate([f1, f2], 1) @ params[f"g2_att{layer}_w"].T
                     + params[f"g2_att{layer}_b"])[:, 0]
        if rng is not None:
            u = jax.random.uniform(rng, log_alpha.shape, minval=1e-7,
                                   maxval=1 - 1e-7)
            gate = jax.nn.sigmoid(
                (jnp.log(u) - jnp.log(1 - u) + log_alpha) / beta
            )
        else:
            gate = jax.nn.sigmoid(log_alpha)
        mask = jnp.clip(gate * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)
        return mask, log_alpha

    def _g2_renorm(self, mask):
        # Scalar NON-NEGATIVE degree sums stay on segment_sum: the
        # prefix-sum trick's absolute error scales with the GLOBAL
        # running total (~ulp(sum of all masks) per segment — ~0.1 at
        # netfilx scale), which is unacceptable inside d ** -0.5. A
        # scalar scatter-add of E values is cheap; only the (E, D)
        # message reductions (zero-mean values, random-walk totals) ride
        # the scatter-free path.
        d = jax.ops.segment_sum(mask, self.dst,
                                num_segments=self.n_nodes) + 1e-6
        dis = jnp.clip(d ** -0.5, 0.0, 10.0)
        return mask * dis[self.src] * dis[self.dst]

    def g2_view_weights(self, params, x_layers):
        """Per-layer edge weights from current embeds (no_grad path)."""
        ws = []
        for layer, x in enumerate(x_layers):
            mask, _ = self._g2_gate(params, x, layer)
            ws.append(jax.lax.stop_gradient(self._g2_renorm(mask)))
        return ws

    def forward_graphcl_g2(self, params):
        x = jnp.concatenate([params["uEmbeds"], params["iEmbeds"]], 0)
        acc = x
        cur = x
        for layer in range(self.n_layers):
            mask, _ = self._g2_gate(params, jax.lax.stop_gradient(cur),
                                    min(layer, 1))
            w = jax.lax.stop_gradient(self._g2_renorm(mask))
            cur = self._prop(cur, w)
            acc = acc + cur
        return acc

    def g2_loss(self, params, batch, rng):
        temperature = self.ssl_temp
        x = self.frozen_feats
        acc = x
        cur = x
        l0 = 0.0
        ks = jax.random.split(rng, self.n_layers)
        for layer in range(self.n_layers):
            li = min(layer, 1)
            mask, log_alpha = self._g2_gate(params, cur, li, ks[layer],
                                            beta=temperature)
            w = self._g2_renorm(mask)
            cur = self._prop(cur, w)
            acc = acc + cur
            l0 = l0 + jnp.mean(jax.nn.sigmoid(
                log_alpha - temperature * jnp.log(-GAMMA / ZETA)
            ))
        xu, xi = acc[: self.num_user], acc[self.num_user:]
        u = xu[batch.users]
        pos = xi[batch.pos_items]
        neg = xi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * sum(
            jnp.sum(params[k] ** 2) for k in params if k.startswith("g2_")
        )
        return bpr + reg + self.lambda0 * l0

    # ------------- contrastive -------------
    def loss_graphcl(self, x1, x2, users, items, weights):
        U = self.num_user
        e1 = jnp.concatenate([l2norm(x1[:U])[users], l2norm(x1[U:])[items]], 0)
        e2 = jnp.concatenate([l2norm(x2[:U])[users], l2norm(x2[U:])[items]], 0)
        n1 = jnp.sqrt(jnp.sum(e1 ** 2, 1) + 1e-12)
        n2 = jnp.sqrt(jnp.sum(e2 ** 2, 1) + 1e-12)
        sim = jnp.exp(
            (e1 @ e2.T) / (n1[:, None] * n2[None, :]) / self.ssl_temp
        )
        pos = jnp.diagonal(sim)
        w2 = jnp.concatenate([weights, weights])
        per_row = -jnp.log(pos / jnp.maximum(sim.sum(1) - pos, 1e-12) + 1e-12)
        return jnp.sum(per_row * w2) / jnp.maximum(jnp.sum(w2), 1.0)

    # standard-protocol stubs (the custom trainer drives the real steps)
    def loss(self, params, batch, rng):
        raise NotImplementedError("AdaGCL uses AdaGCLTrainer")

    def embeddings(self, params: Params):
        x = self.forward_graphcl(params)
        return x[: self.num_user], x[self.num_user:]


def generator_labels(model, prefix: str):
    """optax.multi_transform label tree: "g" for params whose top-level
    key starts with ``prefix``, "f" otherwise (the reference's
    per-generator optimizers act on disjoint param groups)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "g" if str(path[0].key).startswith(prefix) else "f",
        model.init_params(jax.random.PRNGKey(0)),
    )


def alternating_step(model, opt, opt_g1, opt_g2,
                     params, o, o1, o2, batch, k1, k2):
    """One AdaGCL 3-loss / 3-optimizer alternating step
    (train_and_evaluate.py:72-97) — THE single definition, shared by the
    whole-epoch scan trainer below and the sharded per-batch step
    (parallel/mesh.py), so the parity-critical loss sequence cannot
    drift between the two paths."""
    w = batch.weights

    def loss1(pp):
        w1 = model.g1_generate(pp)
        out1 = model.forward_graphcl(pp, w1)
        out2 = model.forward_graphcl_g2(pp)
        l = model.ssl_alpha * model.loss_graphcl(
            out1, out2, batch.users, batch.pos_items, w)
        return l, (out1, out2)

    (l1, (out1, out2)), g = jax.value_and_grad(loss1, has_aux=True)(params)
    upd, o = opt.update(g, o, params)
    params = optax.apply_updates(params, upd)

    def loss2(pp):
        w1 = model.g1_generate(pp)
        v1 = model.forward_graphcl(pp, w1)
        v2 = model.forward_graphcl_g2(pp)
        det1 = jax.lax.stop_gradient(out1)
        det2 = jax.lax.stop_gradient(out2)
        return model.ib_reg * (
            model.loss_graphcl(v1, det1, batch.users, batch.pos_items, w)
            + model.loss_graphcl(v2, det2, batch.users, batch.pos_items, w)
        )

    l2, g = jax.value_and_grad(loss2)(params)
    upd, o = opt.update(g, o, params)
    params = optax.apply_updates(params, upd)

    def loss3(pp):
        x = model.forward_graphcl(pp)
        xu, xi = x[: model.num_user], x[model.num_user:]
        uu = xu[batch.users]
        ppos = xi[batch.pos_items]
        nneg = xi[batch.neg_items]
        bpr = bpr_loss(jnp.sum(uu * ppos, 1), jnp.sum(uu * nneg, 1),
                       w, eps=1e-5)
        reg = emb_l2_reg(
            model.reg_weight,
            (pp["uEmbeds"][batch.users],
             pp["iEmbeds"][batch.pos_items],
             pp["iEmbeds"][batch.neg_items]), w)
        gen = model.g1_loss(pp, batch, k1) + model.g2_loss(pp, batch, k2)
        return bpr + reg + gen

    l3, g = jax.value_and_grad(loss3)(params)
    upd, o = opt.update(g, o, params)
    params = optax.apply_updates(params, upd)
    upd, o1 = opt_g1.update(g, o1, params)
    params = optax.apply_updates(params, upd)
    upd, o2 = opt_g2.update(g, o2, params)
    params = optax.apply_updates(params, upd)
    return params, o, o1, o2, l1 + l2 + l3


class AdaGCLTrainer:
    """4-loss / 3-optimizer alternating loop (train_and_evaluate.py:72-97)."""

    def __init__(self, model, dataset, cfg, optimizer=None):
        from chaorec_tpu.train.loop import Trainer

        self._base = Trainer(model, dataset, cfg)
        base = self._base
        num_item = dataset.num_item
        # Same co-residency guard as GradeTrainer: AdaGCL/netfilx
        # (E=259280) faulted the worker; AdaGCL/beauty (E=93413) is fine.
        if dataset.train_edges.shape[0] >= 120_000:
            model.serialize_device = True

        opt = optax.adam(cfg.learning_rate)
        opt_g1 = optax.multi_transform(
            {"g": optax.adam(cfg.learning_rate), "f": optax.set_to_zero()},
            generator_labels(model, "g1_"),
        )
        opt_g2 = optax.multi_transform(
            {"g": optax.adam(cfg.learning_rate, eps=1e-3),
             "f": optax.set_to_zero()},
            generator_labels(model, "g2_"),
        )
        from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
        from chaorec_tpu.train.loop import dispatch_chunked

        def chunk_fn(model, params, opts, rng, users, pos, weights, history):
            o, o1, o2 = opts

            def step(carry, xs):
                params, o, o1, o2, rng = carry
                u, p, w = xs
                rng, k_neg, k1, k2, k3 = jax.random.split(rng, 5)
                neg = sample_negatives(k_neg, u, history, num_item,
                                       cfg.neg_candidates)
                batch = Batch(u, p, neg, w)
                params, o, o1, o2, loss = alternating_step(
                    model, opt, opt_g1, opt_g2,
                    params, o, o1, o2, batch, k1, k2)
                return (params, o, o1, o2, rng), loss

            (params, o, o1, o2, rng), losses = jax.lax.scan(
                step, (params, o, o1, o2, rng), (users, pos, weights)
            )
            return params, (o, o1, o2), rng, jnp.sum(losses)

        jit_chunk = jax.jit(chunk_fn, donate_argnums=(1, 2))
        jit_shuffle = jax.jit(make_epoch_batches, static_argnums=(2,))
        # Per-program execution budget (see grade.py GradeTrainer and
        # train/loop.py dispatch_chunked): whole-epoch programs at
        # E>=120k run past the worker's limit and kill it.
        chunk = cfg.max_dispatch_batches or (
            64 if dataset.train_edges.shape[0] >= 120_000 else 0)
        self._opts = None

        def train_epoch(params, opt_state, rng, epoch_idx):
            if self._opts is None:
                self._opts = (opt.init(params), opt_g1.init(params),
                              opt_g2.init(params))
            rng, k_shuf = jax.random.split(rng)
            users, pos, weights, _ = jit_shuffle(k_shuf, base.edges,
                                                 cfg.batch_size)
            params, self._opts, rng, loss = dispatch_chunked(
                jit_chunk, base.model, params, self._opts, rng,
                (users, pos, weights), base.history, chunk)
            return params, opt_state, rng, loss

        base.train_epoch = train_epoch

    def run(self):
        return self._base.run()


AdaGCL.trainer_cls = AdaGCLTrainer
