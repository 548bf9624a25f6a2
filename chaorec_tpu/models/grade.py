"""Grade: multi-generator graph augmentation with noise-denoised modal views.

Reference: Model/Grade.py + the 3-generator loop
(train_and_evaluate.py:259-284). Capabilities reproduced:
- towers: id (uEmbeds; items + mm-graph boost), visual (uvEmbeds +
  projected frozen features + mm boost), textual (utEmbeds + ...);
  propagation = sum of layers incl. ego on the normalized adjacency
  (Model/Grade.py:329-414);
- three VGAE generators (one per tower): mean/std MLP heads over the
  tower forward, edge classifier sigmoid(dec(x_src*x_dst)); generated
  views keep edges with pred >= 0.5 weighted by the prediction, then
  D^-1/2 renormalize (Model/Grade.py:107-152; static masks);
- loss_1 = ssl_alpha * (CL(id_view, v_view) + CL(id_view, t_view)) at
  ssl_temp + noise_alpha * CL(modal_view, noise-perturbed modal forward
  over the id view) at ssl_temp2 (per-forward uniform noise / sqrt(d)
  added after every layer; Model/Grade.py:386-487);
- bpr_reg_loss on the main forward + 5-term mean reg; gen_loss = 3 VGAE
  losses (BCE rec + 0.1 KL + BPR + encoder reg);
- trainer: Adam step on loss_1, Adam step on bpr_reg, generator-only
  Adam steps on gen_loss (train_and_evaluate.py:259-284).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from chaorec_tpu.graphs.knn import ELLGraph, build_knn_graph
from chaorec_tpu.graphs.norm_adj import BipartiteGraph
from chaorec_tpu.models.base import Batch, Params, RecModel
from chaorec_tpu.ops.init import torch_linear_init, xavier_uniform
from chaorec_tpu.ops.losses import bpr_loss, l2norm, masked_mean


class Grade(RecModel):
    name = "Grade"
    knn_k = 10
    mm_image_weight = 0.5
    mm_layers = 1

    def __init__(self, num_user, num_item, graph: BipartiteGraph, v_feat,
                 t_feat, dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha,
                 ssl_temp2, noise_alpha):
        super().__init__(num_user, num_item)
        self.graph = graph
        self.dim_E = dim_E
        self.reg_weight = reg_weight
        self.n_layers = n_layers
        self.ssl_temp = ssl_temp
        self.ssl_alpha = ssl_alpha
        self.ssl_temp2 = ssl_temp2
        self.noise_alpha = noise_alpha
        self.v_feat = v_feat  # frozen
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
        g = graph
        self.src = jnp.concatenate([g.u_by_u, g.i_by_u + num_user])
        self.dst = jnp.concatenate([g.i_by_u + num_user, g.u_by_u])
        self.w_norm = jnp.concatenate([g.w_by_u, g.w_by_u]).astype(jnp.float32)
        from chaorec_tpu.ops.ell import build_segment_transpose

        # sorted layouts: per-view propagation (weights vary, pattern
        # fixed) runs scatter-free in both directions — see AdaGCL
        n_nodes = num_user + num_item
        self.perm_dst, self.ptr_dst = build_segment_transpose(
            self.dst, n_nodes)
        self.perm_src, self.ptr_src = build_segment_transpose(
            self.src, n_nodes)
        self.n_nodes = num_user + num_item

    def init_params(self, rng: jax.Array) -> Params:
        d = self.dim_E
        ks = jax.random.split(rng, 24)
        p = {
            "uEmbeds": xavier_uniform(ks[0], (self.num_user, d)),
            "uvEmbeds": xavier_uniform(ks[1], (self.num_user, d)),
            "utEmbeds": xavier_uniform(ks[2], (self.num_user, d)),
            "iEmbeds": xavier_uniform(ks[3], (self.num_item, d)),
        }
        vw, vb = torch_linear_init(ks[4], d, self.v_feat.shape[1])
        tw, tb = torch_linear_init(ks[5], d, self.t_feat.shape[1])
        p.update(image_trs_w=vw, image_trs_b=vb, text_trs_w=tw, text_trs_b=tb)
        for gi in (1, 2, 3):
            for j, name in enumerate(["enc_mean1", "enc_mean2", "enc_std1",
                                      "enc_std2", "dec1", "dec2"]):
                o = 1 if name == "dec2" else d
                w, b = torch_linear_init(ks[5 + gi * 6 + j - 5], o, d)
                p[f"g{gi}_{name}_w"], p[f"g{gi}_{name}_b"] = w, b
        return p

    # ------------ propagation helpers ------------
    def _prop(self, x, w=None):
        from chaorec_tpu.ops.ell import seg_gather, seg_sum

        w = self.w_norm if w is None else w
        msgs = w[:, None] * seg_gather(x, self.src, self.perm_src,
                                       self.ptr_src)
        return seg_sum(msgs, self.dst, self.perm_dst, self.ptr_dst)

    def _stack(self, x0, w=None, noise=None):
        acc = x0
        cur = x0
        for _ in range(self.n_layers):
            cur = self._prop(cur, w)
            if noise is not None:
                cur = cur + noise / jnp.sqrt(float(x0.shape[1]))
            acc = acc + cur
        return acc

    def _mm(self, h):
        for _ in range(self.mm_layers):
            h = self.mm_graph.propagate(h)
        return h

    def _tower_x0(self, params, mode, with_mm=True):
        if mode == "id":
            items = params["iEmbeds"]
            users = params["uEmbeds"]
        elif mode == "v":
            items = self.v_feat @ params["image_trs_w"].T + params["image_trs_b"]
            users = params["uvEmbeds"]
        else:
            items = self.t_feat @ params["text_trs_w"].T + params["text_trs_b"]
            users = params["utEmbeds"]
        if with_mm:
            items = items + self._mm(items)
        return jnp.concatenate([users, items], 0)

    def forward_gcn(self, params):
        h = self._mm(params["iEmbeds"])
        x = jnp.concatenate([params["uEmbeds"], params["iEmbeds"]], 0)
        out = self._stack(x)
        return out[: self.num_user], out[self.num_user:] + h

    # ------------ VGAE generators ------------
    def _encode(self, params, gi, mode, rng=None):
        x = self._stack(self._tower_x0(params, mode))
        mean = jax.nn.relu(x @ params[f"g{gi}_enc_mean1_w"].T
                           + params[f"g{gi}_enc_mean1_b"])
        mean = mean @ params[f"g{gi}_enc_mean2_w"].T + params[f"g{gi}_enc_mean2_b"]
        std = jax.nn.relu(x @ params[f"g{gi}_enc_std1_w"].T
                          + params[f"g{gi}_enc_std1_b"])
        std = jax.nn.softplus(std @ params[f"g{gi}_enc_std2_w"].T
                              + params[f"g{gi}_enc_std2_b"])
        if rng is None:
            return mean, mean, std
        return mean + std * jax.random.normal(rng, mean.shape), mean, std

    def _edge_prob(self, params, gi, a, b):
        h = jax.nn.relu(a * b)
        h = jax.nn.relu(h @ params[f"g{gi}_dec1_w"].T + params[f"g{gi}_dec1_b"])
        return jax.nn.sigmoid(h @ params[f"g{gi}_dec2_w"].T
                              + params[f"g{gi}_dec2_b"])[:, 0]

    def _generate_view(self, params, gi, mode):
        x, _, _ = self._encode(params, gi, mode)
        pred = self._edge_prob(params, gi, x[self.src], x[self.dst])
        keep = (pred >= 0.5).astype(jnp.float32)
        vals = pred * keep
        d = jax.ops.segment_sum(vals, self.dst, num_segments=self.n_nodes)
        dis = (d + 1e-7) ** -0.5
        return jax.lax.stop_gradient(vals * dis[self.src] * dis[self.dst])

    def _gen_loss(self, params, gi, mode, batch, rng):
        z, mean, std = self._encode(params, gi, mode, rng)
        U = self.num_user
        u = z[:U][batch.users]
        pos = z[U:][batch.pos_items]
        neg = z[U:][batch.neg_items]
        w = batch.weights
        pos_pred = self._edge_prob(params, gi, u, pos)
        neg_pred = self._edge_prob(params, gi, u, neg)
        rec = -jnp.log(pos_pred + 1e-8) - jnp.log(1 - neg_pred + 1e-8)
        kl = -0.5 * jnp.sum(1 + 2 * jnp.log(std + 1e-8) - mean ** 2 - std ** 2, 1)
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * sum(
            jnp.sum(params[k] ** 2) for k in params
            if k.startswith(f"g{gi}_enc")
        )
        return masked_mean(rec, w) + 0.1 * jnp.mean(kl) + bpr + reg

    # ------------ contrastive ------------
    def loss_graphcl(self, x1, x2, users, items, temp, weights):
        U = self.num_user
        e1 = jnp.concatenate([l2norm(x1[:U])[users], l2norm(x1[U:])[items]], 0)
        e2 = jnp.concatenate([l2norm(x2[:U])[users], l2norm(x2[U:])[items]], 0)
        n1 = jnp.sqrt(jnp.sum(e1 ** 2, 1) + 1e-12)
        n2 = jnp.sqrt(jnp.sum(e2 ** 2, 1) + 1e-12)
        sim = jnp.exp((e1 @ e2.T) / (n1[:, None] * n2[None, :]) / temp)
        pos = jnp.diagonal(sim)
        w2 = jnp.concatenate([weights, weights])
        row = -jnp.log(pos / jnp.maximum(sim.sum(1) - pos, 1e-12) + 1e-12)
        return jnp.sum(row * w2) / jnp.maximum(jnp.sum(w2), 1.0)

    # ------------ trainer-facing losses ------------
    def loss_1(self, params, batch, rng):
        k_nv, k_nt = jax.random.split(rng)
        w1 = self._generate_view(params, 1, "id")
        w2 = self._generate_view(params, 2, "v")
        w3 = self._generate_view(params, 3, "t")
        out1 = self._stack(self._tower_x0(params, "id"), w1)
        out2 = self._stack(self._tower_x0(params, "v"), w2)
        out3 = self._stack(self._tower_x0(params, "t"), w3)
        bu, bi, w = batch.users, batch.pos_items, batch.weights
        loss = self.ssl_alpha * (
            self.loss_graphcl(out1, out2, bu, bi, self.ssl_temp, w)
            + self.loss_graphcl(out1, out3, bu, bi, self.ssl_temp, w)
        )
        noise_v = self._stack(
            self._tower_x0(params, "v", with_mm=False), w1,
            noise=jax.random.uniform(k_nv, (self.n_nodes, self.dim_E)),
        )
        noise_t = self._stack(
            self._tower_x0(params, "t", with_mm=False), w1,
            noise=jax.random.uniform(k_nt, (self.n_nodes, self.dim_E)),
        )
        loss = loss + self.noise_alpha * (
            self.loss_graphcl(out2, noise_v, bu, bi, self.ssl_temp2, w)
            + self.loss_graphcl(out3, noise_t, bu, bi, self.ssl_temp2, w)
        )
        return loss

    def bpr_reg_loss(self, params, batch):
        fu, fi = self.forward_gcn(params)
        u = fu[batch.users]
        pos = fi[batch.pos_items]
        neg = fi[batch.neg_items]
        w = batch.weights
        bpr = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), w, eps=1e-5)
        reg = self.reg_weight * (
            masked_mean(jnp.mean(params["uEmbeds"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["iEmbeds"][batch.pos_items] ** 2, 1), w)
            + masked_mean(jnp.mean(params["iEmbeds"][batch.neg_items] ** 2, 1), w)
            + masked_mean(jnp.mean(params["utEmbeds"][batch.users] ** 2, 1), w)
            + masked_mean(jnp.mean(params["uvEmbeds"][batch.users] ** 2, 1), w)
        )
        return bpr + reg

    def gen_loss(self, params, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        return (self._gen_loss(params, 1, "id", batch, k1)
                + self._gen_loss(params, 2, "v", batch, k2)
                + self._gen_loss(params, 3, "t", batch, k3))

    def loss(self, params, batch, rng):
        raise NotImplementedError("Grade uses GradeTrainer")

    def embeddings(self, params: Params):
        return self.forward_gcn(params)


def grade_step(model, opt, opt_gens, params, o, gens, batch, k1, k3):
    """One GRADE 3-loss / 4-optimizer step (train_and_evaluate.py:
    259-284) — THE single definition, shared by the whole-epoch scan
    trainer below and the sharded per-batch step (parallel/mesh.py)."""
    o1, o2, o3 = gens
    l1, g = jax.value_and_grad(model.loss_1)(params, batch, k1)
    upd, o = opt.update(g, o, params)
    params = optax.apply_updates(params, upd)
    l2, g = jax.value_and_grad(model.bpr_reg_loss)(params, batch)
    upd, o = opt.update(g, o, params)
    params = optax.apply_updates(params, upd)
    l3, g = jax.value_and_grad(model.gen_loss)(params, batch, k3)
    upd, o1 = opt_gens[0].update(g, o1, params)
    params = optax.apply_updates(params, upd)
    upd, o2 = opt_gens[1].update(g, o2, params)
    params = optax.apply_updates(params, upd)
    upd, o3 = opt_gens[2].update(g, o3, params)
    params = optax.apply_updates(params, upd)
    return params, o, (o1, o2, o3), l1 + l2 + l3


class GradeTrainer:
    """3-step loop: main Adam on loss_1, main Adam on bpr_reg, generator
    Adams on gen_loss (train_and_evaluate.py:259-284)."""

    def __init__(self, model, dataset, cfg, optimizer=None):
        from chaorec_tpu.train.loop import Trainer

        self._base = Trainer(model, dataset, cfg)
        base = self._base
        num_item = dataset.num_item
        # Co-residency guard: at >=1.2e5 training edges the tri-generator
        # epoch program + fused eval dispatched back-to-back fault the TPU
        # worker (each passes alone — parity_logs/grade_crash_probe.txt).
        # Crash seen at E=158554 (sports); E=93413 (beauty) is fine.
        if dataset.train_edges.shape[0] >= 120_000:
            model.serialize_device = True
        opt = optax.adam(cfg.learning_rate)

        from chaorec_tpu.models.adagcl import generator_labels

        opt_gens = [
            optax.multi_transform(
                {"g": optax.adam(cfg.learning_rate), "f": optax.set_to_zero()},
                generator_labels(model, f"g{i}_"),
            )
            for i in (1, 2, 3)
        ]
        from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
        from chaorec_tpu.train.loop import dispatch_chunked

        def chunk_fn(model, params, opts, rng, users, pos, weights, history):
            o, o1, o2, o3 = opts

            def step(carry, xs):
                params, o, o1, o2, o3, rng = carry
                u, p, w = xs
                rng, k_neg, k1, k3 = jax.random.split(rng, 4)
                neg = sample_negatives(k_neg, u, history, num_item,
                                       cfg.neg_candidates)
                batch = Batch(u, p, neg, w)
                params, o, (o1, o2, o3), loss = grade_step(
                    model, opt, tuple(opt_gens),
                    params, o, (o1, o2, o3), batch, k1, k3)
                return (params, o, o1, o2, o3, rng), loss

            (params, o, o1, o2, o3, rng), losses = jax.lax.scan(
                step, (params, o, o1, o2, o3, rng), (users, pos, weights)
            )
            return params, (o, o1, o2, o3), rng, jnp.sum(losses)

        jit_chunk = jax.jit(chunk_fn, donate_argnums=(1, 2))
        jit_shuffle = jax.jit(make_epoch_batches, static_argnums=(2,))
        # Per-program execution budget: a whole-epoch Grade scan at
        # E>=120k runs past the TPU worker's limit and kills the worker
        # (parity_logs/grade_crash_probe5.txt: scan155 crashes, scan78
        # passes, identical step program). Chunked dispatch keeps every
        # program under the budget; carry stays on device between calls.
        chunk = cfg.max_dispatch_batches or (
            64 if dataset.train_edges.shape[0] >= 120_000 else 0)
        self._opts = None

        def train_epoch(params, opt_state, rng, epoch_idx):
            if self._opts is None:
                self._opts = (opt.init(params),) + tuple(
                    og.init(params) for og in opt_gens
                )
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


Grade.trainer_cls = GradeTrainer
