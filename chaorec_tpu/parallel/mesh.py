"""Device-mesh parallelism: dp (batch) x mp (embedding-row) sharding.

The reference has **no distributed path at all** (SURVEY.md §2.3: no
torch.distributed/NCCL/MPI anywhere); this subsystem is new capability,
designed the JAX way: pick a mesh, annotate shardings with
``NamedSharding``/``PartitionSpec``, and let XLA insert the collectives
(psum for dp gradient reduction, all-gathers for mp row-sharded embedding
lookups) over ICI.

Layout for recommendation workloads (the graph analog of tensor/sequence
parallelism — SURVEY.md §5 "long-context" row):
- ``dp``: training batches are sharded by row; gradients psum across dp.
- ``mp``: the (num_user + num_item) x D embedding state is sharded by row;
  full-catalog eval scoring shards users over the mesh and keeps the item
  tables local, so the U x I score matrix never exists on one chip.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chaorec_tpu.models.base import Batch, RecModel


def parse_mesh_spec(spec: str) -> Mesh:
    """Build a Mesh from the CLI's ``--mesh_shape`` string, e.g.
    "dp=4,mp=2" (axes default to 1 when omitted)."""
    parts = dict(p.split("=") for p in spec.replace(" ", "").split(",") if p)
    dp = int(parts.get("dp", 1))
    mp = int(parts.get("mp", 1))
    return make_mesh(dp * mp, mp=mp)


def make_mesh(
    n_devices: Optional[int] = None,
    mp: Optional[int] = None,
) -> Mesh:
    """Mesh over the first ``n_devices`` devices with axes ("dp", "mp").

    ``mp`` defaults to min(2, n) when n is even so both axes are exercised;
    a single device yields a degenerate 1x1 mesh (sharding annotations
    become no-ops, so the same jitted step runs everywhere).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if mp is None:
        mp = 2 if n % 2 == 0 and n >= 2 else 1
    dp = n // mp
    import numpy as np

    return Mesh(np.array(devices).reshape(dp, mp), ("dp", "mp"))


def shard_params(params, mesh: Mesh):
    """Row-shard every LARGE 2-D parameter over "mp"; replicate the rest
    (any tensor whose leading dim doesn't divide the mp size, and small
    weight matrices — attention heads, (1, d) projections, discriminator
    blocks). The size floor (>= 8 rows per shard) matters beyond taste:
    sharding a near-degenerate matrix like MMSSL's (8, 16) D block 8 ways
    puts 1 row per device, and the WGAN-GP double-backward's transposed
    accumulation then needs a layout GSPMD can only reach by involuntary
    full rematerialization (spmd_partitioner warnings in the r3 dryrun).
    Row-sharding only pays for embedding-table-scale params anyway."""
    mp = mesh.shape["mp"]

    def spec(x):
        if x.ndim >= 2 and x.shape[0] % mp == 0 and x.shape[0] >= 8 * mp:
            return NamedSharding(mesh, P("mp", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec(x)), params)


def param_sharding_constraint(tree, params, mesh: Mesh):
    """Pin every leaf of ``tree`` (typically a gradient pytree) to the
    sharding :func:`shard_params` gives the matching param. Stating the
    gradients' final layout up front lets GSPMD plan one psum/reduce-
    scatter per leaf instead of discovering a layout mismatch deep in a
    transposed double-backward and falling back to involuntary full
    rematerialization (the r3 dryrun warnings on the MMSSL WGAN-GP step).
    """
    mp = mesh.shape["mp"]

    def spec(x):
        if x.ndim >= 2 and x.shape[0] % mp == 0 and x.shape[0] >= 8 * mp:
            return NamedSharding(mesh, P("mp", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(
        lambda g, p: jax.lax.with_sharding_constraint(g, spec(p)),
        tree, params)


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Row-shard every array field over the whole mesh; scalars (the batch
    ``index``) are replicated and ``None`` fields pass through."""
    sh = NamedSharding(mesh, P(("dp", "mp")))
    rep = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return jax.device_put(x, sh if x.ndim >= 1 else rep)

    return Batch(*(put(x) for x in batch))


def make_sharded_train_step(model: RecModel, optimizer: optax.GradientTransformation,
                            mesh: Mesh):
    """One pjit-compiled training step over the mesh.

    Shardings are carried by the input arrays (device_put above); XLA
    propagates them and inserts the ICI collectives. Returns
    ``step(params, opt_state, batch, rng) -> (params, opt_state, loss)``.
    """

    def step(model, params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(model.loss)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(1, 2))
    return lambda params, opt_state, batch, rng: jitted(
        model, params, opt_state, batch, rng
    )


def shard_state(state, mesh: Mesh):
    """Row-shard every >=2-D model-state buffer over "mp" (rebuilt modal
    graphs, diffusion buffers); replicate scalars/vectors. Same policy as
    ``shard_params`` — state tensors are (U, .)/(I, .)-shaped."""
    mp = mesh.shape["mp"]

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        if x.ndim >= 2 and x.shape[0] % mp == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P("mp", *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, state)


def init_stateful_opt_state(model: RecModel,
                            optimizer: optax.GradientTransformation,
                            params):
    """Opt state for make_sharded_stateful_step: one flat Adam state."""
    # epoch0_params need no split here: torch 1.11 Adam
    # (zero_grad(set_to_none=False), reference main.py:397) steps the
    # rebuild-gated subtree on EVERY batch with g = 0 after batch 0, and
    # a single ungated optax Adam over all params — whose gated grads
    # are identically zero off batch 0 — reproduces that exactly at
    # per-batch granularity. (The single-device trainer gets the same
    # trajectory via the fused closed-form tail, train/loop.py.)
    return optimizer.init(params)


def make_sharded_stateful_step(model: RecModel,
                               optimizer: optax.GradientTransformation,
                               mesh: Mesh):
    """Sharded step for the ``loss_stateful`` protocol (LATTICE/MICRO
    carry rebuilt graphs; dense user-row models run through the plain
    path). Shardings ride on the inputs; XLA inserts the collectives.
    """

    def step(model, params, opt_state, mstate, batch, rng):
        (loss, mstate), grads = jax.value_and_grad(
            model.loss_stateful, has_aux=True
        )(params, mstate, batch, rng)
        # Ungated update over ALL params: the rebuild-gated subtree's
        # grads are identically zero off batch 0 and torch 1.11 Adam
        # (set_to_none=False) steps it every batch regardless — see
        # init_stateful_opt_state.
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mstate, loss

    # No donation: stateful models alias feature tables between the model
    # pytree and params (params["v_feat"] IS model._v_init), and donating
    # one while the other rides in as a plain argument is f(a, donate(a)).
    jitted = jax.jit(step)
    return lambda params, opt_state, mstate, batch, rng: jitted(
        model, params, opt_state, mstate, batch, rng
    )


def make_sharded_mmssl_step(model, mesh: Mesh, lr: float):
    """One sharded MMSSL alternating D/G step — the stateful adversarial
    family (reference loop train_and_evaluate.py:49-71; optimizers as in
    models/mmssl.py MMSSLTrainer: Adam(3e-4, 0.5/0.9) on D_, AdamW(lr)
    on the generator). Returns ``step(params, od, om, mstate, batch,
    rng) -> (params, od, om, mstate, loss)`` plus the two optimizers for
    state init."""
    d_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "d" if str(path[0].key).startswith("D_") else "frozen",
        model.init_params(jax.random.PRNGKey(0)),
    )
    opt_d = optax.multi_transform(
        {"d": optax.adam(3e-4, b1=0.5, b2=0.9),
         "frozen": optax.set_to_zero()},
        d_labels,
    )
    opt_main = optax.adamw(lr, weight_decay=0.01)

    def step(model, params, od, om, mstate, batch, rng):
        k_d, k_g = jax.random.split(rng)
        g_d = jax.grad(model.loss_d)(params, mstate, batch, k_d)
        g_d = param_sharding_constraint(g_d, params, mesh)
        upd, od = opt_d.update(g_d, od, params)
        params = optax.apply_updates(params, upd)
        (loss, mstate), g = jax.value_and_grad(
            model.loss_stateful, has_aux=True
        )(params, mstate, batch, k_g)
        g = param_sharding_constraint(g, params, mesh)
        upd, om = opt_main.update(g, om, params)
        params = optax.apply_updates(params, upd)
        return params, od, om, mstate, loss

    jitted = jax.jit(step)  # no donation: params alias model buffers
    return (
        lambda params, od, om, mstate, batch, rng: jitted(
            model, params, od, om, mstate, batch, rng),
        opt_d,
        opt_main,
    )


def make_sharded_diffmm_steps(model, mesh: Mesh, lr: float):
    """Sharded steps for the diffusion-rebuild family (DiffMM,
    train_and_evaluate.py:140-244): a phase-A denoiser step over dense
    user rows (users sharded over the mesh) and a phase-C BPR step
    against rebuilt modal graphs. Returns ``(denoise_step, opt_dn,
    bpr_step, opt_main)``."""
    dn_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "dn" if str(path[0].key).endswith("_dn") else "frozen",
        model.init_params(jax.random.PRNGKey(0)),
    )
    opt_dn = optax.multi_transform(
        {"dn": optax.adam(lr), "frozen": optax.set_to_zero()}, dn_labels
    )
    opt_main = optax.adam(lr)

    def denoise(model, params, opt_state, users, weights, rng):
        loss, grads = jax.value_and_grad(model.diffusion_loss)(
            params, users, weights, rng
        )
        upd, opt_state = opt_dn.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss

    def bpr(model, params, opt_state, state, batch):
        loss, grads = jax.value_and_grad(model.loss_bpr)(params, state, batch)
        upd, opt_state = opt_main.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss

    jit_dn = jax.jit(denoise)  # no donation: params alias model buffers
    jit_bpr = jax.jit(bpr)
    return (
        lambda params, o, users, weights, rng: jit_dn(
            model, params, o, users, weights, rng),
        opt_dn,
        lambda params, o, state, batch: jit_bpr(model, params, o, state, batch),
        opt_main,
    )


def make_sharded_adagcl_step(model, mesh: Mesh, lr: float):
    """One sharded AdaGCL 3-loss / 3-optimizer alternating step — the
    adaptive-augmentation family (reference loop
    train_and_evaluate.py:72-97). The step body IS
    models/adagcl.alternating_step — the same function the whole-epoch
    scan trainer runs — so the sharded and single-device paths cannot
    drift. Returns ``(step, opt, opt_g1, opt_g2)`` with ``step(params,
    o, o1, o2, batch, rng) -> (params, o, o1, o2, loss)``."""
    from chaorec_tpu.models.adagcl import alternating_step, generator_labels

    opt = optax.adam(lr)
    opt_g1 = optax.multi_transform(
        {"g": optax.adam(lr), "f": optax.set_to_zero()},
        generator_labels(model, "g1_"))
    opt_g2 = optax.multi_transform(
        {"g": optax.adam(lr, eps=1e-3), "f": optax.set_to_zero()},
        generator_labels(model, "g2_"))

    def step(model, params, o, o1, o2, batch, rng):
        k1, k2 = jax.random.split(rng)
        return alternating_step(model, opt, opt_g1, opt_g2,
                                params, o, o1, o2, batch, k1, k2)

    jitted = jax.jit(step)  # no donation: params alias model buffers
    return (
        lambda params, o, o1, o2, batch, rng: jitted(
            model, params, o, o1, o2, batch, rng),
        opt, opt_g1, opt_g2,
    )


def make_sharded_grade_step(model, mesh: Mesh, lr: float):
    """One sharded GRADE 3-loss / 4-optimizer step (reference loop
    train_and_evaluate.py:259-284). The step body IS
    models/grade.grade_step — shared with the whole-epoch scan trainer.
    Returns ``(step, opt, opt_gens)`` with ``step(params, o, (o1, o2,
    o3), batch, rng) -> (params, o, gens, loss)``."""
    from chaorec_tpu.models.adagcl import generator_labels
    from chaorec_tpu.models.grade import grade_step

    opt = optax.adam(lr)
    opt_gens = tuple(
        optax.multi_transform(
            {"g": optax.adam(lr), "f": optax.set_to_zero()},
            generator_labels(model, f"g{i}_"))
        for i in (1, 2, 3)
    )

    def step(model, params, o, gens, batch, rng):
        k1, k3 = jax.random.split(rng)
        return grade_step(model, opt, opt_gens, params, o, gens, batch,
                          k1, k3)

    jitted = jax.jit(step)
    return (
        lambda params, o, gens, batch, rng: jitted(
            model, params, o, gens, batch, rng),
        opt, opt_gens,
    )


def make_sharded_mhrec_steps(model, mesh: Mesh, lr: float):
    """Sharded steps for MHRec's three-phase hyperedge-rebuild state
    machine (reference train_and_evaluate.py:331-512; phase split as in
    models/mhrec.py MHRecTrainer):

    - phase A ``denoise(params, opt_state, rows, weights, rng, prefix)``:
      one denoiser step over a batch of hyperedge node-lists (rows
      sharded over the mesh; denoiser towers row-sharded over mp).
    - phase B ``rebuild(params, nodes, rng, prefix)``: p-sample a chunk
      of the incidence back from the denoiser (rows sharded).
    - phase C ``hyper(params, opt_state, h_v, h_t, batch, rng)``: BPR +
      hypergraph-attention step on the rebuilt incidences; the per-epoch
      sorted-segment layouts are built inside so the phase stays one
      jitted program. Adam skips the denoiser groups exactly as the
      single-device trainer (torch skips grad=None params).

    Returns ``(denoise, opt_dn, rebuild, hyper, opt_c)``.
    """
    dn_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "dn" if str(path[0].key).endswith("_dn")
        else "frozen",
        model.init_params(jax.random.PRNGKey(0)),
    )
    opt_dn = optax.multi_transform(
        {"dn": optax.adam(lr), "frozen": optax.set_to_zero()}, dn_labels)
    opt_c = optax.multi_transform(
        {"dn": optax.set_to_zero(), "frozen": optax.adam(lr)}, dn_labels)

    def denoise(model, params, opt_state, rows, weights, rng, prefix):
        loss, grads = jax.value_and_grad(
            lambda p: model.hyper_diff_loss(p, prefix, rows, weights, rng)
        )(params)
        upd, opt_state = opt_dn.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss

    def rebuild(model, params, nodes, rng, prefix):
        return model.rebuild_rows(params, prefix, nodes, rng)

    def hyper(model, params, opt_state, h_v, h_t, batch, rng):
        layouts = (model.build_layout(h_v), model.build_layout(h_t))
        (loss, mstate), grads = jax.value_and_grad(
            model.loss_hyper, has_aux=True
        )(params, batch, h_v, h_t, rng, layouts)
        upd, opt_state = opt_c.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, mstate, loss

    jit_dn = jax.jit(denoise, static_argnames=("prefix",))
    jit_rb = jax.jit(rebuild, static_argnames=("prefix",))
    jit_c = jax.jit(hyper)
    return (
        lambda params, o, rows, w, rng, prefix: jit_dn(
            model, params, o, rows, w, rng, prefix=prefix),
        opt_dn,
        lambda params, nodes, rng, prefix: jit_rb(
            model, params, nodes, rng, prefix=prefix),
        lambda params, o, h_v, h_t, batch, rng: jit_c(
            model, params, o, h_v, h_t, batch, rng),
        opt_c,
    )


def make_sharded_gformer_step(model, mesh: Mesh, lr: float):
    """One sharded GFormer step against a host-resampled padded graph
    set (reference train_and_evaluate.py:245-258: grad-clip 20 + Adam;
    graphs resampled every fix_steps batches stay fixed-shape pytrees,
    replicated over the mesh — models/gformer.py GFormerTrainer is the
    single-device analog). Returns ``(step, opt)`` with ``step(params,
    opt_state, batch, graphs) -> (params, opt_state, loss)``."""
    opt = optax.chain(
        optax.clip_by_global_norm(20.0),
        optax.adam(lr),
    )

    def step(model, params, opt_state, batch, graphs):
        loss, grads = jax.value_and_grad(model.loss_graphs)(
            params, batch, graphs)
        upd, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss

    jitted = jax.jit(step)
    return (
        lambda params, o, batch, graphs: jitted(model, params, o, batch,
                                                graphs),
        opt,
    )


def _rank_scores_chunk(model, params, model_state, uids, hist,
                       topk: int, num_user: int, mask_value: float,
                       stateful: bool):
    if stateful:
        scores = model.score_users_stateful(params, model_state, uids)
    else:
        scores = model.score_users(params, uids)
    from chaorec_tpu.eval.ranking import mask_and_topk

    return mask_and_topk(scores, hist, topk=topk, num_user=num_user,
                         mask_value=mask_value)


# module-level jit so repeated per-epoch eval calls hit the pjit cache
# (a per-call closure would retrace+recompile the catalog-sized sharded
# ranking program every epoch); output sharding follows the row-sharded
# uids/hist inputs
_rank_scores_jit = jax.jit(
    _rank_scores_chunk,
    static_argnames=("topk", "num_user", "mask_value", "stateful"))


def sharded_rank_scores(model, params, history_values, num_user: int,
                        topk: int, mesh: Mesh, model_state=None,
                        mask_value: float = 1e-6):
    """Sharded full-catalog eval for ``rank_mode == "scores"`` models
    (MultVAE/DiffRec/BSPM families): user ids are sharded over the whole
    mesh, each device computes its users' score rows via the model's own
    ``score_users`` and applies the reference masking + top-k
    (eval/ranking.mask_and_topk semantics — 1e-6 or -inf per model).
    The (U, I) score matrix only ever exists as per-device shards."""
    n = mesh.devices.size
    pad = (-num_user) % n
    uids = jnp.concatenate(
        [jnp.arange(num_user, dtype=jnp.int32),
         jnp.zeros((pad,), jnp.int32)]) if pad else jnp.arange(
             num_user, dtype=jnp.int32)
    hist = history_values
    if pad:
        hist = jnp.pad(hist, ((0, pad), (0, 0)),
                       constant_values=jnp.iinfo(jnp.int32).max // 2)
    row_sh = NamedSharding(mesh, P(("dp", "mp"), None))
    vec_sh = NamedSharding(mesh, P(("dp", "mp")))
    uids = jax.device_put(uids, vec_sh)
    hist = jax.device_put(hist, row_sh)

    stateful = bool(model.stateful
                    and hasattr(model, "score_users_stateful"))
    ranked = _rank_scores_jit(model, params, model_state, uids, hist,
                              topk=topk, num_user=num_user,
                              mask_value=mask_value, stateful=stateful)
    return ranked[:num_user]


def sharded_rank(user_emb, item_emb, history_values, num_user: int,
                 topk: int, mesh: Mesh):
    """Full-catalog ranking with users sharded over the whole mesh.

    The (U, I) score matrix exists only as per-device (U/n, I) shards;
    each device masks its users' histories and takes a local top-k — user
    rows are independent, so no cross-device reduction is needed and the
    only collective is the initial item-table replication. This is the
    sharded analog of eval/ranking.gene_ranklist (same 1e-6 mask + global
    item-id offset semantics).
    """
    from chaorec_tpu.eval.ranking import _rank_chunk

    n = mesh.devices.size
    u = user_emb.shape[0]
    pad = (-u) % n
    if pad:
        user_emb = jnp.pad(user_emb, ((0, pad), (0, 0)))
        history_values = jnp.pad(
            history_values, ((0, pad), (0, 0)),
            constant_values=item_emb.shape[0])
    row_sh = NamedSharding(mesh, P(("dp", "mp"), None))
    rep = NamedSharding(mesh, P())
    u_sh = jax.device_put(user_emb, row_sh)
    h_sh = jax.device_put(history_values, row_sh)
    i_rep = jax.device_put(item_emb, rep)
    k = min(topk, item_emb.shape[0])
    ranked = jax.jit(
        _rank_chunk, static_argnames=("topk", "num_user"),
        out_shardings=row_sh,
    )(u_sh, i_rep, h_sh, topk=k, num_user=num_user)
    return ranked[:u]
