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
    """Row-shard every 2-D parameter over "mp"; replicate the rest (and
    any tensor whose leading dim doesn't divide the mp size — small
    weight matrices like attention heads or (1, d) projections)."""
    mp = mesh.shape["mp"]

    def spec(x):
        if x.ndim >= 2 and x.shape[0] % mp == 0:
            return NamedSharding(mesh, P("mp", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec(x)), params)


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
        upd, od = opt_d.update(g_d, od, params)
        params = optax.apply_updates(params, upd)
        (loss, mstate), g = jax.value_and_grad(
            model.loss_stateful, has_aux=True
        )(params, mstate, batch, k_g)
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
