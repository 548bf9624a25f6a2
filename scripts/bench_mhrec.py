"""MHRec phase-C component timing (VERDICT r3 item 3: get >=1x phase-C).

Decomposes the phase-C step on the real workload (beauty, phase-C-only
incidence = leading num_hypernodes raw hyperedge nodes) into:
  - layout build (per-epoch, amortized)
  - forward only
  - each _hyper_attn call in isolation
  - the 3E-wide GCN tower in isolation
  - loss_hyper value_and_grad (the per-batch unit, 92x per epoch)
  - variants: no hyper-dropout RNG, denominator via prefix-sum layout
so one TPU session says exactly where the 71 ms/batch goes.

Usage: python scripts/bench_mhrec.py --data_path beauty \
           --data_root /root/reference/Data [--iters 10]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CHAOREC_MHREC_PHASE_C_ONLY", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from chaorec_tpu.config import (  # noqa: E402
    grid_combinations,
    load_yaml_config,
    parse_cli,
)
from chaorec_tpu.data.loading import data_load  # noqa: E402
from chaorec_tpu.data.sampling import (  # noqa: E402
    make_epoch_batches,
    sample_negatives,
)
from chaorec_tpu.models import build_model  # noqa: E402
from chaorec_tpu.models.base import Batch  # noqa: E402


def _sync(out):
    """Real host fetch — block_until_ready does not block through the
    axon tunnel (see memory: tpu-tunnel-measurement)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(name, fn, *args, iters=10):
    """Delta timing: dispatch k and 3k iterations, each synced by a real
    scalar fetch; report (t_3k - t_k) / 2k so the tunnel RTT and fetch
    cost cancel."""
    out = fn(*args)  # compile
    _sync(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        return time.perf_counter() - t0

    t1 = run(iters)
    t3 = run(3 * iters)
    ms = (t3 - t1) / (2 * iters) * 1e3
    print(f"  {name:<36} {ms:9.3f} ms", flush=True)
    return ms


def main() -> None:
    argv = sys.argv[1:]
    iters = 10
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        del argv[i: i + 2]
    sys.argv[1:] = ["--Model", "MHRec"] + argv
    cfg = parse_cli()
    yaml_cfg = load_yaml_config(cfg.Model)
    first = next(iter(grid_combinations(yaml_cfg)), {})
    for k, v in first.items():
        if hasattr(cfg, k):
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if cur is not None else v)
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    model = build_model(cfg, ds)
    rng = jax.random.PRNGKey(0)
    params = jax.device_put(model.init_params(rng))

    h_v = jnp.asarray(model.hyper_nodes_v[:, : model.num_hypernodes])
    h_t = jnp.asarray(model.hyper_nodes_t[:, : model.num_hypernodes])
    he, k = h_v.shape
    n = model.num_nodes
    print(f"MHRec phase-C bench: He={he} k={k} nodes={n} "
          f"dim={model.dim_E} h_layers={model.h_layers} "
          f"n_layers={model.n_layers}", flush=True)

    lay_v = jax.jit(model.build_layout)(h_v)
    lay_t = jax.jit(model.build_layout)(h_t)
    jax.block_until_ready((lay_v, lay_t))
    timeit("build_layout (per-epoch)", jax.jit(model.build_layout), h_v,
           iters=iters)

    # one batch
    edges = jnp.asarray(ds.train_edges)
    history = jnp.asarray(ds.history.values)
    users, pos, weights, _ = make_epoch_batches(
        jax.random.PRNGKey(1), edges, cfg.batch_size)
    neg = sample_negatives(jax.random.PRNGKey(2), users[0], history,
                           ds.num_item, cfg.neg_candidates)
    batch = Batch(users[0], pos[0], neg, weights[0], jnp.int32(0), None)

    # model/layouts/incidences ride as jit ARGUMENTS (pytree leaves):
    # closure constants of this size overflow the remote-compile tunnel
    # (HTTP 413) before the device sees the program.
    lays = (lay_v, lay_t)
    fwd = jax.jit(lambda m, p, hv, ht, r, ls: m.forward(p, hv, ht, r, ls))
    timeit("forward", fwd, model, params, h_v, h_t, rng, lays, iters=iters)

    # single hypergraph attention layer (modality v, layer 0)
    x0 = jnp.zeros((n, model.dim_E), jnp.float32) + 0.01
    attn = jax.jit(lambda m, p, hv, lv, x: m._hyper_attn(
        p["hv_a0"], hv, lv, x))
    timeit("hyper_attn x1 (fwd)", attn, model, params, h_v, lay_v, x0,
           iters=iters)
    attn_g = jax.jit(lambda m, p, hv, lv, x: jax.grad(
        lambda xx: jnp.sum(m._hyper_attn(p["hv_a0"], hv, lv, xx) ** 2)
    )(x))
    timeit("hyper_attn x1 (fwd+bwd)", attn_g, model, params, h_v, lay_v, x0,
           iters=iters)

    # micro-ops of the attention, to attribute its budget
    flat, perm, ptr, edge_perm = lay_v
    x_pad = jnp.concatenate([x0, jnp.zeros((1, x0.shape[1]))], 0)
    ee = jnp.abs(jax.random.normal(rng, (he * k,))) + 0.5
    eemb = jax.random.normal(rng, (he, model.dim_E))
    timeit("micro: gather M rows (M,D)",
           jax.jit(lambda xp, f: jnp.take(xp, f, axis=0)), x_pad, flat,
           iters=iters)
    msgs = jax.random.normal(rng, (he * k, model.dim_E))
    timeit("micro: cumsum (M,D) fp32",
           jax.jit(lambda v: jnp.cumsum(v, axis=0)), msgs, iters=iters)
    timeit("micro: scalar segsum unsorted",
           jax.jit(lambda v, f: jax.ops.segment_sum(
               v, f, num_segments=n + 1)), ee, flat, iters=iters)
    sorted_idx = flat[perm]
    ee_sorted = ee[perm]
    timeit("micro: scalar segsum sorted",
           jax.jit(lambda v, f: jax.ops.segment_sum(
               v, f, num_segments=n + 1, indices_are_sorted=True)),
           ee_sorted, sorted_idx, iters=iters)
    from chaorec_tpu.ops.ell import seg_edge_weighted_sum
    timeit("micro: sews fwd",
           jax.jit(lambda em, al, f, pm, ep, pt: seg_edge_weighted_sum(
               em, al, f, pm, ep, pt)),
           eemb, ee.reshape(he, k), flat, perm, edge_perm, ptr,
           iters=iters)

    # 3E-wide GCN tower
    gcn = jax.jit(lambda m, p: m._gcn_mean(
        jnp.concatenate([p["u_v_emb"], p["u_t_emb"], p["u_emb"]], axis=1),
        jnp.concatenate([p["i_emb"], p["i_emb"], p["i_emb"]], axis=1)))
    timeit("gcn_mean 3E-wide (fwd)", gcn, model, params, iters=iters)
    gcn_g = jax.jit(lambda m, p: jax.grad(lambda pp: jnp.sum(m._gcn_mean(
        jnp.concatenate([pp["u_v_emb"], pp["u_t_emb"], pp["u_emb"]], axis=1),
        jnp.concatenate([pp["i_emb"], pp["i_emb"], pp["i_emb"]], axis=1)
    )[0] ** 2))(p))
    timeit("gcn_mean 3E-wide (fwd+bwd)", gcn_g, model, params, iters=iters)

    # full per-batch unit
    def loss_fn(m, p, b, hv, ht, r, ls):
        loss, _ = m.loss_hyper(p, b, hv, ht, r, ls)
        return loss

    vg = jax.jit(lambda m, p, b, hv, ht, r, ls: jax.value_and_grad(
        loss_fn, argnums=1)(m, p, b, hv, ht, r, ls))
    timeit("loss_hyper value_and_grad", vg, model, params, batch, h_v, h_t,
           rng, lays, iters=iters)

    # forward without the hyper-dropout RNG (isolate threefry cost)
    drop = model.hyper_dropout
    try:
        model.hyper_dropout = 0.0
        fwd_nodrop = jax.jit(lambda m, p, hv, ht, r, ls: m.forward(
            p, hv, ht, r, ls))
        timeit("forward (dropout=0 variant)", fwd_nodrop, model, params,
               h_v, h_t, rng, lays, iters=iters)
        vg2 = jax.jit(lambda m, p, b, hv, ht, r, ls: jax.value_and_grad(
            loss_fn, argnums=1)(m, p, b, hv, ht, r, ls))
        timeit("val+grad (dropout=0 variant)", vg2, model, params, batch,
               h_v, h_t, rng, lays, iters=iters)
    finally:
        model.hyper_dropout = drop


if __name__ == "__main__":
    main()
