"""Component-level step timing for one model/dataset.

Decomposes a steady-state train step into: forward (embeddings), loss
forward, value_and_grad, and the full optimizer step, each timed with
block_until_ready over `--iters` calls after a compile warm-up. This is
the cheap first-order profile that tells you whether an epoch's time is
forward math, backward math, or optimizer/update traffic before reaching
for a full xprof trace.

Usage: python scripts/profile_model.py --Model GUME --data_path sports \
           --data_root /root/reference/Data [--iters 20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from chaorec_tpu.config import grid_combinations, load_yaml_config, parse_cli  # noqa: E402
from chaorec_tpu.data.loading import data_load  # noqa: E402
from chaorec_tpu.models.base import Batch  # noqa: E402
from chaorec_tpu.models import build_model  # noqa: E402


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:<28} {ms:9.3f} ms")
    return ms


def main() -> None:
    argv = sys.argv[1:]
    iters = 20
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        del argv[i : i + 2]
    sys.argv[1:] = argv
    cfg = parse_cli()
    try:
        yaml_cfg = load_yaml_config(cfg.Model)
        first = next(iter(grid_combinations(yaml_cfg)), {})
    except FileNotFoundError:
        first = {}
    for k, v in first.items():
        if hasattr(cfg, k):
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if cur is not None else v)
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    model = build_model(cfg, ds)
    print(f"{cfg.Model}/{cfg.data_path}: U={ds.num_user} I={ds.num_item} "
          f"E={len(ds.train_edges)} combo={first}")

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"  params: {n_params/1e6:.1f}M")

    bs = cfg.batch_size
    u = jnp.asarray(np.random.randint(0, ds.num_user, bs), jnp.int32)
    p = jnp.asarray(np.random.randint(0, ds.num_item, bs), jnp.int32)
    n = jnp.asarray(np.random.randint(0, ds.num_item, bs), jnp.int32)
    w = jnp.ones((bs,), jnp.float32)
    batch = Batch(u, p, n, w, jnp.ones((), jnp.int32),
                  n if getattr(model, "needs_int_items", False) else None)
    opt = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)

    # model is a pytree ARGUMENT everywhere (never a closure: its graph
    # buffers would be baked into the remote-compile payload — HTTP 413)
    stateful = getattr(model, "stateful", False)
    if stateful:
        mstate = model.init_state(rng)
        loss_fn = lambda m, pr, r: m.loss_stateful(pr, mstate, batch, r)[0]
    else:
        loss_fn = lambda m, pr, r: m.loss(pr, batch, r)

    fwd = jax.jit(lambda m, pr: m.embeddings(pr))
    loss_j = jax.jit(loss_fn)
    vgrad = jax.jit(
        lambda m, pr, r: jax.value_and_grad(loss_fn, argnums=1)(m, pr, r))
    opt_state = opt.init(params)

    @jax.jit
    def full_step(m, pr, st, r):
        loss, grads = jax.value_and_grad(loss_fn, argnums=1)(m, pr, r)
        updates, st = opt.update(grads, st, pr)
        return optax.apply_updates(pr, updates), st, loss

    try:
        timeit("forward (embeddings)", fwd, model, params, iters=iters)
    except NotImplementedError:
        print("  forward (embeddings)        n/a")
    timeit("loss forward", loss_j, model, params, rng, iters=iters)
    timeit("value_and_grad", vgrad, model, params, rng, iters=iters)
    ms = timeit("full step (grad+adam)", full_step, model, params, opt_state,
                rng, iters=iters)
    steps = (len(ds.train_edges) + bs - 1) // bs
    print(f"  -> {steps} steps/epoch = {ms*steps/1e3:.2f} s/epoch (step-only)")


if __name__ == "__main__":
    main()
