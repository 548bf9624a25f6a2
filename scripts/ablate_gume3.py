"""GUME backward ablation: which piece owns the 48 ms backward."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.config import parse_cli
from chaorec_tpu.data.loading import data_load
from chaorec_tpu.models import build_model
from chaorec_tpu.models.base import Batch


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"  {name:<34} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")


def main():
    sys.argv[1:] = ["--Model", "GUME", "--data_path", "sports",
                    "--data_root", "/root/reference/Data"]
    cfg = parse_cli()
    cfg.n_ui_layers, cfg.n_layers, cfg.um_loss, cfg.vt_loss = 3, 1, 0.1, 0.1
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    m = build_model(cfg, ds)
    params = m.init_params(jax.random.PRNGKey(0))
    bs = cfg.batch_size
    rng = jax.random.PRNGKey(1)
    batch = Batch(
        jnp.zeros((bs,), jnp.int32), jnp.zeros((bs,), jnp.int32),
        jnp.zeros((bs,), jnp.int32), jnp.ones((bs,), jnp.float32),
        jnp.ones((), jnp.int32), None)

    def vg(loss_fn):
        return jax.jit(lambda p, r: jax.value_and_grad(loss_fn)(p, r))

    timeit("full loss v&g", vg(lambda p, r: m.loss(p, batch, r)),
           params, rng)

    orig_conv = m._conv_ui
    m._conv_ui = lambda xu, xi: (xu[:, :64].repeat(3, 1) * 0 + xu,
                                 xi)[0:1] + (xi,)
    m._conv_ui = lambda xu, xi: (xu, xi)
    timeit("conv_ui=identity", vg(lambda p, r: m.loss(p, batch, r)),
           params, rng)
    m._conv_ui = orig_conv

    sg_feats = lambda p: {**p, "v_feat": jax.lax.stop_gradient(p["v_feat"]),
                          "t_feat": jax.lax.stop_gradient(p["t_feat"])}
    timeit("frozen feature tables",
           vg(lambda p, r: m.loss(sg_feats(p), batch, r)), params, rng)

    orig_fwd = m.forward
    def fwd_sg_graph(p):
        # stop gradients through ALL graph propagation: how much of the
        # backward is propagation transposes?
        out = orig_fwd(p)
        return tuple(jax.lax.stop_gradient(o) for o in out)
    m.forward = fwd_sg_graph
    timeit("whole forward stop-grad",
           vg(lambda p, r: m.loss(p, batch, r)), params, rng)
    m.forward = orig_fwd

    # remat: does XLA recompute forward in backward?
    timeit("remat loss v&g",
           vg(jax.checkpoint(lambda p, r: m.loss(p, batch, r))), params, rng)


if __name__ == "__main__":
    main()
