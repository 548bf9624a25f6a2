"""On-TPU validation + timing of ops/pallas_attn.fused_mha at CAM_AE shapes.

Checks (1) forward parity vs the XLA reference, (2) grad parity, (3)
dropout mask statistics from the in-kernel hardware PRNG, (4) fused-vs-XLA
step timing at CF-Diff's (B=64, h=4, L=1034, dh=4).

Tolerances are NOISE-FLOOR-RELATIVE, not absolute: on TPU the default
matmul precision runs bf16 passes on the MXU in BOTH the Pallas kernel
and the plain-XLA reference path, so the two default-precision results
legitimately differ at the ~1e-4 level (the r2 script's absolute 1e-4
bound was calibrated in fp32 interpret mode and tripped on exactly this
— err 2.39e-4 with a perfectly healthy kernel). The fix: compute a
forced-fp32 oracle (jax.default_matmul_precision("float32")) and require
the kernel's error from the oracle to sit in the same precision class as
the XLA default path's own error from that oracle. A real Mosaic
miscompile produces errors orders of magnitude above that floor (or
NaNs), which this still catches.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.ops.pallas_attn import fused_mha, mha_reference

SEED = jnp.zeros((1,), jnp.int32)


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"  {name:<34} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)


def _against(name, got, xla_default, oracle):
    """Assert `got` is in the same precision class as the XLA default
    path, both measured against the forced-fp32 oracle."""
    err_fused = float(jnp.max(jnp.abs(got - oracle)))
    err_xla = float(jnp.max(jnp.abs(xla_default - oracle)))
    scale = float(jnp.max(jnp.abs(oracle))) + 1e-12
    # floor: XLA's own default-precision error, with an absolute backstop
    # in case the default path happens to be exact on some backend.
    bound = max(8.0 * max(err_xla, 1e-7 * scale), 1e-6 * scale)
    print(f"{name}: |fused-oracle|={err_fused:.2e} "
          f"|xla_default-oracle|={err_xla:.2e} scale={scale:.2e} "
          f"bound={bound:.2e}", flush=True)
    assert np.isfinite(err_fused), (name, "non-finite kernel output")
    assert err_fused < bound, (name, err_fused, err_xla, bound)


def main():
    b, h, l, dh = 64, 4, 1034, 4
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, l, dh), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, dh), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, dh), jnp.float32)

    got = jax.jit(lambda *a: fused_mha(*a, 1.0))(q, k, v, SEED)
    want = jax.jit(mha_reference)(q, k, v)
    with jax.default_matmul_precision("float32"):
        oracle = jax.jit(mha_reference)(q, k, v)
    _against("forward (keep=1)", got, want, oracle)

    def loss_f(q_, k_, v_):
        return jnp.sum(fused_mha(q_, k_, v_, SEED, 1.0) ** 2)

    def loss_r(q_, k_, v_):
        return jnp.sum(mha_reference(q_, k_, v_) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
    with jax.default_matmul_precision("float32"):
        go = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb, cc in zip("qkv", gf, gr, go):
        _against(f"grad d{name}", a, bb, cc)

    ones = jnp.ones_like(v)
    out_d = jax.jit(lambda *a: fused_mha(*a, 0.5))(q, k, ones, SEED)
    mean = float(jnp.mean(out_d))
    print(f"dropout keep=0.5 output mean (expect ~1.0): {mean:.4f}")
    assert 0.95 < mean < 1.05, mean

    # mask regeneration: out is linear in v => sum(out) == <grad_v, v>
    gv = jax.jit(jax.grad(
        lambda v_: jnp.sum(fused_mha(q, k, v_, SEED, 0.5))))(ones)
    lin = float(jnp.vdot(gv, ones))
    tot = float(jnp.sum(out_d))
    print(f"bwd mask regeneration: <g,v>={lin:.1f} sum(out)={tot:.1f}")
    assert abs(lin - tot) / abs(tot) < 1e-3

    timeit("fused fwd (keep=1)",
           jax.jit(lambda *a: fused_mha(*a, 1.0)), q, k, v, SEED)
    timeit("xla   fwd (keep=1)", jax.jit(mha_reference), q, k, v)
    timeit("fused fwd+bwd keep=0.5",
           jax.jit(jax.grad(lambda q_, k_, v_: jnp.sum(
               fused_mha(q_, k_, v_, SEED, 0.5) ** 2), argnums=(0, 1, 2))),
           q, k, v)
    key = jax.random.PRNGKey(7)
    timeit("xla   fwd+bwd keep=0.5",
           jax.jit(jax.grad(lambda q_, k_, v_: jnp.sum(
               mha_reference(q_, k_, v_, key, 0.5) ** 2), argnums=(0, 1, 2))),
           q, k, v)
    print("ATTN VALIDATION OK")


if __name__ == "__main__":
    main()
