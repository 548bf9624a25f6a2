"""On-TPU validation + timing of ops/pallas_attn.fused_mha at CAM_AE shapes.

Checks (1) forward parity vs the XLA reference at keep=1, (2) grad
parity, (3) dropout mask statistics from the in-kernel hardware PRNG,
(4) fused-vs-XLA step timing at CF-Diff's (B=64, h=4, L=1034, dh=4).
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


def main():
    b, h, l, dh = 64, 4, 1034, 4
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, l, dh), jnp.float32)
    k = jax.random.normal(kk, (b, h, l, dh), jnp.float32)
    v = jax.random.normal(kv, (b, h, l, dh), jnp.float32)

    got = jax.jit(lambda *a: fused_mha(*a, 1.0))(q, k, v, SEED)
    want = jax.jit(mha_reference)(q, k, v)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"forward max-abs-err (keep=1): {err:.2e}")
    assert err < 1e-4, err

    def loss_f(q_, k_, v_):
        return jnp.sum(fused_mha(q_, k_, v_, SEED, 1.0) ** 2)

    def loss_r(q_, k_, v_):
        return jnp.sum(mha_reference(q_, k_, v_) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb in zip("qkv", gf, gr):
        e = float(jnp.max(jnp.abs(a - bb)))
        rel = e / (float(jnp.max(jnp.abs(bb))) + 1e-12)
        print(f"grad d{name} max-abs-err: {e:.2e} (rel {rel:.2e})")
        assert rel < 1e-3, (name, e, rel)

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
