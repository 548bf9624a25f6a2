"""Measure TPU row-gather / scatter / sorted-reduce primitive rates.

These four primitives ARE the edge-space propagation cost model (NGCF,
SGL, AdaGCL, Grade, MHRec seg machinery). ops/ell.py quotes ~50 GB/s for
XLA's random row-gather on v5e; this pins that number per dtype and per
op so floor analyses (PARITY.md) cite a measured table:

  gather          out = x[idx]                  (E, D) from (N, D)
  scatter_add     out = zeros.at[idx].add(v)    unsorted segment_sum
  seg_sorted      segment_sum(indices_are_sorted=True)
  cumsum_reduce   ops/ell.py prefix-sum path

Usage: python scripts/bench_gather.py [E] [N] [D] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return name, ms


def main() -> None:
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 186_826
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 34_464
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    rs = np.random.default_rng(0)
    idx_rand = jnp.asarray(rs.integers(0, n, e), jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    print(f"E={e} N={n} D={d} iters={iters} "
          f"(row bytes fp32={4 * d}, bf16={2 * d})", flush=True)
    rows = []
    for dt, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rs.standard_normal((n, d)), dt)
        v = jnp.asarray(rs.standard_normal((e, d)), dt)
        bytes_g = e * d * x.dtype.itemsize

        g = jax.jit(lambda x, i: x[i])
        rows.append((*timeit(f"gather rand ({name})", g, x, idx_rand,
                             iters=iters), bytes_g))
        rows.append((*timeit(f"gather sorted ({name})", g, x, idx_sorted,
                             iters=iters), bytes_g))
        sc = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=n))
        rows.append((*timeit(f"scatter_add rand ({name})", sc, v, idx_rand,
                             iters=iters), bytes_g))
        ss = jax.jit(lambda v, i: jax.ops.segment_sum(
            v, i, num_segments=n, indices_are_sorted=True))
        rows.append((*timeit(f"seg_sorted ({name})", ss, v, idx_sorted,
                             iters=iters), bytes_g))
    # ell.py prefix-sum reduce (fp32 only: its accumulator dtype)
    from chaorec_tpu.ops.ell import build_segment_transpose, seg_sum

    perm, ptr = build_segment_transpose(idx_rand, n)
    v32 = jnp.asarray(rs.standard_normal((e, d)), jnp.float32)
    cs = jax.jit(lambda v: seg_sum(v, idx_rand, perm, ptr))
    rows.append((*timeit("cumsum_reduce (fp32)", cs, v32, iters=iters),
                 e * d * 4))
    # streaming reference: a plain elementwise copy of the same bytes
    cp = jax.jit(lambda v: v * 1.0000001)
    rows.append((*timeit("stream copy (fp32)", cp, v32, iters=iters),
                 e * d * 4))
    print(f"{'op':<28} {'ms':>8} {'GB/s':>8}")
    for name, ms, nbytes in rows:
        print(f"{name:<28} {ms:8.3f} {nbytes / ms / 1e6:8.1f}")


if __name__ == "__main__":
    main()
