"""Measure TPU row-gather / scatter / sorted-reduce primitive rates.

These primitives ARE the edge-space propagation cost model (NGCF, SGL,
AdaGCL, Grade, GRCN, MHRec seg machinery). ops/ell.py quotes ~50 GB/s
for XLA's random row-gather on v5e; this pins that number per dtype and
per op so floor analyses (PARITY.md) cite a measured table:

  gather          out = x[idx]                  (E, D) from (N, D)
  scatter_add     out = zeros.at[idx].add(v)    unsorted segment_sum
  seg_sorted      segment_sum(indices_are_sorted=True)
  seg_sum pallas  ops/ell.py sorted reduce, Pallas single-pass scan
  seg_sum xla     same with the default multi-pass jnp.cumsum

Timing is tunnel-safe: the axon relay makes dispatch-side timers and
``block_until_ready`` unreliable (~35 ms RTT, async fetch), so each op
runs inside an on-device ``fori_loop`` whose int32 carry perturbs the
index vector (runtime value 0, compile-time unknown — defeats XLA
loop-invariant code motion), and the reported ms is the DELTA between a
k-iteration and 3k-iteration dispatch, each synced by fetching the
scalar carry to the host.

Usage: python scripts/bench_gather.py [E] [N] [D] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def device_ms(fn, ten, idx, extras, nclip, iters):
    """Per-call device ms of ``fn(ten, idx, *extras)``.

    The loop carry c is always 0 at runtime; ``idx + c`` keeps a data
    dependence from iteration i's output (via isnan(out[0])) into
    iteration i+1's input so the body cannot be hoisted or elided.
    """

    def run(ten, idx, *extras, k):
        def body(_, c):
            out = fn(ten, jnp.minimum(idx + c, nclip - 1), *extras)
            # Full-output reduce: without it XLA dead-code-eliminates the
            # unread (E, D) elements (slicing out[0] measures a scalar).
            # Costs one extra read pass over the output bytes (~0.06 ms
            # per 48 MB at HBM rate) — noted, not subtracted.
            s = out.sum().astype(jnp.float32)
            return c + jnp.isnan(s).astype(jnp.int32)

        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    r1 = jax.jit(functools.partial(run, k=iters))
    r3 = jax.jit(functools.partial(run, k=3 * iters))
    int(r1(ten, idx, *extras))  # compile + warm (host fetch = real sync)
    int(r3(ten, idx, *extras))
    t0 = time.perf_counter()
    int(r1(ten, idx, *extras))
    t1 = time.perf_counter()
    int(r3(ten, idx, *extras))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters) * 1e3


def main() -> None:
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 186_826
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 34_464
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    rs = np.random.default_rng(0)
    idx_rand = jnp.asarray(rs.integers(0, n, e), jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    print(f"E={e} N={n} D={d} iters={iters} "
          f"(row bytes fp32={4 * d}, bf16={2 * d})", flush=True)
    rows = []

    def add(name, fn, ten, idx, extras, nclip, nbytes):
        ms = device_ms(fn, ten, idx, extras, nclip, iters)
        rows.append((name, ms, nbytes))
        print(f"  {name:<28} {ms:8.3f} ms {nbytes / ms / 1e6:8.1f} GB/s",
              flush=True)

    for dt, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rs.standard_normal((n, d)), dt)
        v = jnp.asarray(rs.standard_normal((e, d)), dt)
        bytes_g = e * d * x.dtype.itemsize

        add(f"gather rand ({name})", lambda x, i: x[i], x, idx_rand, (),
            n, bytes_g)
        add(f"gather sorted ({name})", lambda x, i: x[i], x, idx_sorted, (),
            n, bytes_g)
        add(f"scatter_add rand ({name})",
            lambda v, i: jax.ops.segment_sum(v, i, num_segments=n),
            v, idx_rand, (), n, bytes_g)
        add(f"seg_sorted ({name})",
            lambda v, i: jax.ops.segment_sum(
                v, i, num_segments=n, indices_are_sorted=True),
            v, idx_sorted, (), n, bytes_g)

    # ell.py sorted reduce (fp32, its accumulator dtype): Pallas
    # single-pass scan vs the XLA multi-pass cumsum it replaced.
    from chaorec_tpu.ops.ell import build_segment_transpose, seg_sum

    perm, ptr = build_segment_transpose(idx_rand, n)
    v32 = jnp.asarray(rs.standard_normal((e, d)), jnp.float32)
    # seg_sum's primal never reads flat_idx (it gathers via perm), so the
    # loop-carry perturbation must ride perm or the body gets hoisted.
    os.environ["CHAOREC_PALLAS_SCAN"] = "1"
    try:
        add("seg_sum pallas (fp32)",
            lambda v, perm, i, ptr: seg_sum(v, i, perm, ptr),
            v32, perm, (idx_rand, ptr), e, e * d * 4)
    finally:
        del os.environ["CHAOREC_PALLAS_SCAN"]
    add("seg_sum xla-cumsum (fp32)",
        lambda v, perm, i, ptr: seg_sum(v, i, perm, ptr),
        v32, perm, (idx_rand, ptr), e, e * d * 4)
    # streaming reference: elementwise scale of the same bytes (the +c
    # dependence fuses into the multiply — no extra pass).
    add("stream scale (fp32)",
        lambda v, i: v * 1.0000001 + i[0].astype(jnp.float32) * 1e-30,
        v32, idx_rand, (), n, e * d * 4)
    print(f"\n{'op':<28} {'ms':>8} {'GB/s':>8}")
    for name, ms, nbytes in rows:
        print(f"{name:<28} {ms:8.3f} {nbytes / ms / 1e6:8.1f}")


if __name__ == "__main__":
    main()
