"""Test whether the TPU worker kills long-running device programs.

Grade/sports and AdaGCL/netfilx whole-epoch programs crash the worker
("kernel fault") while every component of the same programs passes, and
the crash threshold tracks dataset edge count — i.e. program EXECUTION
TIME, not content. This probe runs a content-free jitted fori_loop of
matmuls sized to a target duration and fetches the result: if the
worker dies past some duration, the fix is chunking long epochs into
bounded-duration programs, not debugging kernels.

Usage: python scripts/probe_duration.py <seconds> [<seconds> ...]
"""

import sys
import time

import jax
import jax.numpy as jnp


def run_for(target_s: float, rate_iters_per_s: float) -> None:
    n = max(1, int(target_s * rate_iters_per_s))

    @jax.jit
    def prog(x, n):
        def body(_, x):
            return jnp.tanh(x @ x) * 0.999 + 1e-3

        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.ones((1024, 1024), jnp.bfloat16) * 1e-3
    t0 = time.perf_counter()
    out = prog(x, n)
    sig = float(out.sum())  # real host fetch (block_until_ready lies)
    dt = time.perf_counter() - t0
    print(f"target={target_s:.0f}s iters={n} wall={dt:.1f}s "
          f"sig={sig:.4e} OK", flush=True)


def main() -> None:
    targets = [float(a) for a in sys.argv[1:]] or [15, 30, 45, 60, 90]
    t0 = time.perf_counter()
    run_for(0, 1)  # compile with n=1
    print(f"compile+1iter {time.perf_counter() - t0:.1f}s", flush=True)
    # calibrate with a sample long enough to swamp dispatch overhead
    # (the first probe calibrated on 2000 iters ~ 0.1 s device and read
    # a 37x-low rate, so its "300s" target ran 8s)
    n_cal = 400_000
    t0 = time.perf_counter()
    run_for(0.0005, 2 * n_cal * 1000)  # n = n_cal
    rate = n_cal / max(time.perf_counter() - t0, 1e-3)
    print(f"calibrated {rate:.0f} iters/s", flush=True)
    for s in targets:
        run_for(s, rate)


if __name__ == "__main__":
    main()
