"""Real-TPU timing: Pallas VMEM-resident ELL spmm vs the XLA gather path.

Usage: python scripts/bench_pallas_ell.py [N] [K] [D]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chaorec_tpu.ops.ell import ell_rows_matvec
from chaorec_tpu.ops.pallas_ell import ell_spmm_pallas


def t(label, fn, n=30):
    float(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out)
    print(f"{label}: {(time.perf_counter() - t0) / n * 1e3:.3f} ms",
          flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14079
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    key = jax.random.PRNGKey(0)
    vals = jax.jit(lambda k_: jax.random.normal(k_, (n, k)))(key)
    idx = jax.jit(lambda k_: jax.random.randint(k_, (n, k), 0, n))(key)
    x = jax.jit(lambda k_: jax.random.normal(k_, (n, d)))(key)
    jax.block_until_ready((vals, idx, x))
    t_ell = (vals, idx)  # structure-only for fwd timing
    print(f"N={n} K={k} D={d}", flush=True)
    xla = jax.jit(lambda v, i, x: ell_rows_matvec(v, i, x).sum())
    pls = jax.jit(lambda v, i, x: ell_spmm_pallas(v, i, x, t_ell).sum())
    t("xla gather+einsum", lambda: xla(vals, idx, x))
    t("pallas vmem-resident", lambda: pls(vals, idx, x))


if __name__ == "__main__":
    main()
