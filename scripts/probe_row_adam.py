"""Bisect the on-chip fused_row_adam FAIL from the r5 kernel re-audit.

parity_logs/kernel_reaudit_r5.txt: err(p,m,v)=(1.07e-01,5.42e-03,5.12e-05)
at (N, D, B) = (12351, 384, 1024) on the real v5e — while interpret mode
(CPU tests, tests/test_indexed_adam.py) is exact vs optax. Each case
below is a small fetch-synced comparison against the XLA dense-semantics
reference; the case matrix varies one suspect at a time:

  n_tiles   : 1 tile (N<=tile_n) vs many (pipeline/aliasing interaction)
  dup rows  : without vs with duplicate batch rows (prepare_sorted_rows)
  B vs N    : batch larger/smaller than a tile
  D         : 128 / 384 / 4096 (lane-tiling width class)
  rows mix  : clustered rows (same 8-group) vs spread

Usage: python scripts/probe_row_adam.py            (real chip)
       JAX_PLATFORMS=cpu python ... --interpret    (control)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def xla_ref(p, m, v, rows, g, t, lr, b1, b2, eps):
    # DENSE zero-grad Adam semantics (torch-1.11: every row decays and
    # steps every step; rows outside the batch have gradient 0) — the
    # contract of ops/indexed_adam.row_adam_update and the Pallas kernel,
    # pinned vs optax in tests/test_indexed_adam.py. The r5 reaudit's
    # first xla_ref wrongly froze untouched rows, producing a false FAIL
    # (err(p)=0.107 is just the zero-grad step on rows with tiny v).
    gd = jnp.zeros_like(p).at[rows].add(g)
    m2 = b1 * m + (1 - b1) * gd
    v2 = b2 * v + (1 - b2) * gd * gd
    mh = m2 / (1 - b1 ** t)
    vh = v2 / (1 - b2 ** t)
    p2 = p - lr * mh / (jnp.sqrt(vh) + eps)
    return p2, m2, v2


def run_case(name, n, d, b, rows, interpret, seed=0):
    from chaorec_tpu.ops.pallas_row_adam import (fused_row_adam,
                                                 prepare_sorted_rows)

    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    p = jax.random.normal(ks[0], (n, d), jnp.float32)
    m = jax.random.normal(ks[1], (n, d), jnp.float32) * 0.01
    v = jnp.abs(jax.random.normal(ks[2], (n, d), jnp.float32)) * 0.01
    g = jax.random.normal(ks[3], (b, d), jnp.float32)
    rows = jnp.asarray(rows, jnp.int32)
    t, lr, b1, b2, eps = 3, 1e-3, 0.9, 0.999, 1e-8

    want = jax.jit(lambda *a: xla_ref(*a, t, lr, b1, b2, eps))(
        p, m, v, rows, g)

    def ours(p, m, v, rows, g):
        rs, gs = prepare_sorted_rows(rows, g, n)
        return fused_row_adam(p, m, v, rs, gs, jnp.int32(t), lr, b1, b2,
                              eps, interpret=interpret)

    got = jax.jit(ours)(p, m, v, rows, g)
    errs = []
    bad_rows = None
    for a_, b_ in zip(got, want):
        diff = np.abs(np.asarray(a_, np.float64) - np.asarray(b_, np.float64))
        errs.append(float(diff.max()))
        if bad_rows is None:
            rb = diff.max(axis=1)
            bad_rows = np.nonzero(rb > 1e-5)[0]
    ok = all(e < 1e-5 for e in errs)
    extra = ""
    if not ok and bad_rows is not None and len(bad_rows):
        head = bad_rows[:8].tolist()
        extra = (f" bad_p_rows={len(bad_rows)} first={head}"
                 f" tile_of_first={[r // 512 for r in head]}"
                 f" grp_off={[int(r % 8) for r in head]}")
    print(f"{name:38s} | err(p,m,v)=({errs[0]:.2e},{errs[1]:.2e},"
          f"{errs[2]:.2e}) | {'OK' if ok else 'FAIL'}{extra}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend={jax.default_backend()}", flush=True)
    rs = np.random.default_rng(7)

    cases = []
    # the failing audit case verbatim
    cases.append(("audit: n12351 d384 b1024 rand",
                  12351, 384, 1024, rs.integers(0, 12351, 1024)))
    # no duplicates (unique rows)
    uniq = rs.choice(12351, 1024, replace=False)
    cases.append(("uniq rows (no dups)", 12351, 384, 1024, uniq))
    # single tile
    cases.append(("single tile n=512 b=64",
                  512, 384, 64, rs.integers(0, 512, 64)))
    cases.append(("single tile n=512 b=64 uniq",
                  512, 384, 64, rs.choice(512, 64, replace=False)))
    # two tiles, rows only in tile 0 / only in tile 1
    cases.append(("two tiles, rows in tile0",
                  1024, 384, 64, rs.integers(0, 512, 64)))
    cases.append(("two tiles, rows in tile1",
                  1024, 384, 64, rs.integers(512, 1024, 64)))
    # clustered in one 8-row group (max intra-group serial updates)
    cases.append(("clustered one group", 12351, 384, 64,
                  rs.integers(0, 8, 64) + 4096))
    # width classes
    cases.append(("d=128", 12351, 128, 1024, rs.integers(0, 12351, 1024)))
    cases.append(("d=4096 n2048 b256", 2048, 4096, 256,
                  rs.integers(0, 2048, 256)))
    # batch bigger than one tile's rows
    cases.append(("b=4096 > tile", 12351, 384, 4096,
                  rs.integers(0, 12351, 4096)))

    results = {}
    for name, n, d, b, rows in cases:
        try:
            results[name] = run_case(name, n, d, b, rows, args.interpret)
        except Exception as e:  # noqa: BLE001
            print(f"{name:38s} | ERROR {type(e).__name__}: {e}", flush=True)
            results[name] = False
    print("summary:", results, flush=True)


if __name__ == "__main__":
    main()
