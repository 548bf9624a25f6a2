"""Microbenchmark: sparse-propagation paths at real dataset scale.

Compares one full propagate step (both directions) + its backward for
the segment-sum, ELL, and (when it fits) dense-MXU paths on the real
TPU. Usage: python scripts/bench_spmm.py [dataset] [dim]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from chaorec_tpu.data.loading import DATASET_STATS  # noqa: E402
from chaorec_tpu.graphs.norm_adj import build_norm_adj  # noqa: E402


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "microlens"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nu, ni = DATASET_STATS[name]
    edges = np.load(f"/root/reference/Data/{name}/train.npy").astype(np.int64)
    edges[:, 1] -= nu
    edges = edges.astype(np.int32)
    print(f"{name}: U={nu} I={ni} E={len(edges)} dim={dim}")

    rs = np.random.default_rng(0)
    xu = jnp.asarray(rs.standard_normal((nu, dim)).astype(np.float32))
    xi = jnp.asarray(rs.standard_normal((ni, dim)).astype(np.float32))

    def loss(g, xu, xi):
        u, i = g.propagate(xu, xi)
        u2, i2 = g.propagate(u, i)
        return (u2 * u2).sum() + (i2 * i2).sum()

    fwd = jax.jit(lambda g, xu, xi: loss(g, xu, xi))
    fwdbwd = jax.jit(jax.grad(loss, argnums=(1, 2)))

    for label, kwargs in [
        ("segment", dict(use_dense=False, use_ell=False)),
        ("ell", dict(use_dense=False, use_ell=True)),
        ("dense-bf16", dict(use_dense=True, compute_dtype="bfloat16")),
    ]:
        try:
            g = build_norm_adj(edges, nu, ni, **kwargs)
            if g.ell is not None:
                print(f"  [{label}] K={g.ell.idx.shape[1]} "
                      f"Kt={g.ell.t_idx.shape[1]} "
                      f"ov={g.ell.ov_dst.shape[0]}+{g.ell.t_ov_dst.shape[0]}")
            tf = timeit(fwd, g, xu, xi)
            tb = timeit(fwdbwd, g, xu, xi)
            print(f"  [{label}] fwd(2 layers) {tf*1e3:8.3f} ms   "
                  f"fwd+bwd {tb*1e3:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  [{label}] failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
