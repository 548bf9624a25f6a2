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
    # float() forces a real blocking fetch — jax.block_until_ready is not
    # reliable on the remote-tunnel platform
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
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

    def make_loss(n_layers):
        def loss(g, xu, xi):
            acc = 0.0
            u, i = xu, xi
            for _ in range(n_layers):
                u, i = g.propagate(u, i)
                acc = acc + (u * u).sum() + (i * i).sum()
            return acc
        return loss

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
                      f"ov={g.ell.ov_dst.shape[0]}+{g.ell.t_ov_dst.shape[0]}",
                      flush=True)
            for n_layers in (1, 2, 3):
                loss = make_loss(n_layers)
                fb = jax.jit(jax.grad(loss, argnums=(1, 2)))
                tb = timeit(lambda g, xu, xi: fb(g, xu, xi)[0].sum(), g, xu, xi)
                print(f"  [{label}] n_layers={n_layers} fwd+bwd "
                      f"{tb*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  [{label}] failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
