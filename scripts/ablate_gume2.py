"""Pallas-vs-XLA ELL matvec on GUME/sports real graph shapes."""
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
from chaorec_tpu.ops.pallas_ell import _ell_spmm_raw


def timeit(name, fn, *args, iters=50):
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
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    m = build_model(cfg, ds)
    r = m.r_norm
    print(f"r_norm: {r.num_rows}x{r.num_cols} K={r.idx.shape[1]} "
          f"ov={r.ov_dst.shape[0]} | t K={r.t_idx.shape[1]} "
          f"t_ov={r.t_ov_dst.shape[0]}")

    for d in (64, 192):
        xi = jnp.ones((r.num_cols, d), jnp.float32)
        xu = jnp.ones((r.num_rows, d), jnp.float32)
        timeit(f"xla  R  @ x{d}", jax.jit(lambda x: r.matvec(x)), xi)
        timeit(f"xla  R.T@ x{d}", jax.jit(lambda x: r.t.matvec(x)), xu)

    # Pallas padded-block only (ignores overflow): is the gather faster?
    xi64 = jnp.ones((r.num_cols, 64), jnp.float32)
    xu64 = jnp.ones((r.num_rows, 64), jnp.float32)
    timeit("pallas R padded-block x64",
           jax.jit(lambda x: _ell_spmm_raw(r.w, r.idx, x)), xi64)
    timeit("pallas R.T padded-block x64",
           jax.jit(lambda x: _ell_spmm_raw(r.t_w, r.t_idx, x)), xu64)

    # Wider cap, no overflow at all (rebuild with cap=maxdeg)
    from chaorec_tpu.ops.ell import EllMatrix
    edges = np.unique(ds.train_edges[:, :2], axis=0)
    degs = np.bincount(edges[:, 1], minlength=ds.num_item)
    k32 = 32
    keep = np.ones(len(edges), bool)
    big = EllMatrix.from_coo(
        edges[keep, 1], edges[keep, 0], np.ones(keep.sum(), np.float32),
        ds.num_item, ds.num_user, cap=k32)
    print(f"items-as-rows K=32: ov={big.ov_dst.shape[0]} of {len(edges)}")
    timeit("xla  K=32 items-rows x64",
           jax.jit(lambda x: big.matvec(x)), xu64)
    timeit("pallas K=32 items-rows x64",
           jax.jit(lambda x: _ell_spmm_raw(big.w, big.idx, x)), xu64)


if __name__ == "__main__":
    main()
