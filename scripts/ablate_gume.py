"""One-off GUME/sports forward ablation: which piece owns the 21 ms."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.config import grid_combinations, load_yaml_config, parse_cli
from chaorec_tpu.data.loading import data_load
from chaorec_tpu.models import build_model


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"  {name:<30} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")


def main():
    sys.argv[1:] = ["--Model", "GUME", "--data_path", "sports",
                    "--data_root", "/root/reference/Data"]
    cfg = parse_cli()
    yaml_cfg = load_yaml_config(cfg.Model)
    first = next(iter(grid_combinations(yaml_cfg)), {})
    for k, v in first.items():
        if hasattr(cfg, k):
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if cur is not None else v)
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    m = build_model(cfg, ds)
    params = m.init_params(jax.random.PRNGKey(0))

    xu192 = jnp.zeros((m.num_user, 192), jnp.float32)
    xi192 = jnp.zeros((m.num_item, 192), jnp.float32)
    xi64 = jnp.zeros((m.num_item, 64), jnp.float32)

    timeit("r_norm.matvec 192", jax.jit(lambda x: m.r_norm.matvec(x)), xi192)
    timeit("r_norm.t.matvec 192", jax.jit(lambda x: m.r_norm.t.matvec(x)), xu192)
    timeit("ii_norm.matvec 192", jax.jit(lambda x: m.ii_norm.matvec(x)), xi192)
    timeit("conv_ui full (3 layers)",
           jax.jit(lambda u, i: m._conv_ui(u, i)), xu192, xi192)
    from chaorec_tpu.ops.ell import ell_rows_matvec
    timeit("image_adj knn matvec 64",
           jax.jit(lambda x: ell_rows_matvec(*m.image_adj, x)), xi64)
    timeit("reduce matmuls",
           jax.jit(lambda p: (
               jax.nn.sigmoid((p["v_feat"] @ p["image_reduce_w"].T
                               + p["image_reduce_b"]) @ p["image_trans_w"].T
                              + p["image_trans_b"]),
               jax.nn.sigmoid((p["t_feat"] @ p["text_reduce_w"].T
                               + p["text_reduce_b"]) @ p["text_trans_w"].T
                              + p["text_trans_b"]))), params)
    timeit("full forward", jax.jit(lambda p: m.forward(p)), params)
    print(f"  caps: r_norm K={m.r_norm.idx.shape[1]} "
          f"t K={m.r_norm.t_idx.shape[1]} ov={m.r_norm.ov_dst.shape[0]} "
          f"t_ov={m.r_norm.t_ov_dst.shape[0]}")


if __name__ == "__main__":
    main()
