"""conv_ui fwd+bwd variants: caps / bf16 messages / dense MXU.

Operators are passed as pytree ARGUMENTS (never closed over) per the
remote-compile gotcha.
"""
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
from chaorec_tpu.ops.ell import EllMatrix


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"  {name:<36} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)


def ell_conv(r, ii, xu, xi, bf16=False):
    acc_u, acc_i = xu, xi
    cu, ci = xu, xi
    for _ in range(3):
        if bf16:
            cu = cu.astype(jnp.bfloat16).astype(jnp.float32)
            ci = ci.astype(jnp.bfloat16).astype(jnp.float32)
        cu, ci = r.matvec(ci), r.t.matvec(cu) + ii.matvec(ci)
        acc_u = acc_u + cu
        acc_i = acc_i + ci
    return acc_u * 0.25, acc_i * 0.25


def dense_conv(Rb, IIb, xu, xi):
    def dmat(a, x):
        return jax.lax.dot_general(
            a, x.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_u, acc_i = xu, xi
    cu, ci = xu, xi
    for _ in range(3):
        cu, ci = dmat(Rb, ci), dmat(Rb.T, cu) + dmat(IIb, ci)
        acc_u = acc_u + cu
        acc_i = acc_i + ci
    return acc_u * 0.25, acc_i * 0.25


def fwd_bwd(conv):
    def f(ops, xu, xi):
        (au, ai), pull = jax.vjp(lambda u, i: conv(*ops, u, i), xu, xi)
        gu, gi = pull((au, ai))
        return au.sum() + ai.sum() + gu.sum() + gi.sum()
    return jax.jit(f)


def main():
    sys.argv[1:] = ["--Model", "GUME", "--data_path", "sports",
                    "--data_root", "/root/reference/Data"]
    cfg = parse_cli()
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    m = build_model(cfg, ds)
    U, I = m.num_user, m.num_item
    xu = jnp.ones((U, 192), jnp.float32)
    xi = jnp.ones((I, 192), jnp.float32)

    timeit("current K=8 fp32", fwd_bwd(ell_conv), (m.r_norm, m.ii_norm),
           xu, xi)
    timeit("current K=8 bf16-msg",
           fwd_bwd(lambda r, ii, u, i: ell_conv(r, ii, u, i, bf16=True)),
           (m.r_norm, m.ii_norm), xu, xi)

    edges = np.unique(ds.train_edges[:, :2], axis=0)
    du = np.bincount(edges[:, 0], minlength=U)
    di = np.bincount(edges[:, 1], minlength=I)
    wu = np.where(du > 0, du ** -0.5, 0.0)
    wi_ = np.where(di > 0, di ** -0.5, 0.0)
    ew = (wu[edges[:, 0]] * wi_[edges[:, 1]]).astype(np.float32)
    for cap, cap_t in ((16, 32), (32, 64)):
        r2 = EllMatrix.from_coo(edges[:, 0], edges[:, 1], ew, U, I,
                                cap=cap, cap_t=cap_t)
        print(f"    [cap={cap}/{cap_t} ov={r2.ov_dst.shape[0]} "
              f"t_ov={r2.t_ov_dst.shape[0]}]", flush=True)
        timeit(f"K={cap}/{cap_t} fp32", fwd_bwd(ell_conv),
               (r2, m.ii_norm), xu, xi)

    dense_r = np.zeros((U, I), np.float32)
    dense_r[edges[:, 0], edges[:, 1]] = ew
    Rb = jnp.asarray(dense_r, jnp.bfloat16)
    del dense_r
    # dense I-I from the model's intersection COO (host rebuild)
    vi = m.image_adj  # not needed; rebuild intersection cheaply
    IIb = jnp.zeros((I, I), jnp.bfloat16)
    ii_host = np.zeros((I, I), np.float32)
    # reconstruct from the ELL operator buffers on host
    iin = m.ii_norm
    idx = np.asarray(iin.idx)
    w = np.asarray(iin.w)
    rr = np.repeat(np.arange(I), idx.shape[1])
    ii_host[rr, idx.ravel()] = w.ravel()
    IIb = jnp.asarray(ii_host, jnp.bfloat16)
    del ii_host
    timeit("dense bf16 MXU", fwd_bwd(dense_conv), (Rb, IIb), xu, xi)


if __name__ == "__main__":
    main()
