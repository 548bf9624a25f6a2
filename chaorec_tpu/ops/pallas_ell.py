"""Pallas TPU kernel: ELL spmm with a VMEM-resident source table.

``out[r] = sum_k w[r, k] * x[idx[r, k]]`` — the core sparse-propagation
primitive (replacing the reference's torch-scatter CUDA path,
BasicGCN.py:21-59). The XLA formulation (ops/ell.py) lowers the gather
to HLO ``gather``, which runs well below HBM rate for 256-byte rows;
this kernel instead pins the FULL source table ``x`` in VMEM (catalog
tables at rec-model sizes are small: microlens items 14079 x 64 fp32 =
3.6 MB, users 11.9 MB, both under the ~16 MB VMEM budget) and streams
``(idx, w)`` row tiles through, so every gathered row is a VMEM read,
not an HBM transaction.

Used when ``x`` fits the VMEM budget (``fits_vmem``); callers fall back
to the XLA path otherwise. Differentiable via custom VJP: d/dx needs the
transposed graph (supplied by the caller exactly like ops/ell.py's
EllMatrix does); d/dw is a gather-dot, reusing the forward's layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 512
# leave headroom for idx/w tiles + out tile + double buffering
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _cdiv(a, b):
    return -(-a // b)


def fits_vmem(num_src_rows: int, dim: int, dtype_bytes: int = 4) -> bool:
    return num_src_rows * dim * dtype_bytes <= VMEM_BUDGET_BYTES


def _ell_kernel(idx_ref, w_ref, x_ref, out_ref):
    k_slots = idx_ref.shape[1]

    def row(r, _):
        acc = w_ref[r, 0] * x_ref[idx_ref[r, 0], :]
        for k in range(1, k_slots):
            acc = acc + w_ref[r, k] * x_ref[idx_ref[r, k], :]
        out_ref[r, :] = acc
        return 0

    # Mosaic's fori lowering only supports unroll=1 or full unroll;
    # unroll=4 fails to lower on real TPU (works only in interpret mode).
    jax.lax.fori_loop(0, out_ref.shape[0], row, 0, unroll=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_spmm_raw(vals, idx, x, interpret=False):
    r, k = vals.shape
    d = x.shape[1]
    pad = _cdiv(r, TILE_R) * TILE_R - r
    if pad:
        # padded rows gather x[0] with weight 0 — cheap and safe
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
    grid = (_cdiv(r + pad, TILE_R),)
    out = pl.pallas_call(
        _ell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full x
        ],
        out_specs=pl.BlockSpec((TILE_R, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + pad, d), jnp.float32),
        interpret=interpret,
    )(idx, vals.astype(jnp.float32), x.astype(jnp.float32))
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ell_spmm_pallas(vals, idx, x, t_ell, interpret=False):
    """ELL spmm with VMEM-resident x.

    ``t_ell = (t_vals, t_idx)`` is the transposed graph in the same ELL
    form (rows indexed by x's rows), used by the VJP wrt ``x``; pass the
    pair from ``EllMatrix``'s transposed orientation or a topk graph's
    transpose. Gradients flow to ``vals`` and ``x``; ``idx``/``t_ell``
    are structure.
    """
    return _ell_spmm_raw(vals, idx, x, interpret)


def _fwd(vals, idx, x, t_ell, interpret):
    return _ell_spmm_raw(vals, idx, x, interpret), (vals, idx, x, t_ell)


def _bwd(interpret, res, g):
    vals, idx, x, (t_vals, t_idx) = res
    # d/dx = A^T g : the transposed ELL's forward — same kernel
    dx = _ell_spmm_raw(t_vals, t_idx, g, interpret)
    # d/dvals[r, k] = <g[r], x[idx[r, k]]>
    dvals = jnp.einsum(
        "rd,rkd->rk", g, jnp.take(x, idx, axis=0),
        preferred_element_type=jnp.float32,
    )
    return dvals, None, dx.astype(x.dtype), None


ell_spmm_pallas.defvjp(_fwd, _bwd)
