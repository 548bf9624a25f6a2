"""Single-pass blocked prefix sum (Pallas TPU kernel).

The scatter-free segmented reductions in ops/ell.py (seg_sum /
seg_edge_weighted_sum — the MHRec hypergraph-attention aggregation,
Model/MHRec.py:37-89) reduce a sorted (M, D) message tensor to segment
sums via ``cumsum`` + boundary-pointer diffs. XLA lowers a large
``jnp.cumsum`` on TPU as a multi-pass log-depth scan — O(log M) full
HBM round trips over the (M, D) tensor, which dominates the attention
step at M ~ 2e5. This kernel produces the identical inclusive prefix
sum in ONE pass: a sequential grid over row blocks, each block's local
prefix computed as a lower-triangular matmul on the MXU (fp32,
``precision=HIGHEST``), plus a carried (1, D) running total in VMEM
scratch (TPU grids execute sequentially, so the carry is well-defined).

Precision model: identical to the XLA path's contract in
ops/ell.py:seg_sum — fp32 prefix values whose absolute error scales
with the running total; only the summation ORDER differs (blocked
sequential + MXU tree instead of XLA's log-depth pairs), which is
within the documented tolerance of every seg_sum consumer (zero-mean
message tensors).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 512


def use_pallas_scan() -> bool:
    """Opt-in (``CHAOREC_PALLAS_SCAN=1``) and TPU-only.

    Measured on v5e at M=187k, D=64 (parity_logs/gather_rates.txt): the
    blocked tri-matmul scan is ~12% SLOWER than XLA's multi-pass
    ``jnp.cumsum`` inside seg_sum (1.77 vs 1.58 ms) — the fp32-HIGHEST
    MXU passes outweigh the saved HBM round trips at these sizes. The
    kernel stays available for larger-M workloads; default is XLA."""
    if not os.environ.get("CHAOREC_PALLAS_SCAN"):
        return False
    return jax.default_backend() == "tpu"


def _cumsum_kernel(x_ref, o_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    blk = x_ref[:].astype(jnp.float32)  # (B, D)
    b = blk.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tri = (row >= col).astype(jnp.float32)  # inclusive lower triangle
    bc = jax.lax.dot(
        tri, blk,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) + carry_ref[:]
    o_ref[:] = bc
    carry_ref[:] = bc[b - 1:b, :]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def chunked_cumsum(x: jnp.ndarray, block: int = _BLOCK,
                   interpret: bool = False) -> jnp.ndarray:
    """Inclusive ``jnp.cumsum(x, axis=0)`` over an (M, D) fp32 tensor in
    a single HBM pass. Zero-pads M up to a block multiple (padding rows
    only extend the prefix past M and are sliced off)."""
    m, d = x.shape
    nb = pl.cdiv(m, block)
    mp = nb * block
    xp = jnp.pad(x.astype(jnp.float32), ((0, mp - m), (0, 0)))
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mp, d), jnp.float32),
        interpret=interpret,
    )(xp)
    return out[:m]


def prefix_cumsum(v: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """The cumsum used by the segmented reductions: Pallas single-pass
    on TPU, ``jnp.cumsum`` elsewhere. ``v`` is (M, D) in sorted-segment
    order; returns the (M, D) fp32 inclusive prefix."""
    if use_pallas_scan() or interpret:
        return chunked_cumsum(v, interpret=interpret)
    return jnp.cumsum(v.astype(jnp.float32), axis=0)
