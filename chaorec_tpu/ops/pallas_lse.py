"""Streaming logsumexp(q @ k.T / tau) — Pallas TPU kernel.

The SSL family's full-catalog contrastive denominators
(Model/SimGCL.py:16-31, Model/SGL.py:195-210, Model/DiffMM.py:354-361,
Model/GFormer.py:597-603, ...) compute ``logsumexp(q @ k.T / tau, -1)``
where k is the FULL user/item table. XLA materializes the (B, N) logit
matrix in HBM (e.g. 1024 x 60k fp32 = 245MB per batch step) three times
(write, read for max, read for sumexp). This kernel streams k in VMEM
tiles flash-attention style: running row-max / row-sumexp accumulators
live in VMEM scratch, the logits never touch HBM. The backward pass
(custom VJP) streams the same tiles to form softmax-weighted gradients.

HBM traffic per batch: O(B*E + N*E) instead of O(B*N).

Falls back to ``jax.nn.logsumexp`` off-TPU (tests run the kernel in
interpreter mode separately; production CPU paths use XLA).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128
TILE_N = 512
_NEG = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _pad_rows(x, mult):
    pad = _cdiv(x.shape[0], mult) * mult - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


# ----------------------------------------------------------------------
def _fwd_kernel(nv_ref, q_ref, k_ref, out_ref, m_ref, s_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        s_ref[:] = jnp.zeros_like(s_ref)

    logits = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * TILE_N
    logits = jnp.where(col < nv_ref[0], logits, _NEG)

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    s_ref[:] = (s_ref[:] * jnp.exp(m_old - m_new)
                + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
    m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = m_ref[:] + jnp.log(s_ref[:])


def _fwd(q, k, n_valid, interpret):
    b = q.shape[0]
    grid = (_cdiv(b, TILE_B), _cdiv(k.shape[0], TILE_N))
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, q.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, q.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_B, 1), jnp.float32),
            pltpu.VMEM((TILE_B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), q, k)


# ----------------------------------------------------------------------
def _dq_kernel(nv_ref, q_ref, k_ref, lse_ref, g_ref, out_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    logits = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * TILE_N
    p = jnp.where(col < nv_ref[0], jnp.exp(logits - lse_ref[:]), 0.0)
    acc_ref[:] += jnp.dot(p, k_ref[:].astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:] * g_ref[:]


def _dk_kernel(nv_ref, q_ref, k_ref, lse_ref, g_ref, out_ref, acc_ref):
    i = pl.program_id(1)  # streams over B

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    logits = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_B, TILE_N)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    col = col + pl.program_id(0) * TILE_N
    p = jnp.where(col < nv_ref[0], jnp.exp(logits - lse_ref[:]), 0.0)
    pg = p * g_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        pg, q_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bwd_pallas(q, k, n_valid, lse, g, interpret):
    b, e = q.shape
    n = k.shape[0]
    nv = jnp.asarray([n_valid], jnp.int32)
    dq = pl.pallas_call(
        _dq_kernel,
        grid=(_cdiv(b, TILE_B), _cdiv(n, TILE_N)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, e), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_B, e), jnp.float32)],
        interpret=interpret,
    )(nv, q, k, lse, g)
    dk = pl.pallas_call(
        _dk_kernel,
        grid=(_cdiv(n, TILE_N), _cdiv(b, TILE_B)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, e), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, e), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, e), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, e), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_N, e), jnp.float32)],
        interpret=interpret,
    )(nv, q, k, lse, g)
    return dq, dk


# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lse_padded(q, k, n_valid: int, interpret: bool):
    return _fwd(q, k, n_valid, interpret)[:, 0]


def _lse_padded_fwd(q, k, n_valid, interpret):
    lse = _fwd(q, k, n_valid, interpret)
    return lse[:, 0], (q, k, lse)


def _lse_padded_bwd(n_valid, interpret, res, g):
    q, k, lse = res
    dq, dk = _bwd_pallas(q, k, n_valid, lse, g[:, None], interpret)
    return dq.astype(q.dtype), dk.astype(k.dtype)


_lse_padded.defvjp(_lse_padded_fwd, _lse_padded_bwd)


def streaming_logsumexp(q: jnp.ndarray, k: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """logsumexp(q @ k.T, axis=-1) without materializing (B, N) in HBM.

    Temperature scaling belongs in q (``q / tau``) so gradients stay
    exact. Differentiable in q and k.
    """
    b, n = q.shape[0], k.shape[0]
    qp = _pad_rows(q.astype(jnp.float32), TILE_B)
    kp = _pad_rows(k.astype(jnp.float32), TILE_N)
    return _lse_padded(qp, kp, n, interpret)[:b]


def use_pallas_lse(b: int, n: int) -> bool:
    """Heuristic: worth streaming once the logit matrix is HBM-sized and
    we are actually on TPU."""
    return (jax.default_backend() == "tpu" and b * n >= 1_000_000
            and n >= TILE_N)
