"""Pallas TPU kernel: fused small-head cross-attention with in-kernel
attention-weight dropout.

Built for CF-Diff's CAM_AE (reference Model/CF_Diff.py:77-135): 1034
scalar tokens at d_model=16, 4 heads => d_head=4. XLA materializes the
(B, h, L, L) score/softmax/dropout-mask tensors in HBM — ~25 GB of
traffic per training step for ~2 GFLOP of math. This kernel keeps each
(q-block, L) score tile in VMEM, softmaxes and drops it in place with
the hardware PRNG (pltpu.prng_random_bits), and writes only the (L, dh)
output, so HBM sees q/k/v/out and nothing quadratic.

Layout: grid = (B*h, num_q_blocks); K/V for the current (batch, head)
stay resident in VMEM across the inner q-block axis. The backward kernel
recomputes scores/softmax/mask per q-block from the same per-(g, qb)
PRNG seed (bitwise-identical mask regeneration) and accumulates dK/dV
in a VMEM-resident output block across the sequential inner grid steps.

The VJP treats the dropout mask as constant structure (exactly like
torch: the mask sampled in forward is what backward differentiates
through).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256


def _cdiv(a, b):
    return -(-a // b)


def _mask_bits(shape, keep_prob):
    """uint32 PRNG bits -> {0, 1/keep} float mask."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(keep_prob * 2.0 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh, 1.0 / keep_prob, 0.0).astype(jnp.float32)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dot_nt(a, b):
    """a @ b.T without materializing the transpose (Mosaic-friendly)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a.T @ b without materializing the transpose."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale,
                keep_prob, n_qb):
    # NOTE: no key-side mask is needed — the K/V block covers the full
    # logical Lk (only the q axis is padded, and padded q ROWS are
    # sliced off by the wrapper; their dK/dV contributions vanish
    # because the padded cotangent rows are zero).
    g = pl.program_id(0)
    qb = pl.program_id(1)
    s = _dot_nt(q_ref[0], k_ref[0]) * scale
    a = _softmax_rows(s)
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + g * n_qb + qb)
        a = a * _mask_bits(a.shape, keep_prob)
    o_ref[0] = jnp.dot(a, v_ref[0],
                       preferred_element_type=jnp.float32)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale, keep_prob, n_qb):
    g = pl.program_id(0)
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros(dk_ref.shape[1:], dk_ref.dtype)
        dv_ref[0] = jnp.zeros(dv_ref.shape[1:], dv_ref.dtype)

    s = _dot_nt(q_ref[0], k_ref[0]) * scale
    a = _softmax_rows(s)
    if keep_prob < 1.0:
        pltpu.prng_seed(seed_ref[0] + g * n_qb + qb)
        d = _mask_bits(a.shape, keep_prob)
        ad = a * d
    else:
        ad = a
    gout = g_ref[0]
    dv_ref[0] += _dot_tn(ad, gout)
    dad = _dot_nt(gout, v_ref[0])
    da = dad * d if keep_prob < 1.0 else dad
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    dq_ref[0] = jnp.dot(ds, k_ref[0],
                        preferred_element_type=jnp.float32) * scale
    dk_ref[0] += _dot_tn(ds, q_ref[0]) * scale


def _pad_q(t, lq_p):
    pad = lq_p - t.shape[2]
    if pad:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return t


@functools.partial(jax.jit,
                   static_argnames=("keep_prob", "interpret"))
def _mha_fwd_raw(q, k, v, seed, keep_prob, interpret=False):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    g = b * h
    lq_p = _cdiv(lq, TILE_Q) * TILE_Q
    n_qb = lq_p // TILE_Q
    qf = _pad_q(q, lq_p).reshape(g, lq_p, dh)
    kf = k.reshape(g, lk, dh)
    vf = v.reshape(g, lk, dh)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=1.0 / math.sqrt(dh),
                          keep_prob=keep_prob, n_qb=n_qb),
        grid=(g, n_qb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_Q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_Q, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, lq_p, dh), jnp.float32),
        interpret=interpret,
    )(seed, qf, kf, vf)
    return out.reshape(b, h, lq_p, dh)[:, :, :lq]


@functools.partial(jax.jit,
                   static_argnames=("keep_prob", "interpret"))
def _mha_bwd_raw(q, k, v, seed, gout, keep_prob, interpret=False):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    g = b * h
    lq_p = _cdiv(lq, TILE_Q) * TILE_Q
    n_qb = lq_p // TILE_Q
    qf = _pad_q(q, lq_p).reshape(g, lq_p, dh)
    gf = _pad_q(gout, lq_p).reshape(g, lq_p, dh)
    kf = k.reshape(g, lk, dh)
    vf = v.reshape(g, lk, dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=1.0 / math.sqrt(dh),
                          keep_prob=keep_prob, n_qb=n_qb),
        grid=(g, n_qb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_Q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_Q, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, lq_p, dh), jnp.float32),
            jax.ShapeDtypeStruct((g, lk, dh), jnp.float32),
            jax.ShapeDtypeStruct((g, lk, dh), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qf, kf, vf, gf)
    dq = dq.reshape(b, h, lq_p, dh)[:, :, :lq]
    return dq, dk.reshape(b, h, lk, dh), dv.reshape(b, h, lk, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_mha(q, k, v, seed, keep_prob: float = 1.0,
              interpret: bool = False):
    """softmax(q k^T / sqrt(dh)) [dropout keep_prob] @ v, fused in VMEM.

    q: (B, h, Lq, dh); k, v: (B, h, Lk, dh); seed: int32 (1,) array
    seeding the in-kernel PRNG (ignored when keep_prob == 1.0). Gradients
    flow to q, k, v.
    """
    return _mha_fwd_raw(q, k, v, seed, keep_prob, interpret)


def _vjp_fwd(q, k, v, seed, keep_prob, interpret):
    return _mha_fwd_raw(q, k, v, seed, keep_prob, interpret), (q, k, v, seed)


def _vjp_bwd(keep_prob, interpret, res, gout):
    q, k, v, seed = res
    dq, dk, dv = _mha_bwd_raw(q, k, v, seed, gout, keep_prob, interpret)
    return dq, dk, dv, None


fused_mha.defvjp(_vjp_fwd, _vjp_bwd)


def use_fused_attn() -> bool:
    """Kernel on real TPU; plain-XLA path elsewhere (CPU tests).

    ``CHAOREC_NO_FUSED_ATTN=1`` forces the XLA path even on TPU — the
    escape hatch the quality queue uses if on-chip kernel validation
    (scripts/validate_attn_tpu.py) ever fails."""
    import os

    if os.environ.get("CHAOREC_NO_FUSED_ATTN"):
        return False
    return jax.default_backend() == "tpu"


def mha_reference(q, k, v, rng=None, keep_prob: float = 1.0):
    """Plain-XLA reference (and CPU fallback): same math, jax.random
    dropout (mask stream differs from the kernel's — distribution-level
    equivalence only, exactly like torch-vs-jax)."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    a = jax.nn.softmax(s, axis=-1)
    if rng is not None and keep_prob < 1.0:
        a = a * jax.random.bernoulli(rng, keep_prob, a.shape) / keep_prob
    return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                      preferred_element_type=jnp.float32)
