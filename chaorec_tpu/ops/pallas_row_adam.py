"""Fused row-sparse Adam — Pallas TPU kernel, fully in-place.

Motivation (xprof on FREEDOM/sports, see ops/indexed_adam.py): XLA cannot
update a large table parameter in place from inside the epoch scan — both
the dense-gradient path (zeros+scatter then dense Adam) and scatter-based
row updates materialize full (N, D) copies, so the (15207, 4096) feature
table costs ~570 ms/epoch in pure HBM copies.

This kernel does the WHOLE exact Adam step in one aliased sweep:

  per (TILE_N, D) tile of (p, m, v), all VMEM, aliased in-place:
    m *= b1 ; v *= b2                          (decay — correct for rows
                                                with zero gradient)
    for each batch row landing in this tile    (binary search over the
        m[r] += (1-b1) * g_r                    sorted row ids in SMEM;
        v[r] += (1-b2) * g_r^2                  gradient rows DMA'd from
                                                HBM one at a time)
    p -= lr * m̂ / (sqrt(v̂) + eps)             (reads the POST-fixup m, v:
                                                exact for both row classes)

HBM traffic: read+write of p, m, v plus B gradient rows — the floor for
dense-Adam semantics. Input rows must be sorted ascending, deduplicated
(duplicate batch rows pre-summed — dense-grad semantics), padded to a
fixed length with a sentinel >= N.

Falls back transparently to interpret mode off-TPU (tests); the XLA
variant in ops/indexed_adam.py remains the reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(scalars_ref,  # SMEM (4,): bc1, bc2, n_valid_rows, base_unused
            rows_ref,  # SMEM (B,) int32 sorted, sentinel-padded
            p_ref, m_ref, v_ref,  # VMEM (TILE_N, D) aliased tiles
            g_hbm,  # HBM (B, D) aggregated row gradients
            p_out, m_out, v_out,  # aliased outputs
            g_row, sem,  # scratch: VMEM (1, D), DMA sem
            *, tile_n: int, lr: float, b1: float, b2: float, eps: float):
    i = pl.program_id(0)
    base = i * tile_n

    m_out[:] = m_ref[:] * b1
    v_out[:] = v_ref[:] * b2

    # binary search: lo = first j with rows[j] >= base,
    #                hi = first j with rows[j] >= base + tile_n
    n_rows = rows_ref.shape[0]

    def bsearch(target):
        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi) // 2
            # guard the converged state (lo == hi can reach n_rows, where a
            # read would be out of bounds — clamped reads would re-visit
            # the final row)
            val = jnp.where(mid < n_rows,
                            rows_ref[jnp.minimum(mid, n_rows - 1)],
                            jnp.int32(2**31 - 1))
            go_right = val < target
            return (jnp.where(go_right, mid + 1, lo),
                    jnp.where(go_right, hi, mid))

        lo, _ = jax.lax.fori_loop(
            0, 32, body, (jnp.int32(0), jnp.int32(n_rows)))
        return jnp.minimum(lo, jnp.int32(n_rows))

    lo = bsearch(base)
    hi = bsearch(base + tile_n)

    # Mosaic constrains VMEM compute slices to 8-row (sublane) alignment:
    # update the aligned 8-row group containing the target row, selecting
    # the row with an iota mask. The gradient row is DMA'd into row 0 of an
    # (8, D) scratch and extracted by a masked sum (full-shape reads only).
    d = g_row.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)

    def fix_row(j, _):
        r_local = rows_ref[j] - base
        grp = pl.multiple_of((r_local // 8) * 8, 8)
        off = r_local - grp
        # DMA slices share the 8-row alignment constraint: copy the aligned
        # 8-row gradient group and mask out row j within it.
        j_grp = pl.multiple_of((j // 8) * 8, 8)
        dma = pltpu.make_async_copy(g_hbm.at[pl.ds(j_grp, 8), :], g_row, sem)
        dma.start()
        dma.wait()
        g_vec = jnp.sum(
            jnp.where(row_iota == (j - j_grp), g_row[:], 0.0), axis=0)
        sel = row_iota == off
        g_bcast = jnp.broadcast_to(g_vec[None, :], (8, d))
        m_blk = m_out[pl.ds(grp, 8), :]
        v_blk = v_out[pl.ds(grp, 8), :]
        m_out[pl.ds(grp, 8), :] = m_blk + jnp.where(
            sel, (1.0 - b1) * g_bcast, 0.0)
        v_out[pl.ds(grp, 8), :] = v_blk + jnp.where(
            sel, (1.0 - b2) * g_bcast * g_bcast, 0.0)
        return 0

    jax.lax.fori_loop(lo, hi, fix_row, 0)

    bc1 = scalars_ref[0]
    bc2 = scalars_ref[1]
    mhat = m_out[:] * (1.0 / bc1)
    vhat = v_out[:] * (1.0 / bc2)
    p_out[:] = p_ref[:] - lr * mhat / (jnp.sqrt(vhat) + eps)


@functools.partial(
    jax.jit,
    static_argnames=("lr", "b1", "b2", "eps", "interpret"))
def fused_row_adam(
    table: jnp.ndarray,  # (N, D) f32
    m: jnp.ndarray,
    v: jnp.ndarray,
    rows_sorted: jnp.ndarray,  # (B,) i32 ascending, dedup'd, sentinel >= N
    g_agg: jnp.ndarray,  # (B, D) f32 aggregated gradients (0 at sentinels)
    count: jnp.ndarray,  # () int32 step count AFTER this update
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
):
    n, d = table.shape
    # the aligned 8-row gradient DMA requires B % 8 == 0: pad with sentinels
    bpad = (-rows_sorted.shape[0]) % 8
    if bpad:
        rows_sorted = jnp.concatenate(
            [rows_sorted, jnp.full((bpad,), n, jnp.int32)])
        g_agg = jnp.concatenate(
            [g_agg, jnp.zeros((bpad, d), g_agg.dtype)])
    # tile height: 3 in + 3 out tiles (+ pipeline staging) within the 16 MB
    # VMEM budget — ~5.5 MB of named tiles measured to fit with headroom
    tile_n = max(8, min(512, (11 * 1024 * 1024 // 2) // (6 * 4 * d) // 8 * 8))
    c = count.astype(jnp.float32)
    scalars = jnp.stack([
        1.0 - b1 ** c, 1.0 - b2 ** c,
        jnp.float32(rows_sorted.shape[0]), jnp.float32(0.0),
    ])
    grid = (_cdiv(n, tile_n),)
    kernel = functools.partial(
        _kernel, tile_n=tile_n, lr=lr, b1=b1, b2=b2, eps=eps)
    out_spec = pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            out_spec, out_spec, out_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), table.dtype),
            jax.ShapeDtypeStruct((n, d), m.dtype),
            jax.ShapeDtypeStruct((n, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, rows_sorted, table, m, v, g_agg)


def prepare_sorted_rows(rows: jnp.ndarray, g_rows: jnp.ndarray, n: int):
    """Sort + aggregate duplicates; non-first duplicates become sentinel
    rows (= n, sorted to the end) with zero gradient, so the kernel's
    binary search never visits them."""
    order = jnp.argsort(rows)
    r_sorted = rows[order]
    g_sorted = g_rows[order]
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (r_sorted[1:] != r_sorted[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(boundary) - 1
    g_sum = jax.ops.segment_sum(g_sorted, seg,
                                num_segments=rows.shape[0])[seg]
    first = boundary.astype(bool)
    r_unique = jnp.where(first, r_sorted, n)
    g_unique = jnp.where(first[:, None], g_sum, 0.0)
    # re-sort so sentinels move to the end and the array stays ascending
    order2 = jnp.argsort(r_unique)
    return r_unique[order2], g_unique[order2]
