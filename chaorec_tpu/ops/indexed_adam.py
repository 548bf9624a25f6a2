"""Row-sparse Adam for large feature/embedding tables — exact dense-Adam math.

Several multimodal models train their raw modality feature tables
(``nn.Embedding.from_pretrained(freeze=False)`` in the reference, e.g.
Model/FREEDOM.py:52-57): a (num_item, 4096) fp32 parameter whose per-step
gradient is nonzero on only the ~2B batch rows. The naive path (what both
torch and a plain ``jax.grad`` + ``optax.adam`` do) materializes the dense
gradient — a full-table zero-init + scatter — and then runs dense Adam:
~2.25 GB of HBM traffic per step for FREEDOM/sports, 50% of the epoch
(xprof: multiply_add_fusion 405ms + grad-scatter fusion 163ms/epoch).

This module removes the dense gradient entirely while computing the SAME
update, to float rounding:

  m_t = b1 m_{t-1} + (1-b1) g        (g zero off the batch rows)
  v_t = b2 v_{t-1} + (1-b2) g^2
  p_t = p_{t-1} - lr * m̂_t / (sqrt(v̂_t) + eps)

Step 1 (sparse): scatter pre-decay-compensated row terms
  m[rows] += (1-b1)/b1 * g_rows          (linear in g: duplicate rows sum
                                          to the dense grad — scatter-add
                                          is exact)
  v[rows] += (1-b2)/b2 * (sum_dup g)^2   (squared AFTER aggregating
                                          duplicates via a sorted
                                          segment-sum; scatter at first
                                          occurrences only)
Step 2 (dense, one fused elementwise sweep):
  m *= b1 ; v *= b2 ; p -= lr * m̂ / (sqrt(v̂) + eps)

so the only full-table traffic is the unavoidable read/write of (p, m, v).
Verified exactly equal to ``optax.adam`` on dense scattered grads in
tests/test_indexed_adam.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TableOptState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray


def init_table_state(table: jnp.ndarray) -> TableOptState:
    return TableOptState(jnp.zeros_like(table), jnp.zeros_like(table))


def table_adam_update(
    table: jnp.ndarray,
    state: TableOptState,
    rows: jnp.ndarray,
    g_rows: jnp.ndarray,
    count: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, TableOptState]:
    """Backend dispatcher: on TPU the fused in-place Pallas kernel
    (ops/pallas_row_adam.py — one aliased sweep over (p, m, v)); elsewhere
    the XLA formulation below. Identical results (both pinned against
    optax.adam in tests).

    bf16 tables (--relaxed_precision bf16) take the XLA path on every
    backend: the Pallas kernel's 8-row slice alignment assumes fp32
    sublanes (bf16 tiles need 16), and XLA's sweep already halves the
    (p, m, v) HBM bytes — which is the entire point of the mode. Math
    runs in fp32 per step; only STORAGE is bf16.

    D must be a multiple of 128 for the Pallas kernel (Mosaic lane
    tiling: the (8, D) gradient-group slice must align to 128 lanes —
    the r5 re-audit at D=64 produced a Mosaic compile error, not wrong
    numbers). Production feature tables are 4096/384-wide; narrow
    tables route to the XLA path."""
    if (jax.default_backend() == "tpu" and table.dtype == jnp.float32
            and table.shape[1] % 128 == 0):
        from chaorec_tpu.ops.pallas_row_adam import (
            fused_row_adam,
            prepare_sorted_rows,
        )

        r_s, g_s = prepare_sorted_rows(rows, g_rows, table.shape[0])
        p, m, v = fused_row_adam(table, state.m, state.v, r_s, g_s, count,
                                 lr, b1, b2, eps)
        return p, TableOptState(m, v)
    return row_adam_update(table, state, rows, g_rows, count, lr, b1, b2, eps)


def row_adam_update(
    table: jnp.ndarray,
    state: TableOptState,
    rows: jnp.ndarray,  # (B,) int32, duplicates allowed
    g_rows: jnp.ndarray,  # (B, D) gradient w.r.t. table[rows]
    count: jnp.ndarray,  # step count AFTER this update (1-based)
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, TableOptState]:
    """One exact Adam step on a table with row-sparse gradients.

    Structured as (A) one fused dense sweep that is correct for every row
    with zero gradient — pure decay m*=b1, v*=b2 and the decayed-momentum
    parameter step — followed by (B) a batch-rows-only fixup computed from
    values gathered BEFORE the sweep. Gathers/scatters touch only B rows;
    the dense traffic is the unavoidable read+write of (p, m, v)."""
    m, v = state
    store_dtype = table.dtype
    g_rows = g_rows.astype(jnp.float32)
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** c
    bc2 = 1.0 - b2 ** c

    # gather pre-sweep values of the touched rows (B x D, cheap);
    # per-step MATH is fp32 even for bf16-stored tables — only the
    # dense (p, m, v) arrays round back to store_dtype.
    m_rows = m[rows].astype(jnp.float32)
    v_rows = v[rows].astype(jnp.float32)
    p_rows = table[rows].astype(jnp.float32)

    # (A) dense sweep — zero-gradient Adam step for ALL rows
    m32 = b1 * m.astype(jnp.float32)
    v32 = b2 * v.astype(jnp.float32)
    table = (table.astype(jnp.float32)
             - lr * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
             ).astype(store_dtype)
    m = m32.astype(store_dtype)
    v = v32.astype(store_dtype)

    # (B) fixup for the batch rows: exact Adam with their true gradients.
    # Duplicates are aggregated first (dense-grad semantics: both terms
    # need the per-row SUM of duplicate contributions); every sorted
    # position carries its row's TOTAL sum, so the ``set`` scatters are
    # idempotent — identical values no matter which duplicate lands last.
    order = jnp.argsort(rows)
    r_sorted = rows[order]
    g_sorted = g_rows[order]
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (r_sorted[1:] != r_sorted[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(boundary) - 1
    g_sum = jax.ops.segment_sum(
        g_sorted, seg, num_segments=rows.shape[0])[seg]
    m_new = b1 * m_rows[order] + (1.0 - b1) * g_sum
    v_new = b2 * v_rows[order] + (1.0 - b2) * g_sum ** 2
    p_new = p_rows[order] - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    m = m.at[r_sorted].set(m_new.astype(store_dtype))
    v = v.at[r_sorted].set(v_new.astype(store_dtype))
    table = table.at[r_sorted].set(p_new.astype(store_dtype))
    return table, TableOptState(m, v)
