"""Row-sparse Adam == dense optax.adam on scatter-materialized gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.ops.indexed_adam import (
    TableOptState,
    init_table_state,
    row_adam_update,
)

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("dup", [False, True])
def test_matches_dense_adam(dup):
    rs = np.random.default_rng(0)
    n, d, b = 37, 8, 12
    table = jnp.asarray(rs.standard_normal((n, d)).astype(np.float32))
    lr = 1e-2

    dense_opt = optax.adam(lr)
    dense_params = table
    dense_state = dense_opt.init(dense_params)
    sparse_params = table
    sparse_state = init_table_state(table)

    for step in range(1, 6):
        if dup:
            rows = jnp.asarray(
                rs.integers(0, 6, b).astype(np.int32))  # many duplicates
        else:
            rows = jnp.asarray(
                rs.choice(n, size=b, replace=False).astype(np.int32))
        g_rows = jnp.asarray(rs.standard_normal((b, d)).astype(np.float32))

        g_dense = jnp.zeros_like(table).at[rows].add(g_rows)
        upd, dense_state = dense_opt.update(g_dense, dense_state, dense_params)
        dense_params = optax.apply_updates(dense_params, upd)

        sparse_params, sparse_state = row_adam_update(
            sparse_params, sparse_state, rows, g_rows,
            jnp.asarray(step, jnp.int32), lr)

        np.testing.assert_allclose(
            np.asarray(sparse_params), np.asarray(dense_params),
            rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(sparse_state.m),
                               np.asarray(dense_state[0].mu),
                               rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(sparse_state.v),
                               np.asarray(dense_state[0].nu),
                               rtol=2e-5, atol=1e-9)


def test_zero_rows_pure_decay():
    """Rows hit with zero gradient and untouched rows both follow the pure
    Adam decay trajectory (update still nonzero when m is nonzero)."""
    rs = np.random.default_rng(1)
    table = jnp.asarray(rs.standard_normal((10, 4)).astype(np.float32))
    state = init_table_state(table)
    rows = jnp.asarray([0, 1], np.int32)
    g = jnp.asarray(rs.standard_normal((2, 4)).astype(np.float32))
    t1, s1 = row_adam_update(table, state, rows, g,
                             jnp.asarray(1, jnp.int32), 1e-2)
    # second step: no gradient anywhere
    t2, s2 = row_adam_update(t1, s1, rows, jnp.zeros_like(g),
                             jnp.asarray(2, jnp.int32), 1e-2)
    # rows 0,1 must keep moving (momentum decays but is nonzero)
    assert not np.allclose(np.asarray(t2[:2]), np.asarray(t1[:2]))
    # untouched rows never move off their init
    np.testing.assert_array_equal(np.asarray(t2[2:]), np.asarray(table[2:]))


def test_bf16_storage_tracks_fp32_trajectory():
    """--relaxed_precision bf16: tables/moments stored bf16, math fp32.

    The bf16 run must (a) keep bf16 dtypes end to end and (b) track the
    fp32 trajectory within bf16 rounding (~0.8% relative) over several
    steps — storage rounding only, no compounding math error."""
    import jax.numpy as jnp

    rs = np.random.default_rng(7)
    t32 = jnp.asarray(rs.standard_normal((64, 16)).astype(np.float32))
    t16 = t32.astype(jnp.bfloat16)
    s32, s16 = init_table_state(t32), init_table_state(t16)
    assert s16.m.dtype == jnp.bfloat16
    for step in range(1, 6):
        rows = jnp.asarray(rs.integers(0, 64, 32), np.int32)
        g = jnp.asarray(rs.standard_normal((32, 16)).astype(np.float32))
        t32, s32 = row_adam_update(t32, s32, rows, g,
                                   jnp.asarray(step, jnp.int32), 1e-2)
        t16, s16 = row_adam_update(t16, s16, rows, g,
                                   jnp.asarray(step, jnp.int32), 1e-2)
    assert t16.dtype == jnp.bfloat16 and s16.v.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(t16, np.float32), np.asarray(t32),
        rtol=0, atol=0.01 * float(np.abs(np.asarray(t32)).max()))
