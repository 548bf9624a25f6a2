"""Pallas fused row-sparse Adam (interpret mode) == optax dense Adam."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.ops.pallas_row_adam import fused_row_adam, prepare_sorted_rows

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("dup", [False, True])
@pytest.mark.parametrize("shape", [(40, 128), (37, 256)])
def test_matches_dense_adam(dup, shape):
    rs = np.random.default_rng(0)
    n, d = shape
    b = 16
    lr = 1e-2
    table = jnp.asarray(rs.standard_normal((n, d)).astype(np.float32))
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    dense_opt = optax.adam(lr)
    dense_params = table
    dense_state = dense_opt.init(dense_params)

    for step in range(1, 5):
        if dup:
            rows = jnp.asarray(rs.integers(0, 5, b).astype(np.int32))
        else:
            rows = jnp.asarray(rs.choice(n, b, replace=False).astype(np.int32))
        g_rows = jnp.asarray(rs.standard_normal((b, d)).astype(np.float32))

        g_dense = jnp.zeros_like(table).at[rows].add(g_rows)
        upd, dense_state = dense_opt.update(g_dense, dense_state, dense_params)
        dense_params = optax.apply_updates(dense_params, upd)

        r_s, g_s = prepare_sorted_rows(rows, g_rows, n)
        table, m, v = fused_row_adam(
            table, m, v, r_s, g_s, jnp.asarray(step, jnp.int32), lr,
            interpret=True)

        np.testing.assert_allclose(np.asarray(table), np.asarray(dense_params),
                                   rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(m), np.asarray(dense_state[0].mu),
                               rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(dense_state[0].nu),
                               rtol=2e-5, atol=1e-9)
