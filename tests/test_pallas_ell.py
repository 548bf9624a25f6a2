"""Pallas ELL spmm kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.ops.ell import ell_rows_matvec
from chaorec_tpu.ops.pallas_ell import ell_spmm_pallas, fits_vmem

pytestmark = pytest.mark.fast


def _topk_graph(rs, n, k):
    vals = rs.standard_normal((n, k)).astype(np.float32)
    idx = rs.integers(0, n, (n, k)).astype(np.int32)
    return jnp.asarray(vals), jnp.asarray(idx)


def _transpose_ell(vals, idx, n):
    """Dense-roundtrip transpose (test helper only)."""
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (np.repeat(np.arange(n), idx.shape[1]),
                  np.asarray(idx).ravel()), np.asarray(vals).ravel())
    at = a.T
    k = max(8, int((at != 0).sum(1).max()))
    k = -(-k // 8) * 8
    tv = np.zeros((n, k), np.float32)
    ti = np.zeros((n, k), np.int32)
    for r in range(n):
        nz = np.nonzero(at[r])[0]
        tv[r, : len(nz)] = at[r, nz]
        ti[r, : len(nz)] = nz
    return jnp.asarray(tv), jnp.asarray(ti)


def test_pallas_ell_matches_xla(rng):
    n, k, d = 100, 8, 16
    vals, idx = _topk_graph(rng, n, k)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    t_ell = _transpose_ell(vals, idx, n)
    ref = ell_rows_matvec(vals, idx, x)
    got = ell_spmm_pallas(vals, idx, x, t_ell, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_ell_padded_rows(rng):
    # R not a multiple of the tile: padded rows must not pollute output
    n, k, d = 530, 8, 8
    vals, idx = _topk_graph(rng, n, k)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    t_ell = _transpose_ell(vals, idx, n)
    ref = ell_rows_matvec(vals, idx, x)
    got = ell_spmm_pallas(vals, idx, x, t_ell, True)
    assert got.shape == (n, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_ell_gradients(rng):
    n, k, d = 60, 8, 8
    vals, idx = _topk_graph(rng, n, k)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    t_ell = _transpose_ell(vals, idx, n)

    def f_pallas(vals, x):
        return (ell_spmm_pallas(vals, idx, x, t_ell, True) ** 2).sum()

    def f_xla(vals, x):
        return (ell_rows_matvec(vals, idx, x) ** 2).sum()

    gv_p, gx_p = jax.grad(f_pallas, argnums=(0, 1))(vals, x)
    gv_x, gx_x = jax.grad(f_xla, argnums=(0, 1))(vals, x)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)


def test_fits_vmem():
    assert fits_vmem(14079, 64)       # microlens item table
    assert not fits_vmem(150179, 64)  # electronics user table
