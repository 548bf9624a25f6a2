"""Blocked single-pass prefix sum vs jnp.cumsum (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.ops.pallas_scan import chunked_cumsum

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("m,d", [(512, 64), (1300, 64), (7, 8), (2048, 1)])
def test_matches_cumsum(m, d):
    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.standard_normal((m, d)), jnp.float32)
    got = chunked_cumsum(x, block=512, interpret=True)
    want = jnp.cumsum(x, axis=0)
    assert got.shape == (m, d)
    # fp32 prefix with a different summation order: tolerance scales
    # with the running total (same model as ops/ell.py seg_sum).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_segment_sums_via_prefix():
    """End-to-end: seg_sum boundary-diff semantics on the kernel path."""
    rs = np.random.default_rng(1)
    m, d, n = 1000, 16, 37
    idx = np.sort(rs.integers(0, n, m))
    v = rs.standard_normal((m, d)).astype(np.float32)
    cs = np.asarray(chunked_cumsum(jnp.asarray(v), block=256,
                                   interpret=True))
    cs = np.concatenate([np.zeros((1, d), np.float32), cs], 0)
    ptr = np.searchsorted(idx, np.arange(n + 1))
    got = cs[ptr[1:]] - cs[ptr[:-1]]
    want = np.zeros((n, d), np.float32)
    np.add.at(want, idx, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
