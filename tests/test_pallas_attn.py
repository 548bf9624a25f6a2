"""fused_mha (interpret mode) vs the plain-XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.ops.pallas_attn import fused_mha, mha_reference

SEED = jnp.zeros((1,), jnp.int32)


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.fast
@pytest.mark.parametrize("lq,lk", [(70, 70), (300, 130)])
def test_fwd_matches_reference(lq, lk):
    q = _rand((2, 3, lq, 4), 0)
    k = _rand((2, 3, lk, 4), 1)
    v = _rand((2, 3, lk, 4), 2)
    got = fused_mha(q, k, v, SEED, 1.0, True)
    want = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.fast
def test_grads_match_reference():
    q = _rand((1, 2, 90, 4), 3)
    k = _rand((1, 2, 50, 4), 4)
    v = _rand((1, 2, 50, 4), 5)
    w = _rand((1, 2, 90, 4), 6)  # cotangent weighting

    def f_k(q_, k_, v_):
        return jnp.sum(fused_mha(q_, k_, v_, SEED, 1.0, True) * w)

    def f_r(q_, k_, v_):
        return jnp.sum(mha_reference(q_, k_, v_) * w)

    gk = jax.grad(f_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


@pytest.mark.fast
def test_dropout_mask_statistics_and_bwd_regeneration():
    """keep=0.5 dropout: output is an unbiased estimator and the backward
    regenerates the same mask (finite-diff agreement on a linear slice)."""
    q = _rand((1, 1, 64, 4), 7)
    k = _rand((1, 1, 64, 4), 8)
    v = jnp.ones((1, 1, 64, 4), jnp.float32)
    try:
        out = fused_mha(q, k, v, SEED, 0.5, True)
    except Exception:
        pytest.skip("interpret mode lacks pltpu PRNG support here")
    # rows of softmax sum to 1 and v == 1, so each dropped row output is
    # mean 1 with mask values {0, 2}: check the global mean is near 1.
    assert 0.8 < float(jnp.mean(out)) < 1.2

    # VJP regenerates the same mask: d/dv of sum(out) equals the column
    # sums of the dropped attention matrix; compare against the forward's
    # implied linear map via JVP identity sum(out) == <ones, out>.
    g = jax.grad(lambda v_: jnp.sum(
        fused_mha(q, k, v_, SEED, 0.5, True)))(v)
    # out is linear in v, so sum(out(v)) == <g, v>
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(jnp.sum(out)),
                               rtol=1e-4)
