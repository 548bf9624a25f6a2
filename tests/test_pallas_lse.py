"""Pallas streaming logsumexp == XLA logsumexp (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.ops.pallas_lse import streaming_logsumexp

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("b,n,e", [(64, 600, 16), (130, 1100, 32)])
def test_streaming_lse_matches_xla(b, n, e):
    rs = np.random.default_rng(0)
    q = jnp.asarray(rs.standard_normal((b, e)), jnp.float32) * 3.0
    k = jnp.asarray(rs.standard_normal((n, e)), jnp.float32)

    ref = jax.nn.logsumexp(q @ k.T, axis=-1)
    out = streaming_logsumexp(q, k, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_streaming_lse_gradients_match():
    rs = np.random.default_rng(1)
    b, n, e = 64, 700, 16
    q = jnp.asarray(rs.standard_normal((b, e)), jnp.float32)
    k = jnp.asarray(rs.standard_normal((n, e)), jnp.float32)
    w = jnp.asarray(rs.standard_normal((b,)), jnp.float32)

    def f_ref(q, k):
        return jnp.sum(w * jax.nn.logsumexp(q @ k.T, axis=-1))

    def f_pal(q, k):
        return jnp.sum(w * streaming_logsumexp(q, k, interpret=True))

    gq_ref, gk_ref = jax.grad(f_ref, argnums=(0, 1))(q, k)
    gq, gk = jax.grad(f_pal, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-5)


def test_micro_full_catalog_cl_fast_matches_exact():
    """MICRO's streaming log-domain InfoNCE == the reference's direct
    (I, I) formulation in value AND gradient (the fast path never
    materializes the catalog-sized exponential matrices)."""
    import numpy as np

    from chaorec_tpu.models.micro import full_catalog_cl

    rs = np.random.default_rng(5)
    z1 = jnp.asarray(rs.standard_normal((200, 16)), jnp.float32)
    z2 = jnp.asarray(rs.standard_normal((200, 16)), jnp.float32)
    tau = 0.2

    exact = full_catalog_cl(z1, z2, tau, fast=False)
    fast = full_catalog_cl(z1, z2, tau, fast=True)
    np.testing.assert_allclose(float(fast), float(exact), rtol=2e-5)

    g_e = jax.grad(lambda a, b: full_catalog_cl(a, b, tau, False),
                   argnums=(0, 1))(z1, z2)
    g_f = jax.grad(lambda a, b: full_catalog_cl(a, b, tau, True),
                   argnums=(0, 1))(z1, z2)
    for ge, gf in zip(g_e, g_f):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                                   rtol=1e-4, atol=1e-6)
