"""zero_grad_adam_tail == a literal optax adam loop with g = 0.

The tail op replaces per-batch zero-gradient Adam sweeps (torch-1.11
``zero_grad(set_to_none=False)`` semantics, reference requirements.txt:39)
with one closed-form pass; these tests pin exact agreement, including the
bias-correction count trajectory and the nu==0 (never-touched element)
edge case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.ops.adam_tail import (
    tree_zero_grad_adam_tail,
    zero_grad_adam_tail,
)

B1, B2, EPS = 0.9, 0.999, 1e-8


def _loop_reference(p, mu, nu, count0, n_steps, lr):
    """Literal optax adam applied n_steps times with zero gradients,
    starting from a state whose (mu, nu, count) match the inputs."""
    opt = optax.adam(lr, b1=B1, b2=B2, eps=EPS)
    state = opt.init(p)
    state = (optax.ScaleByAdamState(
        count=jnp.asarray(count0, jnp.int32), mu=mu, nu=nu),) + state[1:]
    g = jax.tree.map(jnp.zeros_like, p)
    for _ in range(n_steps):
        upd, state = opt.update(g, state, p)
        p = optax.apply_updates(p, upd)
    return p, state[0].mu, state[0].nu


@pytest.mark.parametrize("n_steps", [1, 7, 64])
@pytest.mark.parametrize("count0", [1, 5, 937])
def test_tail_matches_optax_loop(rng, n_steps, count0):
    rs = np.random.default_rng(count0 * 1000 + n_steps)
    shape = (157, 33)
    p = jnp.asarray(rs.standard_normal(shape), jnp.float32)
    g = jnp.asarray(rs.standard_normal(shape) * 10.0 ** rs.uniform(
        -9, 1, shape), jnp.float32)  # grads spanning tiny..large magnitudes
    # moments as if one real-gradient update just happened
    mu = (1 - B1) * g
    nu = (1 - B2) * g * g
    lr = 1e-3

    want_p, want_mu, want_nu = _loop_reference(p, mu, nu, count0, n_steps, lr)
    got_p, got_mu, got_nu = zero_grad_adam_tail(
        p, mu, nu, jnp.int32(count0), n_steps, lr, B1, B2, EPS)

    # The closed form evaluates b^k with one fp32 pow per step index
    # while the literal loop multiplies k times; each fp32 multiply
    # contributes up to 2^-24 relative error, so the loop's moments
    # drift from the (more accurate) closed form by ~n_steps * 6e-8.
    # rtol scales accordingly (measured: 1.03e-6 at n_steps=64).
    mom_rtol = 1e-6 + 6e-8 * n_steps
    np.testing.assert_allclose(got_p, want_p, rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(got_mu, want_mu, rtol=mom_rtol)
    np.testing.assert_allclose(got_nu, want_nu, rtol=mom_rtol)


def test_tail_never_touched_elements_stay_put(rng):
    """mu == nu == 0 rows (elements with no gradient ever) must not move
    (0/eps == 0), and n_steps == 0 is the identity."""
    p = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    z = jnp.zeros_like(p)
    got_p, got_mu, got_nu = zero_grad_adam_tail(
        p, z, z, jnp.int32(3), 50, 1e-3, B1, B2, EPS)
    np.testing.assert_array_equal(got_p, p)
    np.testing.assert_array_equal(got_mu, z)
    np.testing.assert_array_equal(got_nu, z)
    same = zero_grad_adam_tail(p, z, z, jnp.int32(3), 0, 1e-3, B1, B2, EPS)
    np.testing.assert_array_equal(same[0], p)


def test_tree_tail_matches_leafwise(rng):
    rs = np.random.default_rng(7)
    params = {"a": jnp.asarray(rs.standard_normal((5, 3)), jnp.float32),
              "b": jnp.asarray(rs.standard_normal((4,)), jnp.float32)}
    g = jax.tree.map(
        lambda x: jnp.asarray(rs.standard_normal(x.shape), jnp.float32),
        params)
    mu = jax.tree.map(lambda x: (1 - B1) * x, g)
    nu = jax.tree.map(lambda x: (1 - B2) * x * x, g)
    tp, tmu, tnu = tree_zero_grad_adam_tail(
        params, mu, nu, jnp.int32(2), 9, 1e-3, B1, B2, EPS)
    for k in params:
        wp, wmu, wnu = zero_grad_adam_tail(
            params[k], mu[k], nu[k], jnp.int32(2), 9, 1e-3, B1, B2, EPS)
        np.testing.assert_array_equal(tp[k], wp)
        np.testing.assert_array_equal(tmu[k], wmu)
        np.testing.assert_array_equal(tnu[k], wnu)
