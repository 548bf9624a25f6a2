"""Distance correlation (DGCF's factor-decorrelation regularizer).

Parity with ``utils.distance_correlation`` (utils.py:83-108): centered
pairwise Euclidean distance matrices with the reference's exact epsilon
placements (+1e-8 inside both sqrts, +1e-10 in the final denominator).
"""

from __future__ import annotations

import jax.numpy as jnp


def _centered_distance(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.sum(x ** 2, axis=1, keepdims=True)
    d2 = jnp.maximum(r - 2.0 * jnp.dot(x, x.T, preferred_element_type=jnp.float32)
                     + r.T, 0.0)
    d = jnp.sqrt(d2 + 1e-8)
    return (
        d
        - jnp.mean(d, axis=0, keepdims=True)
        - jnp.mean(d, axis=1, keepdims=True)
        + jnp.mean(d)
    )


def _dcov(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    n = d1.shape[0]
    return jnp.sqrt(jnp.maximum(jnp.sum(d1 * d2) / (n * n), 0.0) + 1e-8)


def distance_correlation(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    d1 = _centered_distance(x1)
    d2 = _centered_distance(x2)
    dcov_12 = _dcov(d1, d2)
    dcov_11 = _dcov(d1, d1)
    dcov_22 = _dcov(d2, d2)
    return dcov_12 / (jnp.sqrt(jnp.maximum(dcov_11 * dcov_22, 0.0)) + 1e-10)
