"""Mean Average Distance over-smoothing diagnostic.

Reference: MAD.py:13-20 (sklearn pairwise cosine distances). Imported by
the reference's MMSSL/MGCL but never called in the training path; provided
here as a jit-compiled diagnostic with identical semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _mad_kernel(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = x * jax.lax.rsqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-24)
    dist = 1.0 - jnp.dot(n, n.T, preferred_element_type=jnp.float32)
    masked = dist * mask
    divide = jnp.sum(masked != 0, axis=1) + 1e-8
    node_dist = jnp.sum(masked, axis=1) / divide
    return jnp.mean(node_dist)


def mad_value(in_arr, mask_arr, digt_num: int = 4) -> float:
    """MAD.py:13-20: mean over nodes of masked mean cosine distance."""
    v = _mad_kernel(jnp.asarray(in_arr, jnp.float32),
                    jnp.asarray(mask_arr, jnp.float32))
    return float(np.round(float(v), digt_num))
