"""Parameter initializers matching torch semantics used by the reference.

torch ``xavier_normal_`` / ``xavier_uniform_`` on a 2-D tensor (N, D) use
fan_in = D (dim 1), fan_out = N (dim 0):
  normal std = gain * sqrt(2 / (fan_in + fan_out))
  uniform bound = gain * sqrt(6 / (fan_in + fan_out))
(Model/BPR.py:30-31, Model/LightGCN.py:69-70 rely on these.)
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _fans(shape: Tuple[int, ...]) -> Tuple[int, int]:
    if len(shape) < 2:
        raise ValueError("xavier init requires >= 2 dims")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def xavier_normal(rng: jax.Array, shape: Tuple[int, ...], gain: float = 1.0,
                  dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = _fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype)


def xavier_uniform(rng: jax.Array, shape: Tuple[int, ...], gain: float = 1.0,
                   dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = _fans(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def normal_init(rng: jax.Array, shape: Tuple[int, ...], std: float = 0.1,
                dtype=jnp.float32) -> jnp.ndarray:
    return std * jax.random.normal(rng, shape, dtype)
