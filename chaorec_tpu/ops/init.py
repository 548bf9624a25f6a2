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


def torch_linear_init(rng: jax.Array, out_features: int, in_features: int,
                      dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch ``nn.Linear`` default init: weight kaiming-uniform(a=sqrt(5))
    = U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias same bound.

    Returns (weight (out, in), bias (out,)). Apply as ``x @ w.T + b``.
    """
    k_w, k_b = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(k_w, (out_features, in_features), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (out_features,), dtype, -bound, bound)
    return w, b


def uniform01_init(rng: jax.Array, shape: Tuple[int, ...],
                   dtype=jnp.float32) -> jnp.ndarray:
    """torch ``nn.init.uniform_`` default U[0, 1) (MultVAE layers,
    Model/MultVAE.py:52-69)."""
    return jax.random.uniform(rng, shape, dtype)
