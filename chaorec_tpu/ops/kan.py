"""Kolmogorov-Arnold layers (Fourier and Chebyshev bases).

Replaces the reference's ``kanlayer.py`` (NaiveFourierKANLayer :14-46,
ChebyKANLayer :49-84) used by FKAN_GCF. Pure einsum formulations that XLA
fuses into MXU contractions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fourier_kan_init(rng: jax.Array, in_dim: int, out_dim: int,
                     grid_size: int) -> jnp.ndarray:
    """coeffs (2, out, in, grid): randn / (sqrt(in) * sqrt(grid))
    (kanlayer.py:28-29)."""
    scale = 1.0 / (math.sqrt(in_dim) * math.sqrt(grid_size))
    return scale * jax.random.normal(rng, (2, out_dim, in_dim, grid_size))


def fourier_kan(x: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """y[b, j] = sum_{i,k} cos((k+1) x[b,i]) C[0,j,i,k] + sin(..) C[1,j,i,k]."""
    grid = coeffs.shape[-1]
    k = jnp.arange(1, grid + 1, dtype=x.dtype)
    ang = x[:, :, None] * k[None, None, :]  # (B, in, grid)
    y = jnp.einsum("big,jig->bj", jnp.cos(ang), coeffs[0])
    y = y + jnp.einsum("big,jig->bj", jnp.sin(ang), coeffs[1])
    return y


def cheby_kan(x: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Chebyshev KAN: coeffs (in, out, degree+1) (kanlayer.py:49-84)."""
    degree = coeffs.shape[-1] - 1
    x = jnp.tanh(x)
    n = jnp.arange(0, degree + 1, dtype=x.dtype)
    t = jnp.cos(jnp.arccos(jnp.clip(x, -1.0, 1.0))[:, :, None] * n)
    return jnp.einsum("bid,iod->bo", t, coeffs)
