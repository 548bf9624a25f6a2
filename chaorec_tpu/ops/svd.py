"""Randomized truncated SVD on device.

Replaces ``torch.svd_lowrank`` (LightGCL, Model/LightGCL.py:43-49) and
``sparsesvd`` (BSPM's 256-factor ideal low-pass filter, Model/BSPM.py:60).
Standard Halko-Martinsson-Tropp randomized SVD: range-finding by Gaussian
sketch + power iterations (all MXU matmuls + small QR/SVD on the sketch).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def randomized_svd(rng: jax.Array, a: jnp.ndarray, q: int,
                   oversample: int = 10, power_iters: int = 4
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rank-q SVD of a (M, N) dense matrix: returns (U (M,q), s (q,), V (N,q)).

    Deliberately NOT jitted: it runs once at model-build time, and jitting
    the QR/SVD + power-iteration composite stalls the remote-compile path
    of the TPU-tunnel platform; the eager ops dispatch fine (matmuls on
    MXU, small QR/SVD via XLA custom calls)."""
    m, n = a.shape
    l = min(q + oversample, min(m, n))
    a32 = a.astype(jnp.float32)
    g = jax.random.normal(rng, (n, l), jnp.float32)
    y = jnp.dot(a32, g, preferred_element_type=jnp.float32)
    qmat, _ = jnp.linalg.qr(y)
    for _ in range(power_iters):
        z = jnp.dot(a32.T, qmat, preferred_element_type=jnp.float32)
        z, _ = jnp.linalg.qr(z)
        y = jnp.dot(a32, z, preferred_element_type=jnp.float32)
        qmat, _ = jnp.linalg.qr(y)
    b = jnp.dot(qmat.T, a32, preferred_element_type=jnp.float32)  # (l, N)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.dot(qmat, ub, preferred_element_type=jnp.float32)
    return u[:, :q], s[:q], vt[:q].T
