"""Jit-compiled Lloyd k-means (replaces faiss).

The reference calls faiss CPU k-means (k=200, 25 iterations) on the raw
embedding tables **every training batch** for NCL (Model/NCL.py:61-94,
train_and_evaluate.py:107-115) and per-epoch for VGCL. On TPU the
assignment step is one (N, D) @ (D, K) MXU matmul and the update step a
segment-sum, so the whole fit runs inside the jitted training step.

Matches faiss semantics where they matter: L2 distance assignments,
centroid = mean of assigned points (empty clusters keep their previous
centroid), init = random data points.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(rng: jax.Array, x: jnp.ndarray, k: int, iters: int = 15
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids (k, D), assignment (N,) int32)."""
    n = x.shape[0]
    init_idx = jax.random.choice(rng, n, (k,), replace=False)
    centroids = x[init_idx]

    def assign(c):
        # argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c)
        logits = 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32)
        logits = logits - jnp.sum(c ** 2, axis=1)[None, :]
        return jnp.argmax(logits, axis=1).astype(jnp.int32)

    def body(_, c):
        a = assign(c)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), a, num_segments=k)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new_c, c)

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    return centroids, assign(centroids)
