"""Per-destination edge softmax (GAT family).

Replaces torch-geometric's ``softmax(alpha, index)`` CUDA kernel
(Model/GRCN.py GATConv, Model/MGAT.py GraphGAT) with segment reductions:
max-subtract for stability, exp, segment-sum normalize. All static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax(scores: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int,
                    indices_are_sorted: bool = False) -> jnp.ndarray:
    smax = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    e = jnp.exp(scores - smax[segment_ids])
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments,
                                indices_are_sorted=indices_are_sorted)
    return e / jnp.maximum(denom[segment_ids], 1e-16)
