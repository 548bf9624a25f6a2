"""MXU matmul helpers: bf16-input, fp32-accumulation numerics.

The framework's standard training numerics for graph propagation
(graphs/norm_adj.py compute_dtype="bfloat16", README "MXU-shaped graph
propagation"): inputs cast to bf16, accumulation in fp32 via
``preferred_element_type``. ~6x MXU throughput and half the HBM traffic
of fp32 matmuls; quality parity for the propagation-style workloads is
validated by the full-run comparisons in PARITY.md.
"""

from __future__ import annotations

import jax.numpy as jnp


def bdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """bf16 x bf16 -> fp32 MXU matmul (casts are no-ops for bf16 inputs)."""
    return jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
