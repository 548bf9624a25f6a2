"""Shared loss primitives with reference-parity numerics.

Numeric parity traps carried over deliberately (SURVEY.md §7):
- BPR adds ``1e-5`` *inside* the log of the sigmoid difference
  (Model/LightGCN.py:108); the plain variant without the epsilon
  (Model/BPR.py:58) is available via ``eps=0``.
- Regularization is a *mean* (not sum) of squared embeddings times
  ``reg_weight`` (Model/LightGCN.py:112-121).
- All reductions are masked means so padded batch tails (fixed-shape
  batching) reproduce the reference's per-batch means exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row L2-normalize, differentiable at zero rows.

    ``x / (norm(x) + eps)`` has an inf gradient at exactly-zero rows
    (sqrt'(0)); zero rows are routine here (items absent from the train
    split have zero propagated embeddings), so use rsqrt(sum^2 + eps).
    """
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def safe_norm(x: jnp.ndarray, axis=-1, eps: float = 1e-12) -> jnp.ndarray:
    """Row norms with a finite gradient at zero rows (sqrt(sum^2 + eps))."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def cosine_rows(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Row-wise cosine similarity, zero-row safe (reference uses
    F.cosine_similarity whose eps clamps denominators)."""
    return jnp.sum(a * b, axis=-1) / (safe_norm(a) * safe_norm(b) + eps)


def masked_mean(x: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over valid entries; ``weights`` in {0,1}, None = all valid."""
    if weights is None:
        return jnp.mean(x)
    return jnp.sum(x * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def bpr_loss(
    pos_scores: jnp.ndarray,
    neg_scores: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """-mean(log(sigmoid(pos - neg) + eps)) (Model/LightGCN.py:97-110)."""
    return -masked_mean(jnp.log(jax.nn.sigmoid(pos_scores - neg_scores) + eps), weights)


def emb_l2_reg(
    reg_weight: float,
    embeddings: Sequence[jnp.ndarray],
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """reg_weight * sum_e mean(e**2) (Model/LightGCN.py:112-121).

    With batch-tail masking the mean runs over valid rows only.
    """
    total = 0.0
    for e in embeddings:
        sq = jnp.mean(e ** 2, axis=-1) if e.ndim > 1 else e ** 2
        total = total + masked_mean(sq, weights)
    return reg_weight * total


def info_nce(
    view1: jnp.ndarray,
    view2: jnp.ndarray,
    temperature: float,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """InfoNCE with in-batch negatives over L2-normalized views.

    Matches the contrastive losses of the SSL family (Model/SimGCL.py:16-31,
    Model/DiffMM.py:338-349): positive = same row across views, negatives =
    all other rows of view2.
    """
    v1 = l2norm(view1)
    v2 = l2norm(view2)
    pos = jnp.sum(v1 * v2, axis=1) / temperature
    logits = jnp.dot(v1, v2.T, preferred_element_type=jnp.float32) / temperature
    log_denom = jax.nn.logsumexp(logits, axis=1)
    return -masked_mean(pos - log_denom, weights)


def catalog_logsumexp(q: jnp.ndarray, k: jnp.ndarray,
                      temperature: float = 1.0) -> jnp.ndarray:
    """logsumexp(q @ k.T / temperature, axis=-1) for full-catalog
    contrastive denominators.

    On TPU with catalog-sized ``k`` this streams through the Pallas
    flash-style kernel (ops/pallas_lse.py) so the (B, N) logit matrix
    never reaches HBM; elsewhere it falls back to the XLA formulation.
    """
    from chaorec_tpu.ops.pallas_lse import (streaming_logsumexp,
                                            use_pallas_lse)

    # always divide: temperature may be a traced scalar (grid-stable
    # compiles); XLA folds the /1.0 case when it is a constant
    qs = q / temperature
    if use_pallas_lse(q.shape[0], k.shape[0]):
        return streaming_logsumexp(qs, k)
    return jax.nn.logsumexp(
        jnp.dot(qs, k.T, preferred_element_type=jnp.float32), axis=-1)
