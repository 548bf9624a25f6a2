"""On-device, fixed-shape BPR negative sampling.

Replaces the reference's per-edge Python rejection loop running in
DataLoader worker processes (dataload.py:74-84: ``while True: sample; if
not in user_item_dict: break``). That pattern is data-dependent control
flow — hostile to XLA — and keeps sampling on the host CPU.

TPU-native design: draw ``K`` candidate items uniformly per edge, test
membership against the user's sorted padded history with a vectorized
binary search, and take the first non-interacted candidate. With K=8 and
realistic interaction densities (<1%), the probability that all K
candidates collide is < 1e-16 per edge; if it ever happens we keep the last
candidate. The distribution over accepted negatives is uniform over
non-interacted items, matching the reference's rejection sampler
statistically (documented tolerance: not bitwise).

Everything here is jit-compatible and runs inside the epoch ``lax.scan``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# Above this history width, the O(H) broadcast compare loses to the
# O(log H) binary search. Below it, the compare is pure VPU work with no
# loop-carried dependence and is ~an order of magnitude faster inside the
# epoch scan (measured on beauty, H=389: 75ms -> ~1ms per epoch).
_BCAST_MAX_H = 4096


def _in_sorted(history_rows: jnp.ndarray, candidates: jnp.ndarray) -> jnp.ndarray:
    """Membership of candidates in per-row sorted histories.

    history_rows: (B, H) int32, sorted ascending, padded with a sentinel
        larger than every valid item id.
    candidates: (B, K) int32.
    Returns (B, K) bool: True where candidate appears in its row's history.

    Two equivalent lowerings: a flat (B, K, H) broadcast equality for
    typical history widths (vectorizes perfectly on the VPU; XLA's
    vmapped ``searchsorted`` while-loop serializes badly inside scans),
    and the binary search above ``_BCAST_MAX_H``. Both return identical
    booleans (pinned by tests/test_sampling.py).
    """
    if history_rows.shape[1] <= _BCAST_MAX_H:
        return jnp.any(
            candidates[:, :, None] == history_rows[:, None, :], axis=2
        )
    idx = jax.vmap(jnp.searchsorted)(history_rows, candidates)  # (B, K)
    idx = jnp.minimum(idx, history_rows.shape[1] - 1)
    found = jnp.take_along_axis(history_rows, idx, axis=1) == candidates
    return found


def sample_negatives(
    rng: jax.Array,
    users: jnp.ndarray,
    history_values: jnp.ndarray,
    num_item: int,
    num_candidates: int = 8,
) -> jnp.ndarray:
    """Sample one negative item per (user) row, uniform over non-history items.

    users: (B,) int32 user ids.
    history_values: (U, H) sorted padded history table (fill = num_item).
    Returns (B,) int32 0-based item ids.
    """
    cand = jax.random.randint(
        rng, (users.shape[0], num_candidates), 0, num_item, dtype=jnp.int32
    )
    hist = history_values[users]  # (B, H)
    bad = _in_sorted(hist, cand)  # (B, K)
    # First valid candidate; if none valid, argmax returns 0 on all-False —
    # then fall back to the last candidate (prob ~0 for real data).
    valid = ~bad
    first = jnp.argmax(valid, axis=1)
    any_valid = jnp.any(valid, axis=1)
    pick = jnp.where(any_valid, first, num_candidates - 1)
    return jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]


def make_epoch_batches(
    rng: jax.Array,
    edges: jnp.ndarray,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shuffle train edges and pack into fixed-shape batches with a mask.

    The reference's last partial batch (smaller B) is handled by padding to
    a full batch and masking: every loss in the framework is a *masked*
    mean, which reproduces the reference's per-batch-mean semantics exactly
    while keeping shapes static for XLA.

    Returns (users, pos_items, weights, perm):
      users, pos_items: (n_batches, B) int32
      weights: (n_batches, B) float32 in {0, 1}
    """
    num_edges = edges.shape[0]
    n_batches = -(-num_edges // batch_size)
    padded = n_batches * batch_size
    perm = jax.random.permutation(rng, num_edges)
    # Pad by repeating edge 0; weight 0 makes the repeats inert.
    pad_idx = jnp.concatenate(
        [perm, jnp.zeros((padded - num_edges,), dtype=perm.dtype)]
    )
    shuffled = edges[pad_idx]
    users = shuffled[:, 0].reshape(n_batches, batch_size)
    pos = shuffled[:, 1].reshape(n_batches, batch_size)
    weights = (
        jnp.arange(padded, dtype=jnp.int32) < num_edges
    ).astype(jnp.float32).reshape(n_batches, batch_size)
    return users, pos, weights, perm
