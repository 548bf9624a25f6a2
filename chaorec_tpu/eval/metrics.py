"""Top-K quality metrics, vectorized on device with reference-parity numerics.

Replaces the pure-Python per-user set arithmetic of ``metrics.py:13-57`` and
the per-user aggregation loop of ``utils.gene_metrics`` (utils.py:112-139)
with one jitted computation over padded ground-truth arrays.

Parity traps preserved deliberately:
- NDCG uses the **natural log** discount (``np.log``, not log2) exactly as
  ``metrics.py:31``; IDCG truncates at ``min(len(test_list), k)``.
- recall/ndcg/map return 0 for users with an empty ground-truth list
  (``metrics.py:20-22,28-29,49-50``).
- MAP divides by ``len(test_list)`` (not ``min(k, len)``), ``metrics.py:57``.
- The average runs over **all rows of the eval split** (``utils.py:129-137``
  divides by ``len(val_data)``), including empty-truth rows.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

METRIC_NAMES = ("precision", "recall", "ndcg", "hit_rate", "map")


@partial(jax.jit, static_argnames=("k_list",))
def _metrics_kernel(
    ranked: jnp.ndarray,  # (N, K) global item ids for the split's users
    pos: jnp.ndarray,  # (N, P) global item ids, padded with < 0
    pos_len: jnp.ndarray,  # (N,)
    k_list: Tuple[int, ...],
) -> jnp.ndarray:
    """Returns (len(k_list), 5) summed (not yet averaged) metric values."""
    n, kmax = ranked.shape
    # hits[n, j] = ranked[n, j] in pos[n]; padding (-1) never matches ids.
    hits = jnp.any(ranked[:, :, None] == pos[:, None, :], axis=2)  # (N, K)
    hits_f = hits.astype(jnp.float32)
    positions = jnp.arange(kmax, dtype=jnp.float32)
    inv_log = 1.0 / jnp.log(positions + 2.0)  # natural log, metrics.py:31
    cum_inv_log = jnp.cumsum(inv_log)  # cum_inv_log[m-1] = IDCG for m truths
    cum_hits = jnp.cumsum(hits_f, axis=1)  # num_hits within top-(j+1)
    nonempty = (pos_len > 0).astype(jnp.float32)
    len_f = jnp.maximum(pos_len.astype(jnp.float32), 1.0)

    rows = []
    for k in k_list:
        hk = hits_f[:, :k]
        n_hits = jnp.sum(hk, axis=1)
        precision = n_hits / k
        recall = nonempty * n_hits / len_f
        dcg = jnp.sum(hk * inv_log[:k], axis=1)
        idcg_idx = jnp.clip(jnp.minimum(pos_len, k) - 1, 0, kmax - 1)
        idcg = cum_inv_log[idcg_idx]
        ndcg = nonempty * dcg / jnp.maximum(idcg, 1e-12)
        hit = jnp.any(hits[:, :k], axis=1).astype(jnp.float32)
        ap = jnp.sum(hk * cum_hits[:, :k] / (positions[:k] + 1.0), axis=1)
        map_k = nonempty * ap / len_f
        rows.append(jnp.stack([
            jnp.sum(precision), jnp.sum(recall), jnp.sum(ndcg),
            jnp.sum(hit), jnp.sum(map_k),
        ]))
    return jnp.stack(rows)  # (len(k_list), 5)


def compute_metrics(
    rank_list: jnp.ndarray,  # (num_user, K) global item ids
    split_users: np.ndarray,  # (N,) user ids of the eval split rows
    split_pos: jnp.ndarray,  # (N, P) global-or-0based?? -> see gene_metrics
    split_len: jnp.ndarray,
    k_list: Sequence[int],
) -> Dict[int, Dict[str, float]]:
    ranked = rank_list[jnp.asarray(split_users)]
    summed = _metrics_kernel(ranked, split_pos, split_len, tuple(int(k) for k in k_list))
    summed = np.asarray(summed, dtype=np.float64)
    n = float(len(split_users))
    return {
        int(k): {name: float(summed[i, j] / n) for j, name in enumerate(METRIC_NAMES)}
        for i, k in enumerate(k_list)
    }


def _split_arrays(dataset, split: str):
    """Device-resident ground truth per split, uploaded once per dataset.

    The cache lives ON the dataset object (not in a module dict keyed by
    ``id()``): Python reuses ids after GC, so a process-global id-keyed
    cache could silently alias two datasets in one grid run.
    """
    cache = dataset.__dict__.setdefault("_split_device_cache", {})
    if split not in cache:
        pos = dataset.val_pos if split == "val" else dataset.test_pos
        users = dataset.val_users if split == "val" else dataset.test_users
        pos_global = jnp.asarray(
            np.where(pos.values >= 0, pos.values + dataset.num_user, -1)
        )
        cache[split] = (
            jnp.asarray(users), pos_global, jnp.asarray(pos.lengths)
        )
    return cache[split]


def gene_metrics(dataset, rank_list, k_list, split: str = "val"):
    """Drop-in equivalent of ``utils.gene_metrics(val_data, rank_list, ks)``.

    ``rank_list`` holds global item ids (as the reference's does); the
    dataset's padded positives are 0-based, so offset them once and cache
    the device arrays.
    """
    users, pos_global, lengths = _split_arrays(dataset, split)
    return compute_metrics(rank_list, users, pos_global, lengths, k_list)


def gene_metrics_pair_async(dataset, rank_list, k_list, extra_scalar=None):
    """Dispatch val+test metric computation; defer the device->host fetch.

    Returns ``(device_flat, resolve)``: ``device_flat`` is the in-flight
    concatenated result; calling ``resolve()`` blocks on the single
    transfer and returns ``(val, test[, extra_scalar_float])``. Deferring
    the resolve lets the trainer overlap the fetch round trip with the
    NEXT epoch's device work (a one-epoch-deep pipeline)."""
    vu, vp, vl = _split_arrays(dataset, "val")
    tu, tp, tl = _split_arrays(dataset, "test")
    ks = tuple(int(k) for k in k_list)
    has_scalar = extra_scalar is not None
    v_sum = _metrics_kernel(rank_list[vu], vp, vl, ks)
    t_sum = _metrics_kernel(rank_list[tu], tp, tl, ks)
    stacked = [v_sum.reshape(-1), t_sum.reshape(-1)]
    if has_scalar:
        stacked.append(jnp.reshape(extra_scalar, (1,)).astype(jnp.float32))
    device_flat = jnp.concatenate(stacked)
    n_val, n_test = float(len(vu)), float(len(tu))

    def resolve():
        flat = np.asarray(device_flat, dtype=np.float64)
        size = len(ks) * len(METRIC_NAMES)
        both = [flat[:size].reshape(len(ks), -1),
                flat[size:2 * size].reshape(len(ks), -1)]

        def unpack(summed, n):
            return {
                int(k): {name: float(summed[i, j] / n)
                         for j, name in enumerate(METRIC_NAMES)}
                for i, k in enumerate(k_list)
            }

        val = unpack(both[0], n_val)
        test = unpack(both[1], n_test)
        if has_scalar:
            return val, test, float(flat[-1])
        return val, test

    return device_flat, resolve


def gene_metrics_pair(dataset, rank_list, k_list, extra_scalar=None):
    """val + test metrics with a SINGLE device->host fetch.

    Over a remote TPU link each blocking transfer costs a round trip; the
    per-epoch eval makes two metric fetches (val, test) that together
    dominate its latency. Stack both splits' summed metrics on device and
    fetch once. ``extra_scalar`` (e.g. the epoch loss) rides along in the
    same transfer and is returned as a float, so a full epoch pays exactly
    one round trip.
    """
    _, resolve = gene_metrics_pair_async(dataset, rank_list, k_list,
                                         extra_scalar)
    return resolve()
