"""Homograph (U-U / I-I one-hot neighbourhood) row serving.

Reference: ``dataload.py:267-344`` (``UserHomographData`` /
``ItemHomographData``). The reference materialises a **dense
``[N, N]`` float32 matrix on the host** (``sp.coo_matrix(...).toarray()``
— ~8.6 GB for netfilx users) and serves one row per ``__getitem__``
through a ``DataLoader``. Its only consumer is the commented-out MHRec
dispatch at ``main.py:421-424``; the shipped MHRec path uses the
hyperedge loaders instead.

TPU-first design: never build the N×N matrix. Keep the ``(N, k)``
int32 kNN neighbour table (the same artifact
``chaorec_tpu.graphs.user_graph.topk_sample`` produces) resident on
device and materialise only the requested batch of rows with a fused
scatter-add — ``O(B·N)`` HBM for the batch instead of ``O(N²)`` host
RAM for the table. Duplicate neighbours sum (replacement-padded
sampling, ``utils.py:154-178``), exactly like duplicate COO entries in
the reference's ``toarray()``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["homograph_rows", "homograph_batches"]


@functools.partial(jax.jit, static_argnames=("num_nodes", "dtype"))
def homograph_rows(neighbors: jnp.ndarray, index: jnp.ndarray,
                   num_nodes: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dense one-hot neighbourhood rows for a batch of node ids.

    ``neighbors``: ``(N, k)`` int32 neighbour ids (kNN table).
    ``index``: ``(B,)`` int32 node ids whose rows to build.
    Returns ``(B, num_nodes)`` with ``row[b, j] = #{neighbors[index[b]] == j}``
    — the reference's ``self.data[index]`` row (dataload.py:300-304,
    duplicate COO entries summed by ``toarray``).
    """
    nbr = neighbors[index]  # (B, k)
    rows = jnp.zeros((index.shape[0], num_nodes), dtype)
    b = jnp.arange(index.shape[0], dtype=jnp.int32)[:, None]
    return rows.at[b, nbr].add(jnp.asarray(1, dtype))


def homograph_batches(neighbors, batch_size: int, *, dtype=jnp.float32):
    """Yield ``(rows, index)`` batches over all ``N`` nodes — the
    reference's ``DataLoader(HomographData)`` iteration order
    (sequential, final short batch padded by clamping to ``N-1`` with a
    ``valid`` count so downstream fixed-shape scans stay compiled once).

    Yields ``(rows (B, N), index (B,), valid int)``; entries past
    ``valid`` are repeats of the last node and must be masked by the
    consumer.
    """
    neighbors = jnp.asarray(neighbors, jnp.int32)
    n = int(neighbors.shape[0])
    for start in range(0, n, batch_size):
        idx = jnp.minimum(
            jnp.arange(start, start + batch_size, dtype=jnp.int32), n - 1
        )
        yield homograph_rows(neighbors, idx, n, dtype), idx, min(
            batch_size, n - start
        )
