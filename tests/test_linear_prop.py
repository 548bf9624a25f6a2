"""Combined linear operator == layer-stack propagation (exact math)."""

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.graphs.norm_adj import build_norm_adj
from chaorec_tpu.models.base import Batch
from chaorec_tpu.models.lightgcn import LightGCN
from chaorec_tpu.ops.linear_prop import build_combined_op
import pytest

pytestmark = pytest.mark.fast


def _setup(tiny_dataset, n_layers=2):
    ds = tiny_dataset
    g = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item, use_dense=True)
    op = build_combined_op(g.dense_r, n_layers, store_bf16=False)
    return ds, g, op


def test_full_operator_matches_layer_stack(tiny_dataset):
    ds, g, op = _setup(tiny_dataset)
    model = LightGCN(ds.num_user, ds.num_item, g, 16, 1e-3, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    want_u, want_i = model.propagate(params)
    got_u, got_i = op.full(params["user_embedding"], params["item_embedding"])
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-4, atol=1e-5)


def test_row_gather_loss_matches_layer_stack_loss(tiny_dataset):
    ds, g, op = _setup(tiny_dataset)
    stack = LightGCN(ds.num_user, ds.num_item, g, 16, 1e-3, 2)
    fused = LightGCN(ds.num_user, ds.num_item, g, 16, 1e-3, 2, linear_op=op)
    params = stack.init_params(jax.random.PRNGKey(1))
    rs = np.random.default_rng(2)
    batch = Batch(
        users=jnp.asarray(rs.integers(0, ds.num_user, 64), jnp.int32),
        pos_items=jnp.asarray(rs.integers(0, ds.num_item, 64), jnp.int32),
        neg_items=jnp.asarray(rs.integers(0, ds.num_item, 64), jnp.int32),
        weights=jnp.ones((64,), jnp.float32),
    )
    rng = jax.random.PRNGKey(3)
    l_stack = float(stack.loss(params, batch, rng))
    l_fused = float(fused.loss(params, batch, rng))
    assert abs(l_stack - l_fused) < 1e-4, (l_stack, l_fused)

    # Gradients agree too (the training path is the fused one).
    g_stack = jax.grad(stack.loss)(params, batch, rng)
    g_fused = jax.grad(fused.loss)(params, batch, rng)
    for k in g_stack:
        np.testing.assert_allclose(
            np.asarray(g_stack[k]), np.asarray(g_fused[k]), rtol=1e-3, atol=1e-6
        )
