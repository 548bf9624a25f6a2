"""Multi-device parallel path on the virtual 8-device CPU mesh.

The conftest splits the host CPU into 8 XLA devices; these tests pin that
the dp x mp sharded training step and the user-sharded eval produce the
same numbers as the single-device path (the sharded program is the same
math with XLA-inserted collectives, so equality is expected up to fp32
reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.eval.ranking import gene_ranklist
from chaorec_tpu.models import build_model
from chaorec_tpu.models.base import Batch
from chaorec_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    shard_params,
    sharded_rank,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device platform"
)


def test_make_mesh_axes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "mp")
    assert make_mesh(1).devices.shape == (1, 1)


def _bpr_setup(tiny_dataset):
    cfg = Config(Model="BPR", batch_size=64, dim_E=16, learning_rate=0.05,
                 reg_weight=1e-4)
    model = build_model(cfg, tiny_dataset)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.default_rng(1)
    b = 64
    users = rs.integers(0, tiny_dataset.num_user, b).astype(np.int32)
    pos = rs.integers(0, tiny_dataset.num_item, b).astype(np.int32)
    neg = rs.integers(0, tiny_dataset.num_item, b).astype(np.int32)
    batch = Batch(jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg),
                  jnp.ones((b,), jnp.float32), jnp.int32(0), None)
    return model, params, batch


def test_sharded_step_matches_single_device(tiny_dataset):
    model, params, batch = _bpr_setup(tiny_dataset)
    opt = optax.adam(1e-2)
    rng = jax.random.PRNGKey(7)

    # single-device reference
    def step(model, params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(model.loss)(params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p_ref, _, loss_ref = jax.jit(step)(model, params, opt.init(params),
                                       batch, rng)

    mesh = make_mesh(8)
    p_sh = shard_params(params, mesh)
    b_sh = shard_batch(batch, mesh)
    sharded = make_sharded_train_step(model, opt, mesh)
    p_out, _, loss_sh = sharded(p_sh, opt.init(p_sh), b_sh, rng)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_out[k]), np.asarray(p_ref[k]),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_rank_matches_gene_ranklist(tiny_dataset):
    ds = tiny_dataset
    rs = np.random.default_rng(2)
    ue = jnp.asarray(rs.standard_normal((ds.num_user, 16)).astype(np.float32))
    ie = jnp.asarray(rs.standard_normal((ds.num_item, 16)).astype(np.float32))
    hist = jnp.asarray(ds.history.values)

    ref = np.asarray(gene_ranklist(ue, ie, hist, ds.num_user, topk=10))
    mesh = make_mesh(8)
    got = np.asarray(sharded_rank(ue, ie, hist, ds.num_user, 10, mesh))
    np.testing.assert_array_equal(got, ref)


def test_sharded_training_learns(tiny_dataset):
    """A short sharded training run on the planted-block dataset learns
    (end-to-end: sharded steps + sharded eval + metrics)."""
    from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
    from chaorec_tpu.eval.metrics import gene_metrics

    ds = tiny_dataset
    cfg = Config(Model="BPR", batch_size=64, dim_E=16, learning_rate=0.05,
                 reg_weight=1e-4)
    model = build_model(cfg, ds)
    mesh = make_mesh(8)
    opt = optax.adam(cfg.learning_rate)
    params = shard_params(model.init_params(jax.random.PRNGKey(0)), mesh)
    opt_state = opt.init(params)
    step = make_sharded_train_step(model, opt, mesh)
    edges = jnp.asarray(ds.train_edges)
    history = jnp.asarray(ds.history.values)
    rng = jax.random.PRNGKey(3)
    for epoch in range(30):
        rng, srng = jax.random.split(rng)
        users, pos, w, _ = make_epoch_batches(srng, edges, cfg.batch_size)
        for i in range(users.shape[0]):
            rng, nrng, lrng = jax.random.split(rng, 3)
            neg = sample_negatives(nrng, users[i], history, ds.num_item)
            batch = shard_batch(
                Batch(users[i], pos[i], neg, w[i], jnp.int32(i), None), mesh
            )
            params, opt_state, _ = step(params, opt_state, batch, lrng)
    ue, ie = model.embeddings(params)
    rank = sharded_rank(ue, ie, history, ds.num_user, 20, mesh)
    m = gene_metrics(ds, rank, [20], split="test")
    assert m[20]["recall"] > 0.6, m


def test_cli_mesh_shape_flag(tiny_dataset):
    """--mesh_shape drives the standard Trainer over a mesh end-to-end:
    same run loop, sharded parameter tables, metrics computed normally."""
    from chaorec_tpu.train.loop import Trainer

    cfg = Config(Model="LightGCN", batch_size=64, num_epoch=12, dim_E=16,
                 learning_rate=0.05, reg_weight=1e-4, n_layers=2,
                 patience=12, mesh_shape="dp=4,mp=2")
    model = build_model(cfg, tiny_dataset)
    best = Trainer(model, tiny_dataset, cfg).run()
    assert best[20]["recall"] > 0.55, best


def test_sharded_mmssl_step_matches_single_device(tiny_dataset):
    """The stateful adversarial family (MMSSL): one sharded D+G step ==
    the single-device step (VERDICT r1 item 3)."""
    from chaorec_tpu.parallel.mesh import (
        make_sharded_mmssl_step,
        shard_state,
    )

    ds = tiny_dataset
    cfg = Config(Model="MMSSL", batch_size=64, dim_E=16, learning_rate=1e-3)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    mstate = model.init_state(jax.random.PRNGKey(1))
    rs = np.random.default_rng(1)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(9)

    mesh1 = make_mesh(1)
    step1, opt_d, opt_main = make_sharded_mmssl_step(model, mesh1, 1e-3)
    p1, _, _, s1, loss1 = step1(
        params, opt_d.init(params), opt_main.init(params), mstate, batch, rng
    )

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))  # fresh (donated above)
    mstate = model.init_state(jax.random.PRNGKey(1))
    p_sh = shard_params(params, mesh)
    s_sh = shard_state(mstate, mesh)
    b_sh = shard_batch(batch, mesh)
    step8, opt_d8, opt_main8 = make_sharded_mmssl_step(model, mesh, 1e-3)
    p8, _, _, s8, loss8 = step8(
        p_sh, opt_d8.init(p_sh), opt_main8.init(p_sh), s_sh, b_sh, rng
    )

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_diffmm_steps_match_single_device(tiny_dataset):
    """The diffusion-rebuild family (DiffMM): sharded denoiser step and
    BPR step == single-device (VERDICT r1 item 3)."""
    from chaorec_tpu.parallel.mesh import (
        make_sharded_diffmm_steps,
        shard_state,
    )

    ds = tiny_dataset
    cfg = Config(Model="DiffMM", batch_size=64, dim_E=16, learning_rate=1e-3)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    state = model.rebuild_graphs(params, jax.random.PRNGKey(2))
    rs = np.random.default_rng(1)
    b = 64
    users = jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32))
    weights = jnp.ones((b,), jnp.float32)
    batch = Batch(
        users,
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        weights, jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(5)

    mesh1 = make_mesh(1)
    dn1, opt_dn, bpr1, opt_m = make_sharded_diffmm_steps(model, mesh1, 1e-3)
    p1, _, dl1 = dn1(params, opt_dn.init(params), users, weights, rng)
    pb1, _, bl1 = bpr1(p1, opt_m.init(p1), state, batch)

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))  # fresh (donated above)
    state = model.rebuild_graphs(params, jax.random.PRNGKey(2))
    p_sh = shard_params(params, mesh)
    s_sh = shard_state(state, mesh)
    from chaorec_tpu.parallel.mesh import shard_batch as _sb
    dn8, opt_dn8, bpr8, opt_m8 = make_sharded_diffmm_steps(model, mesh, 1e-3)
    u_sh = _sb(Batch(users, users, users, weights, None, None), mesh).users
    w_sh = _sb(Batch(users, users, users, weights, None, None), mesh).weights
    p8, _, dl8 = dn8(p_sh, opt_dn8.init(p_sh), u_sh, w_sh, rng)
    pb8, _, bl8 = bpr8(p8, opt_m8.init(p8), s_sh, _sb(batch, mesh))

    np.testing.assert_allclose(float(dl8), float(dl1), rtol=1e-4)
    np.testing.assert_allclose(float(bl8), float(bl1), rtol=1e-4)
    for (k1, l1), (k8, l8) in zip(
        jax.tree_util.tree_leaves_with_path(pb1),
        jax.tree_util.tree_leaves_with_path(pb8),
    ):
        assert k1 == k8
        np.testing.assert_allclose(np.asarray(l8), np.asarray(l1),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_multvae_step_matches_single_device(tiny_dataset):
    """The dense user-row family (MultVAE): sharded stateful step ==
    single-device (VERDICT r1 item 3). Users shard over the mesh; the
    dense (U, I) interaction buffer row-shards with them."""
    from chaorec_tpu.parallel.mesh import (
        make_sharded_stateful_step,
        shard_state,
    )

    ds = tiny_dataset
    cfg = Config(Model="MultVAE", batch_size=64, dim_E=16,
                 learning_rate=1e-3)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    mstate = model.init_state(jax.random.PRNGKey(1))
    rs = np.random.default_rng(1)
    b = 64
    users = jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32))
    batch = Batch(users, users * 0, users * 0,
                  jnp.ones((b,), jnp.float32), jnp.int32(0), None)
    rng = jax.random.PRNGKey(5)
    opt = optax.adam(1e-3)

    mesh1 = make_mesh(1)
    step1 = make_sharded_stateful_step(model, opt, mesh1)
    p1, _, s1, loss1 = step1(params, opt.init(params), mstate, batch, rng)

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))  # fresh (donated above)
    mstate = model.init_state(jax.random.PRNGKey(1))
    p_sh = shard_params(params, mesh)
    step8 = make_sharded_stateful_step(model, opt, mesh)
    p8, _, s8, loss8 = step8(p_sh, opt.init(p_sh),
                             shard_state(mstate, mesh),
                             shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_freedom_step_matches_single_device(tiny_dataset):
    """FREEDOM (the second BASELINE.json north-star model): sharded step
    with the trainable modality tables row-sharded over mp == the
    single-device step. The 62M-param sports feature table is exactly
    what mp-sharding buys headroom for (VERDICT r1 item 4)."""
    ds = tiny_dataset
    cfg = Config(Model="FREEDOM", batch_size=64, dim_E=16, feature_embed=16,
                 ii_topk=5, n_layers=1, mm_layers=1, dropout=0.1,
                 lambda_coeff=0.8, learning_rate=1e-3, reg_weight=1e-3)
    model = build_model(cfg, ds)
    rs = np.random.default_rng(1)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(3)
    opt = optax.adam(1e-3)

    params = model.init_params(jax.random.PRNGKey(0))
    mesh1 = make_mesh(1)
    step1 = make_sharded_train_step(model, opt, mesh1)
    p1, _, loss1 = step1(params, opt.init(params), batch, rng)

    # fresh model+params: the donating step above consumed the aliased
    # feature-table buffers shared between model and params
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    p_sh = shard_params(params, mesh)
    # the trainable feature tables really are distributed:
    v_sharding = p_sh["v_feat"].sharding
    assert "mp" in str(v_sharding.spec) or not v_sharding.is_fully_replicated
    step8 = make_sharded_train_step(model, opt, mesh)
    p8, _, loss8 = step8(p_sh, opt.init(p_sh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)
