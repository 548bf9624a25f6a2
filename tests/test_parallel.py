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
        a, b = np.asarray(p8[k]), np.asarray(p1[k])
        if k.startswith("D_"):
            # Adam's first step is +-lr for every element regardless of
            # gradient magnitude (m_hat/sqrt(v_hat) = sign(g) at t=1),
            # so D elements whose WGAN real/fake contributions nearly
            # cancel (|g| ~ float noise, e.g. the BN biases under the
            # identity-activation D) legitimately sign-flip between
            # reduction orders. Allow one first-step quantum on those.
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=2.1 * 3e-4)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


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


def test_sharded_adagcl_step_matches_single_device(tiny_dataset):
    """The adaptive-augmentation 3-optimizer family (AdaGCL, reference
    train_and_evaluate.py:72-97): one sharded alternating step ==
    single-device (VERDICT r2 item 6)."""
    from chaorec_tpu.parallel.mesh import make_sharded_adagcl_step

    ds = tiny_dataset
    cfg = Config(Model="AdaGCL", batch_size=64, dim_E=16, learning_rate=1e-3,
                 reg_weight=1e-3, ssl_alpha=0.01, ssl_temp=0.5, n_layers=2)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.default_rng(1)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(11)

    mesh1 = make_mesh(1)
    step1, opt, og1, og2 = make_sharded_adagcl_step(model, mesh1, 1e-3)
    p1, _, _, _, loss1 = step1(params, opt.init(params), og1.init(params),
                               og2.init(params), batch, rng)

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))
    p_sh = shard_params(params, mesh)
    step8, opt8, og18, og28 = make_sharded_adagcl_step(model, mesh, 1e-3)
    p8, _, _, _, loss8 = step8(p_sh, opt8.init(p_sh), og18.init(p_sh),
                               og28.init(p_sh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_grade_step_matches_single_device(tiny_dataset):
    """The GRADE 4-optimizer family (reference
    train_and_evaluate.py:259-284): one sharded 3-loss step ==
    single-device (VERDICT r2 item 6)."""
    from chaorec_tpu.parallel.mesh import make_sharded_grade_step

    ds = tiny_dataset
    cfg = Config(Model="Grade", batch_size=64, dim_E=16, learning_rate=1e-3,
                 reg_weight=0.01, ssl_alpha=0.02, ssl_temp=0.3,
                 ssl_temp2=0.3, noise_alpha=0.02, n_layers=2)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.default_rng(1)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(13)

    mesh1 = make_mesh(1)
    step1, opt, gens = make_sharded_grade_step(model, mesh1, 1e-3)
    p1, _, _, loss1 = step1(params, opt.init(params),
                            tuple(g.init(params) for g in gens), batch, rng)

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))
    p_sh = shard_params(params, mesh)
    step8, opt8, gens8 = make_sharded_grade_step(model, mesh, 1e-3)
    p8, _, _, loss8 = step8(p_sh, opt8.init(p_sh),
                            tuple(g.init(p_sh) for g in gens8),
                            shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_mhrec_steps_match_single_device(tiny_dataset):
    """MHRec's three-phase hyperedge-rebuild state machine (reference
    train_and_evaluate.py:331-512): sharded denoise step, incidence
    rebuild, and hyper-BPR step each == single-device (VERDICT r2
    item 6)."""
    from chaorec_tpu.parallel.mesh import make_sharded_mhrec_steps

    ds = tiny_dataset
    # fp32 phase-B sampling: the parity pin is about sharded structure;
    # bf16's last-ulp ties can legitimately flip top-k node picks between
    # shard layouts (precision policy is tested in test_models_e2e)
    cfg = Config(Model="MHRec", batch_size=64, dim_E=16, learning_rate=1e-3,
                 reg_weight=1e-4, n_layers=2, h_layers=1, uu_topk=3,
                 ii_topk=3, num_hypernodes=2, ssl_alpha=1e-3, ssl_temp=0.1,
                 beta1=0.5, beta2=0.5, noise_scale=0.001,
                 graph_compute_dtype="float32")
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.default_rng(1)
    b = 32
    rows = model.hyper_nodes_v[
        jnp.asarray(rs.integers(0, model.hyper_nodes_v.shape[0], b))]
    weights = jnp.ones((b,), jnp.float32)
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        weights, jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(17)

    mesh1 = make_mesh(1)
    dn1, opt_dn, rb1, hy1, opt_c = make_sharded_mhrec_steps(model, mesh1,
                                                            1e-3)
    pa1, _, dl1 = dn1(params, opt_dn.init(params), rows, weights, rng,
                      "img_dn")
    hv1 = rb1(pa1, model.hyper_nodes_v, jax.random.PRNGKey(21), "img_dn")
    ht1 = rb1(pa1, model.hyper_nodes_t, jax.random.PRNGKey(22), "txt_dn")
    pc1, _, _, hl1 = hy1(pa1, opt_c.init(pa1), hv1, ht1, batch, rng)

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))
    p_sh = shard_params(params, mesh)
    dn8, opt_dn8, rb8, hy8, opt_c8 = make_sharded_mhrec_steps(model, mesh,
                                                              1e-3)
    b_sh = shard_batch(batch, mesh)
    r_sh = shard_batch(Batch(rows, rows, rows, weights, None, None), mesh)
    pa8, _, dl8 = dn8(p_sh, opt_dn8.init(p_sh), r_sh.users, r_sh.weights,
                      rng, "img_dn")
    hv8 = rb8(pa8, model.hyper_nodes_v, jax.random.PRNGKey(21), "img_dn")
    ht8 = rb8(pa8, model.hyper_nodes_t, jax.random.PRNGKey(22), "txt_dn")
    pc8, _, _, hl8 = hy8(pa8, opt_c8.init(pa8), hv8, ht8, b_sh, rng)

    np.testing.assert_allclose(float(dl8), float(dl1), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(hv8), np.asarray(hv1))
    np.testing.assert_allclose(float(hl8), float(hl1), rtol=1e-4)
    for (k1, l1), (k8, l8) in zip(
        jax.tree_util.tree_leaves_with_path(pc1),
        jax.tree_util.tree_leaves_with_path(pc8),
    ):
        assert k1 == k8
        # atol 3e-5: the hyper-attention softmax denominators reduce in a
        # different order across shards and Adam's rsqrt amplifies the
        # last-ulp differences on near-zero second moments
        np.testing.assert_allclose(np.asarray(l8), np.asarray(l1),
                                   rtol=1e-4, atol=3e-5)


def test_sharded_gformer_step_matches_single_device(tiny_dataset):
    """GFormer's host-resampled padded-graph family (reference
    train_and_evaluate.py:245-258): one sharded grad-clipped step against
    a fixed GFGraphs pytree == single-device (VERDICT r2 item 6)."""
    from chaorec_tpu.models.gformer import GFormerTrainer
    from chaorec_tpu.parallel.mesh import make_sharded_gformer_step

    ds = tiny_dataset
    cfg = Config(Model="GFormer", batch_size=64, dim_E=16,
                 learning_rate=1e-3, reg_weight=1e-4, n_layers=2,
                 pnn_layer=1, ssl_alpha=1e-4, b2=0.01, ctra=1e-4)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer = GFormerTrainer(model, ds, cfg)
    graphs = trainer._host_sample(params)  # one fixed resample for both

    rs = np.random.default_rng(1)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )

    mesh1 = make_mesh(1)
    step1, opt = make_sharded_gformer_step(model, mesh1, 1e-3)
    p1, _, loss1 = step1(params, opt.init(params), batch, graphs)

    mesh = make_mesh(8)
    params = model.init_params(jax.random.PRNGKey(0))
    p_sh = shard_params(params, mesh)
    step8, opt8 = make_sharded_gformer_step(model, mesh, 1e-3)
    p8, _, loss8 = step8(p_sh, opt8.init(p_sh), shard_batch(batch, mesh),
                         graphs)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_rank_scores_matches_mask_and_topk(tiny_dataset):
    """Score-ranking eval sharded over users (MultVAE/BSPM/DiffRec
    families): identical ranklists to the single-device
    eval/ranking.mask_and_topk path (VERDICT r2 item 6)."""
    from chaorec_tpu.eval.ranking import mask_and_topk
    from chaorec_tpu.parallel.mesh import sharded_rank_scores

    ds = tiny_dataset
    cfg = Config(Model="MultVAE", batch_size=64, dim_E=16,
                 learning_rate=1e-3)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    hist = jnp.asarray(ds.history.values)

    uids = jnp.arange(ds.num_user, dtype=jnp.int32)
    scores = model.score_users(params, uids)
    ref = np.asarray(mask_and_topk(scores, hist, topk=10,
                                   num_user=ds.num_user))

    mesh = make_mesh(8)
    got = np.asarray(sharded_rank_scores(model, params, hist, ds.num_user,
                                         10, mesh))
    np.testing.assert_array_equal(got, ref)


def test_cli_mesh_shape_family_trainers(tiny_dataset):
    """--mesh_shape drives the FAMILY trainers end-to-end too: the
    sharded parameter tables flow through their jitted whole-epoch scans
    (adversarial MMSSL, 3-optimizer AdaGCL) with XLA propagating the
    shardings — no family-specific CLI plumbing needed."""
    from chaorec_tpu.train.loop import Trainer

    for name, extra in [
        ("MMSSL", dict(ssl_alpha=0.1, ssl_temp=0.5, G_rate=1e-4,
                       mm_layers=1, learning_rate=0.005, reg_weight=1e-5)),
        ("AdaGCL", dict(ssl_alpha=0.01, ssl_temp=0.5, reg_weight=1e-3,
                        learning_rate=0.05)),
    ]:
        cfg = Config(Model=name, batch_size=64, num_epoch=2, dim_E=8,
                     n_layers=1, patience=2, mesh_shape="dp=4,mp=2",
                     **extra)
        model = build_model(cfg, tiny_dataset)
        trainer = getattr(model, "trainer_cls", Trainer)(
            model, tiny_dataset, cfg)
        best = trainer.run()
        assert 20 in best and best[20]["recall"] >= 0.0, (name, best)


def test_sharded_ncl_step_matches_single_device(tiny_dataset):
    """The e-step family (NCL/VGCL, reference train_and_evaluate.py:
    107-125): the per-step k-means prototype recompute runs INSIDE the
    sharded jit over the row-sharded embedding tables (XLA inserts the
    all-gathers faiss never could), and the step matches single-device."""
    ds = tiny_dataset
    cfg = Config(Model="NCL", batch_size=64, dim_E=16, learning_rate=1e-3,
                 reg_weight=1e-4, n_layers=2, ssl_temp=0.5, ssl_alpha=1e-6)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.default_rng(2)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(7)
    opt = optax.adam(1e-3)

    mesh1 = make_mesh(1)
    step1 = make_sharded_train_step(model, opt, mesh1)
    p1, _, loss1 = step1(params, opt.init(params), batch, rng)

    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    p_sh = shard_params(params, mesh)
    step8 = make_sharded_train_step(model, opt, mesh)
    p8, _, loss8 = step8(p_sh, opt.init(p_sh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_lattice_step_matches_single_device(tiny_dataset):
    """The build-item-graph family (LATTICE/MICRO, reference
    train_and_evaluate.py:98-106): the stateful sharded step carries the
    learned dense (I, I) item adjacency across the mesh and rebuilds it
    on batch.index == 0 inside the jit; step == single-device."""
    from chaorec_tpu.parallel.mesh import (
        init_stateful_opt_state,
        make_sharded_stateful_step,
        shard_state,
    )

    ds = tiny_dataset
    cfg = Config(Model="LATTICE", batch_size=64, dim_E=16, feature_embed=16,
                 learning_rate=1e-3, reg_weight=1e-4, n_layers=1,
                 mm_layers=1, ii_topk=5, lambda_coeff=0.8)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    mstate = model.init_state(jax.random.PRNGKey(1))
    rs = np.random.default_rng(3)
    b = 64
    batch = Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )
    rng = jax.random.PRNGKey(9)
    opt = optax.adam(1e-3)

    mesh1 = make_mesh(1)
    step1 = make_sharded_stateful_step(model, opt, mesh1)
    p1, _, s1, loss1 = step1(params, init_stateful_opt_state(model, opt, params),
                             mstate, batch, rng)

    model = build_model(cfg, ds)  # fresh: donation consumed aliased buffers
    params = model.init_params(jax.random.PRNGKey(0))
    mstate = model.init_state(jax.random.PRNGKey(1))
    mesh = make_mesh(8)
    p_sh = shard_params(params, mesh)
    step8 = make_sharded_stateful_step(model, opt, mesh)
    p8, _, s8, loss8 = step8(p_sh, init_stateful_opt_state(model, opt, p_sh),
                             shard_state(mstate, mesh),
                             shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                               rtol=1e-4, atol=1e-5)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                   rtol=1e-4, atol=1e-5)
