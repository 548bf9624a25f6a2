"""End-to-end: models learn the planted structure of the tiny dataset."""

import numpy as np
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model
from chaorec_tpu.train.loop import Trainer


def _run(model_name, tiny_dataset, epochs=30, **overrides):
    cfg = Config(
        Model=model_name,
        batch_size=64,
        num_epoch=epochs,
        dim_E=16,
        learning_rate=0.05,
        reg_weight=1e-4,
        n_layers=2,
        topk=(5, 10, 20),
        patience=epochs,
    ).replace(**overrides)
    from chaorec_tpu.train.loop import train_and_evaluate

    model = build_model(cfg, tiny_dataset)
    return train_and_evaluate(model, tiny_dataset, cfg)


@pytest.mark.fast
@pytest.mark.parametrize("model_name", ["BPR", "LightGCN"])
def test_model_learns(tiny_dataset, model_name, caplog):
    import logging
    caplog.set_level(logging.INFO)
    best = _run(model_name, tiny_dataset)
    # Random ranking recall@20 ~= 20/48 = 0.42 on the 24-item preferred
    # block; a learned model should push recall@20 well above that while a
    # broken one hovers near random for the *top-5* cut (5/48 ~ 0.10).
    assert best[20]["recall"] > 0.6, best
    assert best[5]["recall"] > 0.2, best


@pytest.mark.parametrize(
    "model_name", ["NGCF", "SimGCL", "XSimGCL", "SGL", "LayerGCN"]
)
def test_graph_ssl_models_learn(tiny_dataset, model_name):
    # SGL's ssl loss is a *sum* over full-catalog logsumexp terms
    # (reference semantics, Model/SGL.py:207); on the tiny dataset it
    # dominates unless alpha is small — its reference grid includes 1e-3.
    alpha = 1e-5 if model_name == "SGL" else 0.01
    best = _run(model_name, tiny_dataset, epochs=15, ssl_alpha=alpha,
                ssl_temp=0.2, dropout=0.1)
    assert best[20]["recall"] > 0.5, (model_name, best)


def test_graphaug_learns(tiny_dataset):
    best = _run("GraphAug", tiny_dataset, epochs=15, ssl_alpha=0.01,
                ssl_temp=0.2, reg_weight=1e-3, n_layers=2)
    assert best[20]["recall"] > 0.5, best


@pytest.mark.parametrize("model_name", ["HCCF", "DCCF", "DGCF", "DHCF"])
def test_structured_models_learn(tiny_dataset, model_name):
    overrides = {
        "HCCF": dict(ssl_alpha=0.01, ssl_temp=0.5, keepRate=1.0, mult=0.01,
                     reg_weight=1e-5),
        "DCCF": dict(ssl_alpha=0.001, ssl_temp=1.0, n_intents=8,
                     cen_reg=1e-3, n_layers=1),
        "DGCF": dict(corDecay=0.001, n_factors=2, n_iterations=1, n_layers=2),
        "DHCF": dict(dropout=0.1, n_layers=1, learning_rate=0.02),
    }[model_name]
    best = _run(model_name, tiny_dataset, epochs=20, **overrides)
    assert best[20]["recall"] > 0.5, (model_name, best)


@pytest.mark.parametrize(
    "model_name",
    ["VBPR", "FREEDOM", "BM3", "SLMRec", "MGCL", "LATTICE", "MICRO", "MGCN",
     "SMORE", "GUME", "DualGNN", "DRAGON", "COHESION", "LGMRec", "POWERec",
     "DDRec", "MMGCL", "MENTOR", "MMGCN", "GRCN", "MGAT", "MCLN"],
)
def test_multimodal_models_learn(tiny_dataset, model_name):
    overrides = {
        "VBPR": dict(reg_weight=1e-4),
        "BM3": dict(reg_weight=1e-4, dropout=0.3, cl_weight=1.0,
                    feature_embed=16),
        "SLMRec": dict(ssl_alpha=0.05, ssl_temp=0.2, n_layers=1),
        "MGCL": dict(reg_weight=1e-4, ssl_alpha=0.01, ssl_temp=0.2),
        "LATTICE": dict(reg_weight=0.01, n_layers=2, mm_layers=1,
                        ii_topk=5, lambda_coeff=0.1, feature_embed=16),
        "MICRO": dict(reg_weight=0.01, n_layers=2, mm_layers=1, ii_topk=5,
                      ssl_temp=0.5, ssl_alpha=0.1, lambda_coeff=0.1),
        "MGCN": dict(reg_weight=1e-4, ssl_alpha=0.01, ssl_temp=0.2),
        "SMORE": dict(reg_weight=1e-5, n_ui_layers=3, ii_topk=5, dropout=0.0),
        "GUME": dict(n_ui_layers=3, n_layers=1, um_loss=0.1, vt_loss=0.01),
        "DualGNN": dict(reg_weight=0.01, uu_topk=5, feature_embed=16),
        "DRAGON": dict(reg_weight=0.01, n_layers=2, uu_topk=5, ii_topk=5,
                       lambda_coeff=0.6, feature_embed=16),
        "COHESION": dict(reg_weight=1e-3, dropout=0.0, n_layers=1,
                         mm_layers=1, ii_topk=5, mm_image_weight=0.1),
        "LGMRec": dict(reg_weight=1e-4, n_layers=3, ssl_alpha=1e-4),
        "POWERec": dict(reg_weight=0.1, n_layers=4, neg_weight=0.01,
                        dropout=0.1, prompt_num=2),
        "DDRec": dict(reg_weight=0.1, n_layers=2, ssl_alpha=0.01,
                      threshold=-10.0, ssl_temp=0.2, feature_embed=16),
        "MMGCL": dict(reg_weight=1e-3, n_layers=1, ssl_alpha=0.5,
                      ssl_temp=0.2, dropout=0.1),
        "MENTOR": dict(reg_weight=1e-3, mm_layers=1, dropout=0.1,
                       ssl_temp=0.2, align_weight=0.1, mask_weight_g=0.001,
                       mask_weight_f=1.5),
        "MMGCN": dict(reg_weight=1e-4, learning_rate=0.01),
        "GRCN": dict(reg_weight=1e-3, dropout=0.1, n_iterations=2,
                     feature_embed=16),
        "MGAT": dict(reg_weight=1e-4, learning_rate=0.01),
        "MCLN": dict(reg_weight=1e-7, n_layers=2, n_mca=2),
        # feature_embed must equal dim_E (the reference's modal BPR dots
        # user embeddings against dim_feat-projected features).
        "FREEDOM": dict(reg_weight=1e-3, n_layers=2, mm_layers=1,
                        ii_topk=5, dropout=0.1, lambda_coeff=0.8,
                        feature_embed=16),
    }[model_name]
    best = _run(model_name, tiny_dataset, epochs=25, **overrides)
    assert best[20]["recall"] > 0.5, (model_name, best)


@pytest.mark.parametrize("model_name", ["FKAN_GCF", "LightGODE"])
def test_special_models_learn(tiny_dataset, model_name):
    overrides = {
        "FKAN_GCF": dict(n_layers=3, grid_size=2, node_dropout=0.0,
                         message_dropout=0.0, reg_weight=1e-4),
        "LightGODE": dict(gamma=0.2, t=1.8, learning_rate=0.05),
    }[model_name]
    best = _run(model_name, tiny_dataset, epochs=25, **overrides)
    assert best[20]["recall"] > 0.5, (model_name, best)


def test_bspm_train_free(tiny_dataset):
    """Single-pass flow produces a full metric dict (numeric parity with
    the reference pipeline is covered by test_bspm_oracle.py; on this
    planted-block dataset the sharpening step legitimately suppresses the
    dominant eigencomponents, so recall here is not meaningful)."""
    from chaorec_tpu.train.loop import train_and_evaluate

    cfg = Config(Model="BSPM", K_s=2, T_s=1.5, idl_beta=1.0, topk=(5, 10, 20))
    model = build_model(cfg, tiny_dataset)
    best = train_and_evaluate(model, tiny_dataset, cfg)
    assert set(best) == {5, 10, 20}
    assert all(0.0 <= best[k]["recall"] <= 1.0 for k in best)


@pytest.mark.parametrize("model_name", ["MultVAE", "MacridVAE"])
def test_vae_models_learn(tiny_dataset, model_name):
    best = _run(model_name, tiny_dataset, epochs=30, learning_rate=0.01,
                reg_weight=0.0)
    assert best[20]["recall"] > 0.5, (model_name, best)


def test_grade_learns(tiny_dataset):
    best = _run("Grade", tiny_dataset, epochs=15, learning_rate=0.05,
                reg_weight=0.01, ssl_alpha=0.02, ssl_temp=0.3,
                ssl_temp2=0.3, noise_alpha=0.02, n_layers=2)
    assert best[20]["recall"] > 0.5, best


def test_adagcl_learns(tiny_dataset):
    # 20 epochs: the 15-epoch run sat exactly at 0.5 after the exact
    # (fp32-reassociated) scatter-free propagation swap shifted the
    # trajectory; a few more epochs restores headroom over the bar
    best = _run("AdaGCL", tiny_dataset, epochs=20, learning_rate=0.05,
                reg_weight=1e-3, ssl_alpha=0.01, ssl_temp=0.5, n_layers=2)
    assert best[20]["recall"] > 0.5, best


def test_mmssl_learns(tiny_dataset):
    best = _run("MMSSL", tiny_dataset, epochs=20, learning_rate=0.005,
                reg_weight=1e-5, ssl_alpha=0.1, ssl_temp=0.5, G_rate=1e-4,
                mm_layers=2)
    assert best[20]["recall"] > 0.5, best


def test_dualvae_learns(tiny_dataset):
    best = _run("DualVAE", tiny_dataset, epochs=40, learning_rate=0.005,
                reg_weight=0.5, ssl_alpha=0.01)
    assert best[20]["recall"] > 0.5, best


def test_mvgae_learns(tiny_dataset):
    best = _run("MVGAE", tiny_dataset, epochs=20, learning_rate=0.01,
                reg_weight=0.1, n_layers=2, feature_embed=16)
    assert best[20]["recall"] > 0.5, best


def test_diffmm_learns(tiny_dataset):
    # mild noise + small cl/e terms so the BPR phase dominates on 64 users
    best = _run("DiffMM", tiny_dataset, epochs=15, learning_rate=0.05,
                n_layers=1, ssl_alpha=1e-3, ssl_temp=0.1, ris_lambda=0.5,
                e_loss=0.01, rebuild_k=1, reg_weight=1e-4)
    assert best[20]["recall"] > 0.5, best


def test_mhrec_learns(tiny_dataset):
    best = _run("MHRec", tiny_dataset, epochs=15, learning_rate=0.05,
                reg_weight=1e-4, n_layers=2, h_layers=1, uu_topk=3,
                ii_topk=3, num_hypernodes=2, ssl_alpha=1e-3, ssl_temp=0.1,
                beta1=0.5, beta2=0.5, noise_scale=0.001)
    assert best[20]["recall"] > 0.5, best


def test_gformer_learns(tiny_dataset):
    # small ssl/ctra so the planted-block BPR signal dominates on 64 users
    best = _run("GFormer", tiny_dataset, epochs=15, learning_rate=0.05,
                reg_weight=1e-4, n_layers=2, pnn_layer=1, ssl_alpha=1e-4,
                b2=0.01, ctra=1e-4)
    assert best[20]["recall"] > 0.5, best


def test_lightgt_learns(tiny_dataset):
    best = _run("LightGT", tiny_dataset, epochs=20, learning_rate=0.01,
                reg_weight=1e-3, n_layers=2)
    assert best[20]["recall"] > 0.5, best


def test_cf_diff_learns(tiny_dataset, monkeypatch):
    # the 1024-token inner width (reference-fixed) makes the 1034^2
    # attention masks dominate CPU time; shrink it for the behavioral test
    from chaorec_tpu.models.cf_diff import CF_Diff

    monkeypatch.setattr(CF_Diff, "dim_inters", 64)
    best = _run("CF_Diff", tiny_dataset, epochs=30, learning_rate=0.001,
                noise_scale=0.001, noise_min=0.005, noise_max=0.005, steps=5)
    assert best[20]["recall"] > 0.5, best


def test_diffrec_learns(tiny_dataset):
    best = _run("DiffRec", tiny_dataset, epochs=40, learning_rate=0.001,
                noise_scale=0.001, noise_min=0.005, noise_max=0.005,
                steps=5, dims="[64]")
    assert best[20]["recall"] > 0.5, best


@pytest.mark.parametrize("model_name", ["NCL", "LightGCL", "SelfCF", "VGCL"])
def test_contrastive_models_learn(tiny_dataset, model_name):
    # NCL/LightGCL full-catalog nce terms are summed -> small alphas, as in
    # their reference grids (ssl_alpha 1e-5 / 1e-2).
    overrides = {
        "NCL": dict(ssl_alpha=1e-5, ssl_temp=0.1, reg_weight=1e-5),
        "LightGCL": dict(ssl_alpha=0.01, ssl_temp=0.1, reg_weight=1e-7),
        "SelfCF": dict(dropout=0.5, reg_weight=1e-4),
        "VGCL": dict(ssl_alpha=0.01, ssl_temp=0.2, reg_weight=1e-4),
    }[model_name]
    best = _run(model_name, tiny_dataset, epochs=20, **overrides)
    assert best[20]["recall"] > 0.5, (model_name, best)


def test_ranklist_excludes_history(tiny_dataset):
    """With all-positive scores, 1e-6 history masking (reference semantics,
    Model/BPR.py:81-83) must push seen items out of the top-k. (With scores
    that can go negative, 1e-6 masking deliberately does NOT guarantee
    exclusion — that is reference behavior, not a bug.)"""
    import jax.numpy as jnp

    from chaorec_tpu.eval.ranking import gene_ranklist

    rs = np.random.default_rng(7)
    user_emb = jnp.asarray(
        np.abs(rs.normal(size=(tiny_dataset.num_user, 8))).astype(np.float32) + 0.1
    )
    item_emb = jnp.asarray(
        np.abs(rs.normal(size=(tiny_dataset.num_item, 8))).astype(np.float32) + 0.1
    )
    rank = gene_ranklist(
        user_emb, item_emb, jnp.asarray(tiny_dataset.history.values),
        tiny_dataset.num_user, topk=20,
    )
    rank = np.asarray(rank) - tiny_dataset.num_user
    hist = tiny_dataset.history
    for u in range(tiny_dataset.num_user):
        seen = set(hist.values[u, : hist.lengths[u]].tolist())
        topk = set(rank[u, :20].tolist())
        # 1e-6 masking pushes history out of any realistic top-k.
        assert not (seen & topk), u


@pytest.mark.fast
def test_gume_dense_bf16_matches_ell_fp32(tiny_dataset):
    """GUME's dense bf16 MXU propagation (the fast path picked on
    beauty/sports scale, scripts/ablate_gume4.py) must agree with the
    exact fp32 ELL path to bf16 rounding tolerance."""
    import jax
    import jax.numpy as jnp

    cfg = Config(Model="GUME", dim_E=16, n_layers=1, n_ui_layers=3,
                 um_loss=0.1, vt_loss=0.01)
    m_bf = build_model(cfg, tiny_dataset)
    m_fp = build_model(
        cfg.replace(graph_compute_dtype="float32"), tiny_dataset)
    assert m_bf.graph_bf16 and not m_fp.graph_bf16
    params = m_fp.init_params(jax.random.PRNGKey(0))
    out_bf = jax.jit(lambda m, p: m.forward(p))(m_bf, params)
    out_fp = jax.jit(lambda m, p: m.forward(p))(m_fp, params)
    for a, b in zip(out_bf, out_fp):
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-6)
        assert jnp.max(jnp.abs(a - b)) / scale < 3e-2, (
            float(jnp.max(jnp.abs(a - b))), float(scale))


def test_mhrec_phase_b_sampling_dtype_gate(tiny_dataset):
    """Phase-B p_sample runs bf16-MXU by default (no gradients, ordinal
    top-k output; ~130 TFLOP/epoch on beauty) and drops back to exact
    fp32 under graph_compute_dtype="float32" (VERDICT r2 item 5)."""
    import jax
    import jax.numpy as jnp

    kwargs = dict(batch_size=64, dim_E=16, learning_rate=1e-3,
                  reg_weight=1e-4, n_layers=1, h_layers=1, uu_topk=2,
                  ii_topk=2, num_hypernodes=2, ssl_alpha=1e-3, ssl_temp=0.1,
                  beta1=0.5, beta2=0.5, noise_scale=0.001)
    m_bf = build_model(Config(Model="MHRec", **kwargs), tiny_dataset)
    m_fp = build_model(
        Config(Model="MHRec", graph_compute_dtype="float32", **kwargs),
        tiny_dataset)
    assert m_bf.sample_dtype == jnp.bfloat16
    assert m_fp.sample_dtype is None

    params = m_bf.init_params(jax.random.PRNGKey(0))
    out_bf = m_bf.rebuild_rows(params, "img_dn", m_bf.hyper_nodes_v[:16],
                               jax.random.PRNGKey(1))
    out_fp = m_fp.rebuild_rows(params, "img_dn", m_fp.hyper_nodes_v[:16],
                               jax.random.PRNGKey(1))
    assert out_bf.shape == out_fp.shape == (16, 2)
    assert int(out_bf.max()) <= m_bf.num_nodes
    # the reduced-precision chain selects (nearly) the same top nodes at
    # tiny scale; sanity that it is not producing garbage rankings
    agree = float(jnp.mean((out_bf == out_fp).astype(jnp.float32)))
    assert agree > 0.8, agree


def test_diffusion_sampling_dtype_gates(tiny_dataset):
    """DiffMM's rebuild and DiffRec's eval p_sample follow the same
    no-grad bf16-MXU policy as MHRec phase B, and drop to exact fp32
    under graph_compute_dtype="float32"."""
    import jax
    import jax.numpy as jnp

    mm_kwargs = dict(batch_size=64, dim_E=16, learning_rate=1e-3,
                     n_layers=1, ssl_alpha=1e-3, ssl_temp=0.1,
                     ris_lambda=0.5, e_loss=0.01, rebuild_k=1,
                     reg_weight=1e-4)
    m_bf = build_model(Config(Model="DiffMM", **mm_kwargs), tiny_dataset)
    m_fp = build_model(
        Config(Model="DiffMM", graph_compute_dtype="float32", **mm_kwargs),
        tiny_dataset)
    assert m_bf.sample_dtype == jnp.bfloat16 and m_fp.sample_dtype is None
    st = m_bf.rebuild_graphs(m_bf.init_params(jax.random.PRNGKey(0)),
                             jax.random.PRNGKey(1))
    assert jax.tree_util.tree_leaves(st)  # rebuilt state materializes

    dr_kwargs = dict(batch_size=64, dim_E=16, learning_rate=1e-3,
                     noise_scale=0.001, noise_min=0.005, noise_max=0.005,
                     steps=5, dims="[64]")
    d_bf = build_model(Config(Model="DiffRec", **dr_kwargs), tiny_dataset)
    d_fp = build_model(
        Config(Model="DiffRec", graph_compute_dtype="float32", **dr_kwargs),
        tiny_dataset)
    assert d_bf.sample_dtype == jnp.bfloat16 and d_fp.sample_dtype is None
    p = d_bf.init_params(jax.random.PRNGKey(0))
    uids = jnp.arange(8, dtype=jnp.int32)
    s_bf = d_bf.score_users(p, uids)
    s_fp = d_fp.score_users(p, uids)
    assert s_bf.dtype == jnp.float32  # fp32 accumulation
    # near-identical scores at tiny scale; ranking-ordinal use downstream
    import numpy as np
    np.testing.assert_allclose(np.asarray(s_bf), np.asarray(s_fp),
                               rtol=5e-2, atol=5e-2)
