"""Builders wiring Config + RecDataset into model instances.

Constructor-argument parity with the reference dispatch table
(main.py:260-387) is documented per builder.
"""

from __future__ import annotations

from chaorec_tpu.config import Config
from chaorec_tpu.data.loading import RecDataset
from chaorec_tpu.graphs.norm_adj import build_norm_adj
from chaorec_tpu.models import register_model
from chaorec_tpu.models.adagcl import AdaGCL
from chaorec_tpu.models.bpr import BPRMF
from chaorec_tpu.models.bspm import BSPM
from chaorec_tpu.models.dccf import DCCF
from chaorec_tpu.models.bm3 import BM3
from chaorec_tpu.models.fkan_gcf import FKAN_GCF
from chaorec_tpu.models.freedom import FREEDOM
from chaorec_tpu.models.lattice import LATTICE
from chaorec_tpu.models.lgmrec import LGMRec
from chaorec_tpu.models.powerec import POWERec
from chaorec_tpu.models.ddrec import DDRec
from chaorec_tpu.models.mentor import MENTOR
from chaorec_tpu.models.mgcl import MGCL
from chaorec_tpu.models.mmgcl import MMGCL
from chaorec_tpu.models.mgcn import MGCN
from chaorec_tpu.models.micro import MICRO
from chaorec_tpu.models.cohesion import COHESION
from chaorec_tpu.models.cf_diff import CF_Diff
from chaorec_tpu.models.gformer import GFormer
from chaorec_tpu.models.mhrec import MHRec
from chaorec_tpu.models.lightgt import LightGT
from chaorec_tpu.models.diffmm import DiffMM
from chaorec_tpu.models.diffrec import DiffRec
from chaorec_tpu.models.dragon import DRAGON
from chaorec_tpu.models.dualgnn import DualGNN
from chaorec_tpu.models.grade import Grade
from chaorec_tpu.models.graphaug import GraphAug
from chaorec_tpu.models.grcn import GRCN
from chaorec_tpu.models.mcln import MCLN
from chaorec_tpu.models.gume import GUME
from chaorec_tpu.models.mgat import MGAT
from chaorec_tpu.models.slmrec import SLMRec
from chaorec_tpu.models.smore import SMORE
from chaorec_tpu.models.vbpr import VBPR
from chaorec_tpu.models.lightgode import LightGODE
from chaorec_tpu.models.dgcf import DGCF
from chaorec_tpu.models.dhcf import DHCF
from chaorec_tpu.models.hccf import HCCF
from chaorec_tpu.models.layergcn import LayerGCN
from chaorec_tpu.models.lightgcl import LightGCL
from chaorec_tpu.models.macridvae import MacridVAE
from chaorec_tpu.models.mmgcn import MMGCN
from chaorec_tpu.models.mmssl import MMSSL
from chaorec_tpu.models.dualvae import DualVAE
from chaorec_tpu.models.multvae import MultVAE
from chaorec_tpu.models.mvgae import MVGAE
from chaorec_tpu.models.vgcl import VGCL
from chaorec_tpu.models.ncl import NCL
from chaorec_tpu.models.selfcf import SelfCF
from chaorec_tpu.models.lightgcn import LightGCN
from chaorec_tpu.models.ngcf import NGCF
from chaorec_tpu.models.sgl import SGL
from chaorec_tpu.models.simgcl import SimGCL
from chaorec_tpu.models.xsimgcl import XSimGCL
from chaorec_tpu.ops.linear_prop import (
    build_combined_op,
    build_weighted_op,
    fits_linear_op,
)


def _maybe_op(cfg: Config, ds: RecDataset, graph, layer_weights):
    """Combined linear operator when the dense path + memory allow it."""
    if cfg.get("use_linear_op", True) and graph.use_dense and fits_linear_op(
        ds.num_user, ds.num_item
    ):
        return build_weighted_op(
            graph.dense_r, tuple(layer_weights),
            store_bf16=cfg.graph_compute_dtype == "bfloat16",
        )
    return None


def _ui_graph(cfg: Config, ds: RecDataset, force_sparse: bool = False,
              bf16_dense_budget: int = 0):
    """UI graph. ``force_sparse`` skips the dense (U, I) operator so both
    propagate directions run on the ELL gather-reduce path — measured
    faster than the dense MXU matmul for the tower-style multimodal
    models whose forwards apply R/R^T many times per step.
    ``bf16_dense_budget`` (cells) raises the dense crossover when the
    graph computes in bf16: the dense matrix is half the bytes, and the
    GUME ablation (scripts/ablate_gume4.py, 653M-cell sports) measured
    dense-bf16 3-layer propagation at 19.3 ms fwd+bwd vs 57.7 ms for the
    transaction-bound ELL gathers — the fp32-calibrated default
    ``cfg.dense_prop_threshold`` leaves that win on the table for graphs
    just above it (microlens/sports are both ~653M cells)."""
    thr = cfg.dense_prop_threshold
    if bf16_dense_budget and cfg.graph_compute_dtype == "bfloat16":
        thr = max(thr, bf16_dense_budget)
    return build_norm_adj(
        ds.train_edges,
        ds.num_user,
        ds.num_item,
        use_dense=False if force_sparse else None,
        dense_threshold=thr,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("BPR")
def _bpr(cfg: Config, ds: RecDataset):
    # main.py:264: BPRMF(num_user, num_item, user_item_dict, dim_E, reg_weight, device)
    return BPRMF(ds.num_user, ds.num_item, cfg.dim_E, cfg.reg_weight)


@register_model("LightGCN")
def _lightgcn(cfg: Config, ds: RecDataset):
    # main.py:269-270: LightGCN(..., dim_E, reg_weight, n_layers, aggr_mode, device)
    graph = _ui_graph(cfg, ds)
    n = cfg.n_layers
    op = _maybe_op(cfg, ds, graph, [1.0 / (n + 1)] * (n + 1))
    return LightGCN(
        ds.num_user, ds.num_item, graph,
        cfg.dim_E, cfg.reg_weight, n, linear_op=op,
    )


@register_model("NGCF")
def _ngcf(cfg: Config, ds: RecDataset):
    # main.py:267-268: NGCF(..., dim_E, reg_weight, dropout, n_layers, aggr_mode, device)
    return NGCF(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        cfg.dim_E, cfg.reg_weight, cfg.dropout, cfg.n_layers,
    )


@register_model("SimGCL")
def _simgcl(cfg: Config, ds: RecDataset):
    # main.py:335-336: SimGCL(..., dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha, device)
    graph = _ui_graph(cfg, ds)
    n = cfg.n_layers
    op = _maybe_op(cfg, ds, graph, [0.0] + [1.0 / n] * n)
    return SimGCL(
        ds.num_user, ds.num_item, graph, cfg.dim_E, cfg.reg_weight,
        n, cfg.ssl_temp, cfg.ssl_alpha, linear_op=op,
    )


@register_model("XSimGCL")
def _xsimgcl(cfg: Config, ds: RecDataset):
    # main.py:337-338: XSimGCL(..., dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha, device)
    graph = _ui_graph(cfg, ds)
    n = cfg.n_layers
    op = _maybe_op(cfg, ds, graph, [0.0] + [1.0 / n] * n)
    return XSimGCL(
        ds.num_user, ds.num_item, graph, cfg.dim_E, cfg.reg_weight,
        n, cfg.ssl_temp, cfg.ssl_alpha, linear_op=op,
    )


@register_model("SGL")
def _sgl(cfg: Config, ds: RecDataset):
    # main.py:302-303: SGL(..., dim_E, reg_weight, n_layers, aggr_mode, ssl_temp, ssl_alpha, device)
    return SGL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
    )


@register_model("HCCF")
def _hccf(cfg: Config, ds: RecDataset):
    # main.py:311-313: HCCF(..., dim_E, reg_weight, n_layers, aggr_mode,
    #   ssl_alpha, ssl_temp, keepRate, leaky, mult, device)
    return HCCF(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.ssl_alpha, cfg.ssl_temp,
        cfg.keepRate, cfg.leaky, cfg.mult,
    )


@register_model("DCCF")
def _dccf(cfg: Config, ds: RecDataset):
    # main.py:325-326: DCCF(..., dim_E, reg_weight, n_layers, ssl_temp,
    #   ssl_alpha, n_intents, cen_reg, device)
    return DCCF(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
        cfg.n_intents, cfg.cen_reg,
    )


@register_model("DGCF")
def _dgcf(cfg: Config, ds: RecDataset):
    # main.py:274-275: DGCF(..., dim_E, reg_weight, corDecay, n_factors,
    #   n_iterations, n_layers, aggr_mode, device)
    return DGCF(
        ds.num_user, ds.num_item, ds.train_edges, cfg.dim_E, cfg.reg_weight,
        cfg.corDecay, cfg.n_factors, cfg.n_iterations, cfg.n_layers,
    )


@register_model("DHCF")
def _dhcf(cfg: Config, ds: RecDataset):
    # main.py:358-359: DHCF(..., dim_E, reg_weight, n_layers, dropout, device)
    import jax
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    h = jnp.asarray(dense_interactions(ds))
    return DHCF(
        ds.num_user, ds.num_item, h, cfg.dim_E, cfg.reg_weight,
        cfg.n_layers, cfg.dropout, jax.random.PRNGKey(cfg.seed + 7),
    )


def _feats(ds: RecDataset):
    import jax.numpy as jnp

    if ds.v_feat is None or ds.t_feat is None:
        raise ValueError(
            f"dataset {ds.name} has no modality features; load with "
            "has_v/has_t or enable synthetic_features"
        )
    return jnp.asarray(ds.v_feat), jnp.asarray(ds.t_feat)


@register_model("VBPR")
def _vbpr(cfg: Config, ds: RecDataset):
    # main.py:265-266: VBPR(num_user, num_item, dict, v_feat, dim_E,
    #   feature_embedding, reg_weight, device)
    v, _ = _feats(ds)
    return VBPR(ds.num_user, ds.num_item, v, cfg.dim_E,
                cfg.feature_embed, cfg.reg_weight)


@register_model("FREEDOM")
def _freedom(cfg: Config, ds: RecDataset):
    # main.py:287-289: FREEDOM(..., dim_E, feature_embedding, reg_weight,
    #   dropout, n_layers, mm_layers, ii_topk, *lambda_coeff*, device) —
    # the reference passes lambda_coeff into the mm_image_weight slot.
    v, t = _feats(ds)
    return FREEDOM(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.dropout,
        cfg.n_layers, cfg.mm_layers, cfg.ii_topk,
        mm_image_weight=cfg.lambda_coeff,
    )


@register_model("LATTICE")
def _lattice(cfg: Config, ds: RecDataset):
    # main.py:276-279: LATTICE(..., dim_E, feature_embedding, reg_weight,
    #   n_layers, mm_layers, ii_topk, aggr_mode, lambda_coeff, device)
    v, t = _feats(ds)
    # LATTICE applies R/R^T only n_layers(~2) times per step (not a
    # many-pass tower), and its per-batch cost on microlens measured
    # gather-bound (26 ms/batch ≈ GUME's 57.7 ms/3-layer at the same
    # 653M-cell size) — take the dense-bf16 MXU path up to GUME's
    # measured budget instead of forcing ELL.
    return LATTICE(
        ds.num_user, ds.num_item,
        _ui_graph(cfg, ds, bf16_dense_budget=int(8e8)), v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.n_layers,
        cfg.mm_layers, cfg.ii_topk, cfg.lambda_coeff,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("MICRO")
def _micro(cfg: Config, ds: RecDataset):
    # main.py:294-296: MICRO(..., dim_E, n_layers, reg_weight, ii_topk,
    #   mm_layers, ssl_temp, lambda_coeff, ssl_alpha, aggr_mode, device)
    v, t = _feats(ds)
    return MICRO(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds, force_sparse=True), v, t,
        cfg.dim_E, cfg.n_layers, cfg.reg_weight, cfg.ii_topk,
        cfg.mm_layers, cfg.ssl_temp, cfg.lambda_coeff, cfg.ssl_alpha,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("MGCN")
def _mgcn(cfg: Config, ds: RecDataset):
    # main.py:316-317: MGCN(..., dim_E, reg_weight, n_layers, aggr_mode,
    #   ssl_temp, ssl_alpha, device) — n_layers/n_ui_layers hardcoded inside.
    v, t = _feats(ds)
    return MGCN(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds, force_sparse=True), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.ssl_temp, cfg.ssl_alpha,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("AdaGCL")
def _adagcl(cfg: Config, ds: RecDataset):
    # main.py:327-328: AdaGCL(..., dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha, device)
    import jax

    return AdaGCL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
        jax.random.PRNGKey(cfg.seed + 41),
    )


@register_model("MMSSL")
def _mmssl(cfg: Config, ds: RecDataset):
    # main.py:331-332: MMSSL(..., dim_E, reg_weight, ssl_alpha, ssl_temp,
    #   G_rate, mm_layers, device)
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    v, t = _feats(ds)
    return MMSSL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        jnp.asarray(dense_interactions(ds)), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.ssl_alpha, cfg.ssl_temp,
        cfg.G_rate, cfg.mm_layers, batch_size=cfg.batch_size,
    )


@register_model("DualVAE")
def _dualvae(cfg: Config, ds: RecDataset):
    # main.py:329-330: DualVAE(..., dim_E, reg_weight(->kl_weight),
    #   ssl_alpha(->ssl_reg), device)
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    return DualVAE(
        ds.num_user, ds.num_item, jnp.asarray(dense_interactions(ds)),
        cfg.reg_weight, cfg.ssl_alpha,
    )


@register_model("MVGAE")
def _mvgae(cfg: Config, ds: RecDataset):
    # main.py:321-322: MVGAE(..., dim_E, reg_weight, n_layers, device)
    import jax

    v, t = _feats(ds)
    return MVGAE(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers,
        jax.random.PRNGKey(cfg.seed + 31),
    )


@register_model("MCLN")
def _mcln(cfg: Config, ds: RecDataset):
    # main.py:354-355: MCLN(..., dim_E, reg_weight, n_layers, n_mca, device)
    v, t = _feats(ds)
    return MCLN(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.n_mca,
    )


@register_model("Grade")
def _grade(cfg: Config, ds: RecDataset):
    # main.py:365-367: Grade(..., dim_E, reg_weight, n_layers, ssl_temp,
    #   ssl_alpha, ssl_temp2, noise_alpha, device)
    v, t = _feats(ds)
    return Grade(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.ssl_temp,
        cfg.ssl_alpha, cfg.ssl_temp2, cfg.noise_alpha,
    )


@register_model("GraphAug")
def _graphaug(cfg: Config, ds: RecDataset):
    # main.py:339-341: GraphAug(..., dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha, device)
    return GraphAug(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
    )


@register_model("GRCN")
def _grcn(cfg: Config, ds: RecDataset):
    # main.py:271-273: GRCN(..., dim_E, feature_embedding, reg_weight,
    #   dropout, n_iterations, aggr_mode, device)
    v, t = _feats(ds)
    return GRCN(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.dropout,
        cfg.n_iterations,
    )


@register_model("MGAT")
def _mgat(cfg: Config, ds: RecDataset):
    # main.py:292-293: MGAT(..., dim_E, reg_weight, device)
    v, t = _feats(ds)
    return MGAT(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight,
    )


@register_model("VGCL")
def _vgcl(cfg: Config, ds: RecDataset):
    # main.py:333-334: VGCL(..., dim_E, reg_weight, n_layers, ssl_temp, ssl_alpha, device)
    return VGCL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
    )


@register_model("MMGCN")
def _mmgcn(cfg: Config, ds: RecDataset):
    # main.py:261-263: MMGCN(..., dim_E, reg_weight, aggr_mode, 'False', True, device)
    import jax

    v, t = _feats(ds)
    return MMGCN(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, jax.random.PRNGKey(cfg.seed + 21),
    )


@register_model("DDRec")
def _ddrec(cfg: Config, ds: RecDataset):
    # main.py:299-301: DDRec(..., dim_E, feature_embedding, reg_weight,
    #   n_layers, ssl_temp, ssl_alpha, threshold, aggr_mode, device)
    v, t = _feats(ds)
    return DDRec(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.n_layers,
        cfg.ssl_temp, cfg.ssl_alpha, cfg.threshold,
    )


@register_model("MMGCL")
def _mmgcl(cfg: Config, ds: RecDataset):
    # main.py:297-298: MMGCL(..., dim_E, reg_weight, n_layers, ssl_alpha,
    #   ssl_temp, dropout, device)
    v, t = _feats(ds)
    return MMGCL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.ssl_alpha,
        cfg.ssl_temp, cfg.dropout,
    )


@register_model("MENTOR")
def _mentor(cfg: Config, ds: RecDataset):
    # main.py:346-348: MENTOR(..., dim_E, mm_layers, reg_weight, ssl_temp,
    #   dropout, align_weight, mask_weight_g, mask_weight_f, device)
    v, t = _feats(ds)
    return MENTOR(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.mm_layers, cfg.reg_weight, cfg.ssl_temp, cfg.dropout,
        cfg.align_weight, cfg.mask_weight_g, cfg.mask_weight_f,
    )


@register_model("LGMRec")
def _lgmrec(cfg: Config, ds: RecDataset):
    # main.py:342-343: LGMRec(..., dim_E, reg_weight, n_layers, ssl_alpha, device)
    v, t = _feats(ds)
    return LGMRec(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.ssl_alpha,
    )


@register_model("POWERec")
def _powerec(cfg: Config, ds: RecDataset):
    # main.py:318-320: POWERec(..., dim_E, reg_weight, n_layers, prompt_num,
    #   neg_weight, dropout, device)
    v, t = _feats(ds)
    return POWERec(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.prompt_num,
        cfg.neg_weight, cfg.dropout,
    )


@register_model("DualGNN")
def _dualgnn(cfg: Config, ds: RecDataset):
    # main.py:280-281: DualGNN(..., dim_E, feature_embedding, reg_weight,
    #   uu_topk, aggr_mode, device)
    v, t = _feats(ds)
    return DualGNN(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), ds.train_edges, v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.uu_topk,
    )


@register_model("DRAGON")
def _dragon(cfg: Config, ds: RecDataset):
    # main.py:284-286: DRAGON(..., dim_E, feature_embedding, reg_weight,
    #   n_layers, ii_topk, uu_topk, lambda_coeff(->mm_image_weight), aggr, device)
    v, t = _feats(ds)
    return DRAGON(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), ds.train_edges, v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.n_layers,
        cfg.ii_topk, cfg.uu_topk, mm_image_weight=cfg.lambda_coeff,
    )


@register_model("COHESION")
def _cohesion(cfg: Config, ds: RecDataset):
    # main.py:381-383: COHESION(..., dim_E, reg_weight, dropout, n_layers,
    #   mm_layers, ii_topk, mm_image_weight, device)
    v, t = _feats(ds)
    return COHESION(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), ds.train_edges, v, t,
        cfg.dim_E, cfg.reg_weight, cfg.dropout, cfg.n_layers,
        cfg.mm_layers, cfg.ii_topk, cfg.mm_image_weight,
    )


@register_model("SMORE")
def _smore(cfg: Config, ds: RecDataset):
    # main.py:377-378: SMORE(..., dim_E, reg_weight, n_ui_layers, ii_topk,
    #   dropout, dataset, device)
    v, t = _feats(ds)
    return SMORE(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds, force_sparse=True), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_ui_layers, cfg.ii_topk, cfg.dropout,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("GUME")
def _gume(cfg: Config, ds: RecDataset):
    # main.py:379-380: GUME(..., dim_E, n_layers, n_ui_layers, um_loss,
    #   vt_loss, dataset, device)
    v, t = _feats(ds)
    return GUME(
        ds.num_user, ds.num_item, ds.train_edges, v, t,
        cfg.dim_E, cfg.n_layers, cfg.n_ui_layers, cfg.um_loss, cfg.vt_loss,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("BM3")
def _bm3(cfg: Config, ds: RecDataset):
    # main.py:282-283: BM3(..., dim_E, feature_embedding, reg_weight,
    #   dropout, n_layers, cl_weight, aggr_mode, device)
    v, t = _feats(ds)
    return BM3(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.feature_embed, cfg.reg_weight, cfg.dropout,
        cfg.n_layers, cfg.cl_weight,
    )


@register_model("SLMRec")
def _slmrec(cfg: Config, ds: RecDataset):
    # main.py:290-291: SLMRec(..., dim_E, n_layers, ssl_temp, ssl_alpha, device)
    v, t = _feats(ds)
    return SLMRec(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
    )


@register_model("MGCL")
def _mgcl(cfg: Config, ds: RecDataset):
    # main.py:314-315: MGCL(..., dim_E, reg_weight, n_layers, aggr_mode,
    #   ssl_temp, ssl_alpha, device)
    v, t = _feats(ds)
    return MGCL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), v, t,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
    )


@register_model("FKAN_GCF")
def _fkan_gcf(cfg: Config, ds: RecDataset):
    # main.py:351-353: FKAN_GCF(..., dim_E, reg_weight, n_layers,
    #   node_dropout, message_dropout, grid_size, device)
    return FKAN_GCF(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.node_dropout, cfg.message_dropout,
        cfg.grid_size,
    )


@register_model("LightGODE")
def _lightgode(cfg: Config, ds: RecDataset):
    # main.py:356-357: LightGODE(..., dim_E, gamma, t, device)
    return LightGODE(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds), cfg.dim_E,
        cfg.gamma, cfg.t,
    )


@register_model("BSPM")
def _bspm(cfg: Config, ds: RecDataset):
    # main.py:368-369: BSPM(..., K_s, T_s, K_b, K_s(!), idl_beta, device)
    # Reference quirk: main.py passes args.K_s into the T_b slot.
    import jax

    from chaorec_tpu.graphs.norm_adj import build_norm_adj, node_degrees
    import jax.numpy as jnp

    graph = build_norm_adj(
        ds.train_edges, ds.num_user, ds.num_item, use_dense=True, eps=1e-7,
    )
    _, di = node_degrees(ds.train_edges, ds.num_user, ds.num_item)
    return BSPM(
        ds.num_user, ds.num_item, graph.dense_r, jnp.asarray(di),
        cfg.K_s, cfg.T_s, cfg.K_b, cfg.K_s, cfg.idl_beta,
        jax.random.PRNGKey(cfg.seed + 11),
    )


@register_model("DiffRec")
def _diffrec(cfg: Config, ds: RecDataset):
    # main.py:370-371: DiffRec(num_user, num_item, dict, noise_scale,
    #   noise_min, noise_max, steps, dims, learning_rate, device)
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    return DiffRec(
        ds.num_user, ds.num_item, jnp.asarray(dense_interactions(ds)),
        cfg.noise_scale, cfg.noise_min, cfg.noise_max, cfg.steps, cfg.dims,
        sample_compute_dtype=cfg.graph_compute_dtype,
    )


def _mhrec_hyperedges(cfg: Config, ds: RecDataset, v, t):
    """Hyperedge node lists for MHRec, fixed width 2 + uu_topk + ii_topk.

    Loads scripts/gen_hypergraph.py output when present — BOTH modalities
    from the *visual* file, reproducing the reference's loader quirk
    (main.py:223-226 reads hyperedges_textual from visual_file_path) —
    else builds the runtime-fallback edges (Model/MHRec.py:610-641): per
    train interaction, [user, uu_topk co-occurrence users, item,
    ii_topk knn items], full top-k lists, no dedup.
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chaorec_tpu.graphs.user_graph import (build_user_cooccurrence,
                                               topk_sample)

    n_sent = ds.num_user + ds.num_item
    vis_path = os.path.join(
        cfg.data_root, ds.name,
        f"hyperedges_visual_u{cfg.uu_topk}_i{cfg.ii_topk}.npy")
    if os.path.exists(vis_path):
        seq = np.load(vis_path, allow_pickle=True).tolist()
        width = max(len(h) for h in seq)
        arr = np.full((len(seq), width), n_sent, np.int32)
        for i, h in enumerate(seq):
            arr[i, :len(h)] = list(h)
        return arr, arr.copy()

    rs = np.random.default_rng(cfg.seed + 3)
    idx, cnt, lens = build_user_cooccurrence(
        ds.train_edges, ds.num_user, ds.num_item, topk=cfg.uu_topk)
    uu, _ = topk_sample(idx, cnt, lens, min(cfg.uu_topk, ds.num_user - 1),
                        rs)

    def knn_idx(feat, k):
        f = jnp.asarray(np.asarray(feat, np.float32))
        f = f * jax.lax.rsqrt(jnp.sum(f * f, 1, keepdims=True) + 1e-12)
        k = min(k, ds.num_item - 1)
        out = []
        for s in range(0, ds.num_item, 4096):
            sim = f[s:s + 4096] @ f.T
            rows = jnp.arange(s, min(s + 4096, ds.num_item))
            sim = sim.at[jnp.arange(sim.shape[0]), rows].set(-jnp.inf)
            out.append(np.asarray(jax.lax.top_k(sim, k)[1]))
        return np.concatenate(out, 0)

    ii_v = knn_idx(v, cfg.ii_topk)
    ii_t = knn_idx(t, cfg.ii_topk)
    e = ds.train_edges

    def pack(ii):
        return np.concatenate(
            [e[:, 0:1], uu[e[:, 0]],
             e[:, 1:2] + ds.num_user, ii[e[:, 1]] + ds.num_user],
            axis=1).astype(np.int32)

    return pack(ii_v), pack(ii_t)


@register_model("MHRec")
def _mhrec(cfg: Config, ds: RecDataset):
    # main.py:374-376: MHRec(num_user, num_item, train_data, dict, v_feat,
    #   t_feat, dim_E, reg_weight, ii_topk, uu_topk, num_hypernodes,
    #   n_layers, h_layers, ssl_temp, ssl_alpha, beta1, beta2, device)
    import jax.numpy as jnp

    v, t = _feats(ds)
    hv, ht = _mhrec_hyperedges(cfg, ds, v, t)
    # Measured (r2): the dense bf16 propagate beats the ELL gather path
    # here — phase-C applies R/R^T at 3E width inside a 91-step scan and
    # the MXU matmul wins on beauty-scale (U, I) despite the extra MACs
    # (11.3 s vs 10.0 s device epoch with force_sparse=True).
    return MHRec(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        jnp.asarray(hv),
        jnp.asarray(ht), v, t, cfg.dim_E, cfg.reg_weight, cfg.ii_topk,
        cfg.uu_topk, cfg.num_hypernodes, cfg.n_layers, cfg.h_layers,
        cfg.ssl_temp, cfg.ssl_alpha, cfg.beta1, cfg.beta2,
        sample_compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("GFormer")
def _gformer(cfg: Config, ds: RecDataset):
    # main.py:363-364: GFormer(num_user, num_item, train_data, dict, dim_E,
    #   reg_weight, n_layers, pnn_layer, *ssl_alpha* (-> ssl_reg slot), b2,
    #   ctra, device)
    return GFormer(
        ds.num_user, ds.num_item, ds.train_edges, cfg.dim_E, cfg.reg_weight,
        cfg.n_layers, cfg.pnn_layer, cfg.ssl_alpha, cfg.b2, cfg.ctra,
        seed=cfg.seed,
    )


@register_model("LightGT")
def _lightgt(cfg: Config, ds: RecDataset):
    # main.py:349-350: LightGT(num_user, num_item, train_data, dict,
    #   v_feat, t_feat, dim_E, reg_weight, n_layers, device)
    import jax.numpy as jnp

    v, t = _feats(ds)
    return LightGT(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        jnp.asarray(ds.history.values), v, t, cfg.dim_E, cfg.reg_weight,
        cfg.n_layers, seed=cfg.seed,
    )


@register_model("CF_Diff")
def _cf_diff(cfg: Config, ds: RecDataset):
    # main.py:372-373: CF_Diff(num_user, num_item, dict, noise_scale,
    #   noise_min, noise_max, steps, learning_rate, device). ``dims`` is in
    #   the grid but unused by CAM_AE (reference quirk).
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    return CF_Diff(
        ds.num_user, ds.num_item, jnp.asarray(dense_interactions(ds)),
        cfg.noise_scale, cfg.noise_min, cfg.noise_max, cfg.steps,
    )


@register_model("DiffMM")
def _diffmm(cfg: Config, ds: RecDataset):
    # main.py:360-362: DiffMM(num_user, num_item, train_data, dict, v_feat,
    #   t_feat, dim_E, reg_weight, n_layers, ssl_alpha, ssl_temp,
    #   ris_lambda, e_loss, rebuild_k, device)
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    v, t = _feats(ds)
    return DiffMM(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        jnp.asarray(dense_interactions(ds)), v, t, cfg.dim_E,
        cfg.reg_weight, cfg.n_layers, cfg.ssl_alpha, cfg.ssl_temp,
        cfg.ris_lambda, cfg.e_loss, cfg.rebuild_k,
        sample_compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("MultVAE")
def _multvae(cfg: Config, ds: RecDataset):
    # main.py:304: MultVAE(num_user, num_item, train_data, dict, dim_E, reg_weight, device)
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    return MultVAE(
        ds.num_user, ds.num_item, jnp.asarray(dense_interactions(ds)),
        cfg.dim_E, cfg.reg_weight,
    )


@register_model("MacridVAE")
def _macridvae(cfg: Config, ds: RecDataset):
    # main.py:307-308: MacridVAE(num_user, num_item, train_data, dict, dim_E, reg_weight, device)
    import jax.numpy as jnp

    from chaorec_tpu.data.loading import dense_interactions

    return MacridVAE(
        ds.num_user, ds.num_item, jnp.asarray(dense_interactions(ds)),
        cfg.dim_E, cfg.reg_weight,
    )


@register_model("NCL")
def _ncl(cfg: Config, ds: RecDataset):
    # main.py:305-306: NCL(..., dim_E, reg_weight, n_layers, aggr_mode, ssl_temp, ssl_alpha, device)
    return NCL(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.ssl_temp, cfg.ssl_alpha,
    )


@register_model("LightGCL")
def _lightgcl(cfg: Config, ds: RecDataset):
    # main.py:309-310: LightGCL(..., dim_E, reg_weight, n_layers, aggr_mode, ssl_alpha, ssl_temp, device)
    import jax
    import jax.numpy as jnp

    from chaorec_tpu.ops.svd import randomized_svd

    graph = build_norm_adj(
        ds.train_edges, ds.num_user, ds.num_item, use_dense=True,
        compute_dtype=cfg.graph_compute_dtype, eps=0.0,
    )
    u, s, v = randomized_svd(
        jax.random.PRNGKey(cfg.seed), graph.dense_r.astype(jnp.float32),
        LightGCL.q,
    )
    return LightGCL(
        ds.num_user, ds.num_item, graph, cfg.dim_E, cfg.reg_weight,
        cfg.n_layers, cfg.ssl_alpha, cfg.ssl_temp,
        svd_u_s=u * s[None, :], svd_v_s=v * s[None, :],
        svd_ut=u.T, svd_vt=v.T,
    )


@register_model("SelfCF")
def _selfcf(cfg: Config, ds: RecDataset):
    # main.py:344-345: SelfCF(..., dim_E, reg_weight, n_layers, dropout, device)
    return SelfCF(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.dropout,
    )


@register_model("LayerGCN")
def _layergcn(cfg: Config, ds: RecDataset):
    # main.py:323-324: LayerGCN(..., dim_E, reg_weight, n_layers, dropout, device)
    graph = build_norm_adj(
        ds.train_edges, ds.num_user, ds.num_item, use_dense=True,
        compute_dtype=cfg.graph_compute_dtype,
    )
    return LayerGCN(
        ds.num_user, ds.num_item, graph,
        cfg.dim_E, cfg.reg_weight, cfg.n_layers, cfg.dropout,
    )
