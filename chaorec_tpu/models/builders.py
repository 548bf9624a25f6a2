"""Builders wiring Config + RecDataset into model instances.

Constructor-argument parity with the reference dispatch table
(main.py:260-387) is documented per builder.
"""

from __future__ import annotations

from chaorec_tpu.config import Config
from chaorec_tpu.data.loading import RecDataset
from chaorec_tpu.graphs.norm_adj import build_norm_adj
from chaorec_tpu.models import register_model
from chaorec_tpu.models.bpr import BPRMF
from chaorec_tpu.models.lightgcn import LightGCN


def _ui_graph(cfg: Config, ds: RecDataset):
    return build_norm_adj(
        ds.train_edges,
        ds.num_user,
        ds.num_item,
        dense_threshold=cfg.dense_prop_threshold,
        compute_dtype=cfg.graph_compute_dtype,
    )


@register_model("BPR")
def _bpr(cfg: Config, ds: RecDataset):
    # main.py:264: BPRMF(num_user, num_item, user_item_dict, dim_E, reg_weight, device)
    return BPRMF(ds.num_user, ds.num_item, cfg.dim_E, cfg.reg_weight)


@register_model("LightGCN")
def _lightgcn(cfg: Config, ds: RecDataset):
    # main.py:269-270: LightGCN(..., dim_E, reg_weight, n_layers, aggr_mode, device)
    return LightGCN(
        ds.num_user, ds.num_item, _ui_graph(cfg, ds),
        cfg.dim_E, cfg.reg_weight, cfg.n_layers,
    )
