"""Configuration system: one explicit config object + YAML cartesian grid.

Replaces the reference's two-level flag system (argparse defaults at
``arg_parser.py:13-94`` overridden per grid combination by YAML lists,
``main.py:236-257``) with a single dataclass. The reference re-executes
``parse_args()`` at import time in several modules and mutates a global
``args`` object mid-run; here every component receives the ``Config``
explicitly and grid search produces immutable per-combo copies.

YAML schema parity (``Model_YAML/*.yaml``, ``arg_parser.py:97-100``):
``{param: [v1, v2, ...], hyper_parameters: [axis names]}``; only keys listed
in ``hyper_parameters`` become grid axes, other keys are ignored, and axis
values overwrite the config attribute for that combination — including keys
that are not predeclared flags (the reference relies on ``setattr`` for
e.g. ``mm_image_weight``, ``main.py:256-257``).
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import yaml


@dataclass
class Config:
    """All run-time flags. Defaults mirror ``arg_parser.py:16-92``."""

    Model: str = "COHESION"
    data_path: str = "microlens"
    learning_rate: float = 1e-3
    feature_embed: int = 64
    batch_size: int = 1024
    aggr_mode: str = "add"
    reg_weight: float = 1e-3
    dim_E: int = 64
    num_epoch: int = 1000
    dropout: float = 0.2
    n_layers: int = 2
    corDecay: float = 0.001
    n_factors: int = 4
    n_iterations: int = 3
    cl_weight: float = 2.0
    mm_layers: int = 2
    ii_topk: int = 10
    uu_topk: int = 10
    lambda_coeff: float = 0.9
    ssl_temp: float = 0.9
    ssl_alpha: float = 0.9
    ae_weight: float = 0.1
    threshold: float = 0.1
    prompt_num: float = 0.1
    neg_weight: float = 0.1
    cen_reg: float = 5e-3
    n_intents: int = 128
    G_rate: float = 1e-4
    align_weight: float = 0.1
    mask_weight_f: float = 1.5
    mask_weight_g: float = 0.001
    leaky: float = 0.5
    keepRate: float = 1.0
    mult: float = 0.1
    grid_size: int = 1
    node_dropout: float = 0.1
    message_dropout: float = 0.1
    n_mca: int = 2
    gamma: float = 0.5
    t: float = 1.8
    e_loss: float = 0.1
    ris_lambda: float = 0.5
    rebuild_k: int = 1
    pnn_layer: int = 1
    b2: float = 1.0
    ctra: float = 0.001
    noise_alpha: float = 0.3
    ssl_temp2: float = 0.2
    K_s: int = 1
    T_s: float = 1.0
    K_b: int = 1
    T_b: float = 1.0
    idl_beta: float = 1.0
    sampling_noise: bool = False
    sampling_steps: int = 0
    steps: int = 5
    noise_scale: float = 0.1
    noise_min: float = 0.0001
    noise_max: float = 0.02
    dims: str = "[1000]"
    h_layers: int = 2
    num_hypernodes: int = 10
    beta1: float = 0.5
    beta2: float = 0.5
    n_ui_layers: int = 3
    um_loss: float = 0.1
    vt_loss: float = 0.1
    seed: int = 42
    num_workers: int = 1
    topk: Tuple[int, ...] = (5, 10, 20)

    # --- keys that exist only in YAML files in the reference (set via
    # setattr at main.py:256-257); declared here so grid overwrite is typed.
    mm_image_weight: float = 0.1

    # --- TPU-framework-only knobs (no reference counterpart) ---
    data_root: str = "Data"  # directory containing {dataset}/train.npy etc.
    log_dir: str = "log"
    rank_topk: int = 50  # gene_ranklist(topk=50) default across the reference
    patience: int = 20  # early stopping, train_and_evaluate.py:529
    neg_candidates: int = 8  # oversample-k for fixed-shape negative sampling
    eval_user_chunk: int = 4096  # users scored per jit eval tile
    dense_prop_threshold: int = 600_000_000  # max U*I for dense MXU propagation
    # Graph-propagation matmul numerics: "bfloat16" = 1-pass MXU with fp32
    # accumulation (TPU-standard training numerics), "float32" = exact.
    graph_compute_dtype: str = "bfloat16"
    # Relaxed-precision mode for row-sparse trainable feature tables
    # (FREEDOM-family (I, 4096) v_feat etc.): "bf16" stores the table AND
    # its Adam moments in bfloat16 (per-step math stays fp32), halving
    # the dominant (p, m, v) HBM sweep + feature-gather bytes. Default ""
    # = exact fp32 reference semantics. Quality delta measured on the
    # cross-framework oracle (parity_logs/xfw_report.txt).
    relaxed_precision: str = ""
    # Max batches per dispatched epoch program. 0 = whole epoch in ONE
    # jitted scan (default). The TPU worker kills single programs whose
    # execution runs past its budget (Grade/sports E=158k and
    # AdaGCL/netfilx E=259k crash at full length while 78-batch
    # prefixes of the identical step program pass —
    # parity_logs/grade_crash_probe5.txt); heavy multi-generator
    # trainers auto-chunk at >=120k edges unless this overrides.
    max_dispatch_batches: int = 0
    mesh_shape: str = ""  # e.g. "dp=4,mp=2"; empty = single device
    checkpoint_dir: str = ""  # orbax checkpoints; empty = disabled
    checkpoint_every: int = 0  # epochs between checkpoints; 0 = disabled
    profile_dir: str = ""  # jax.profiler trace output; empty = disabled
    # Serving artifact written for the grid's best combo after training
    # (chaorec_tpu/serve.py); empty = disabled.
    export_artifact: str = ""
    # One-epoch-deep eval pipeline: overlap the per-epoch metrics fetch
    # round trip with the next epoch's device work. Identical metric values
    # and early-stop decisions; auto-disabled with checkpointing, export,
    # or profiling (train/loop.py).
    eval_pipeline: bool = True

    # Extra dynamic keys from YAML that are not predeclared.
    extra: Dict[str, Any] = field(default_factory=dict)

    def replace(self, **kwargs: Any) -> "Config":
        """Immutable update; unknown keys land in ``extra``.

        YAML 1.1 parses dot-less scientific notation ("1e-5") as a STRING
        (e.g. Model_YAML/SMORE.yaml reg_weight axis); coerce string values
        to the field's numeric type so grid combos behave like typed CLI
        flags."""
        known = {f.name for f in dataclasses.fields(self)}
        direct = {k: v for k, v in kwargs.items() if k in known}
        unknown = {k: v for k, v in kwargs.items() if k not in known}
        for k, v in list(direct.items()):
            cur = getattr(self, k)
            if isinstance(v, str) and isinstance(cur, (int, float)) \
                    and not isinstance(cur, bool):
                try:
                    fv = float(v)
                except ValueError:
                    continue
                if isinstance(cur, int) and not fv.is_integer():
                    raise ValueError(
                        f"config field {k!r} is an int; refusing to "
                        f"truncate string value {v!r}"
                    )
                direct[k] = type(cur)(fv)
        new = dataclasses.replace(self, **direct)
        if unknown:
            new.extra = {**self.extra, **unknown}
        return new

    def get(self, key: str, default: Any = None) -> Any:
        if hasattr(self, key) and key != "extra":
            return getattr(self, key)
        return self.extra.get(key, default)

    def as_flat_dict(self) -> Dict[str, Any]:
        d = {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}
        d.pop("extra")
        d.update(self.extra)
        return d


def load_yaml_config(model_name: str, yaml_dir: str = "Model_YAML") -> Dict[str, Any]:
    """Reference parity: ``arg_parser.load_yaml_config`` (arg_parser.py:97-100)."""
    yaml_file = Path(yaml_dir) / f"{model_name}.yaml"
    with open(yaml_file, "r") as fh:
        return yaml.safe_load(fh)


def grid_combinations(yaml_cfg: Dict[str, Any]) -> Iterator[Dict[str, Any]]:
    """Cartesian product over the ``hyper_parameters`` axes (main.py:236-241)."""
    axes: List[str] = yaml_cfg["hyper_parameters"]
    values = [yaml_cfg[a] for a in axes]
    for combo in itertools.product(*values):
        yield dict(zip(axes, combo))


def parse_cli(argv: Optional[List[str]] = None) -> Config:
    """CLI with the same flags as the reference (``arg_parser.py:13-94``)."""
    parser = argparse.ArgumentParser(description="Run ChaoRec-TPU.")
    cfg = Config()
    skip = {"topk", "extra"}
    for f in dataclasses.fields(Config):
        if f.name in skip:
            continue
        default = getattr(cfg, f.name)
        if isinstance(default, bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default)
        else:
            parser.add_argument(f"--{f.name}", type=type(default), default=default)
    parser.add_argument("--topk", type=int, nargs="+", default=[5, 10, 20])
    ns = parser.parse_args(argv)
    d = vars(ns)
    d["topk"] = tuple(d["topk"])
    return Config(**d)
