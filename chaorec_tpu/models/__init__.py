"""Model registry.

Replaces the reference's hand-edited 54-entry constructor dict
(main.py:260-387) with a declarative registry: each model module registers
a builder ``(cfg, dataset) -> RecModel``. Builders receive the full config
and dataset, so constructor-argument quirks of the reference (e.g. FREEDOM
being handed ``lambda_coeff`` in its ``mm_image_weight`` slot,
main.py:287-289) are reproduced inside the individual builder where they
are documented.
"""

from __future__ import annotations

from typing import Callable, Dict

from chaorec_tpu.config import Config
from chaorec_tpu.data.loading import RecDataset
from chaorec_tpu.models.base import Batch, Params, RecModel  # noqa: F401

MODEL_REGISTRY: Dict[str, Callable[[Config, RecDataset], RecModel]] = {}

# Re-export: the whitelist lives next to the pytree flatten rule it
# modifies (models/base.py) — continuous hyperparameters flatten as
# pytree leaves so grid combos share compiled programs.
from chaorec_tpu.models.base import TRACED_SCALAR_ATTRS  # noqa: F401,E402


def register_model(name: str):
    def deco(builder: Callable[[Config, RecDataset], RecModel]):
        MODEL_REGISTRY[name] = builder
        return builder
    return deco


def build_model(cfg: Config, dataset: RecDataset) -> RecModel:
    # Import model modules lazily so the registry is populated.
    import chaorec_tpu.models.builders  # noqa: F401

    if cfg.Model not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {cfg.Model!r}. Registered: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[cfg.Model](cfg, dataset)
