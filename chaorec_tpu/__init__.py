"""ChaoRec-TPU: a TPU-native (JAX/XLA/Pallas/pjit) top-K recommendation framework.

A ground-up rebuild of the capabilities of the ChaoRec reference framework
(single-GPU PyTorch research code) as an idiomatic TPU framework:

- all compute paths are jit-compiled XLA programs with static shapes;
- graph propagation runs on the MXU (dense bipartite matmul) or as
  sorted segment-sums / Pallas kernels (large graphs);
- negative sampling, full-catalog ranking, and metrics are on-device and
  vectorized (no Python per-user loops);
- scale-out is first-class via ``jax.sharding.Mesh`` + ``pjit``/``shard_map``
  (the reference has no distributed path at all).

Public surface mirrors the reference's user-visible behavior: same CLI flags,
same YAML hyperparameter grid format, same log file naming and line formats,
same metric definitions (natural-log NDCG, 1e-6 history masking, global item
id offset).
"""

__version__ = "0.1.0"

from chaorec_tpu.config import Config, load_yaml_config  # noqa: F401
