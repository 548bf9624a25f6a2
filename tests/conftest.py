"""Test harness: force a virtual 8-device CPU platform.

The reference has no tests at all (SURVEY.md §4); this suite is the added
test pyramid. Multi-device paths are exercised without a TPU pod by
splitting the host CPU into 8 XLA devices — the TPU-era equivalent of a
fake backend. These env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU-tunnel plugin (axon) registers itself from sitecustomize before
# conftest runs and can override JAX_PLATFORMS; force the CPU backend at the
# config level too.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_dataset():
    """Synthetic dataset with a planted block structure so models can learn."""
    from chaorec_tpu.data.loading import RecDataset, PaddedLists, _pad_lists

    rs = np.random.default_rng(0)
    num_user, num_item = 64, 48
    # Two user groups preferring two item groups.
    edges = []
    for u in range(num_user):
        group = u % 2
        items = rs.choice(
            np.arange(group * 24, group * 24 + 24), size=8, replace=False
        )
        for i in items[:6]:
            edges.append((u, int(i)))
    edges = np.array(edges, dtype=np.int32)

    hist = [[] for _ in range(num_user)]
    for u, i in edges:
        hist[u].append(int(i))

    # Held-out positives from the same preferred block.
    val_pos, test_pos = [], []
    for u in range(num_user):
        group = u % 2
        pool = [i for i in range(group * 24, group * 24 + 24) if i not in hist[u]]
        val_pos.append(pool[:2])
        test_pos.append(pool[2:4])

    # Structured synthetic modality features (same recipe as the loader's
    # fallback): random projection of interaction columns + noise.
    def feat(dim, seed):
        fr = np.random.default_rng(seed)
        proj = fr.standard_normal((num_user, dim)).astype(np.float32)
        f = np.zeros((num_item, dim), np.float32)
        np.add.at(f, edges[:, 1], proj[edges[:, 0]])
        return f + 0.1 * fr.standard_normal((num_item, dim)).astype(np.float32)

    return RecDataset(
        name="tiny",
        num_user=num_user,
        num_item=num_item,
        train_edges=edges,
        history=_pad_lists(hist, fill=num_item, sort=True),
        val_users=np.arange(num_user, dtype=np.int32),
        val_pos=_pad_lists(val_pos, fill=-1),
        test_users=np.arange(num_user, dtype=np.int32),
        test_pos=_pad_lists(test_pos, fill=-1),
        v_feat=feat(32, 11),
        t_feat=feat(16, 22),
    )
