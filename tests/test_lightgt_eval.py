"""LightGT per-eval-pass history resampling (dataload.py:124-145).

The reference EvalDataset reshuffles each user's 20-item eval
subsequence on EVERY eval pass (DataLoader __getitem__ draws fresh).
These tests pin: per-pass redraws differ, the stream is deterministic
per (seed, draw index), and the pad/mask layout matches the reference
(user slot 0 always valid; pads carry item index 0 and mask True).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model


def _build(tiny_dataset):
    cfg = Config(Model="LightGT", batch_size=32, dim_E=16,
                 learning_rate=0.01, reg_weight=1e-4, n_layers=1,
                 num_epoch=1, seed=7)
    return build_model(cfg, tiny_dataset)


@pytest.mark.fast
def test_resample_changes_and_is_deterministic(tiny_dataset):
    m1 = _build(tiny_dataset)
    first = np.asarray(m1.eval_items).copy()
    m1.resample_eval()
    second = np.asarray(m1.eval_items)
    assert not np.array_equal(first, second)

    m2 = _build(tiny_dataset)
    np.testing.assert_array_equal(first, np.asarray(m2.eval_items))
    m2.resample_eval()
    np.testing.assert_array_equal(second, np.asarray(m2.eval_items))


@pytest.mark.fast
def test_subset_layout_matches_reference(tiny_dataset):
    m = _build(tiny_dataset)
    items = np.asarray(m.eval_items)
    mask = np.asarray(m.eval_mask)
    hist = np.asarray(m.hist)
    sl = m.eval_src_len
    assert items.shape == (tiny_dataset.num_user, sl + 1)
    # user slot always valid
    assert not mask[:, 0].any()
    for u in range(tiny_dataset.num_user):
        valid_hist = set(hist[u][hist[u] < tiny_dataset.num_item].tolist())
        n_valid = min(len(valid_hist), sl)
        # valid prefix then pad tail, reference ordering semantics
        assert (~mask[u, 1:1 + n_valid]).all()
        assert mask[u, 1 + n_valid:].all()
        drawn = items[u, 1:1 + n_valid].tolist()
        assert set(drawn) <= valid_hist
        assert len(set(drawn)) == n_valid  # a subset, no repeats
        # pads carry item 0 (reference pads with num_user then subtracts)
        assert (items[u, 1 + n_valid:] == 0).all()


@pytest.mark.fast
def test_resample_keeps_treedef_stable(tiny_dataset):
    """The draw counter must be a dynamic leaf, not static aux: a python
    int counter changes the model treedef on every resample, so the
    jitted scoring program recompiles each evaluation (ADVICE r4)."""
    import jax

    m = _build(tiny_dataset)
    td0 = jax.tree_util.tree_structure(m)
    m.resample_eval()
    m.resample_eval()
    assert jax.tree_util.tree_structure(m) == td0
