"""Negative sampling + fixed-shape batching tests."""

import jax
import jax.numpy as jnp
import numpy as np

from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
import pytest

pytestmark = pytest.mark.fast


def test_negatives_avoid_history(tiny_dataset):
    ds = tiny_dataset
    hist = jnp.asarray(ds.history.values)
    users = jnp.asarray(np.repeat(np.arange(ds.num_user), 50).astype(np.int32))
    neg = sample_negatives(jax.random.PRNGKey(0), users, hist, ds.num_item)
    neg = np.asarray(neg)
    hist_np = ds.history.values
    lens = ds.history.lengths
    for u, n in zip(np.asarray(users), neg):
        assert 0 <= n < ds.num_item
        assert n not in hist_np[u, : lens[u]], (u, n)


def test_negatives_roughly_uniform(tiny_dataset):
    ds = tiny_dataset
    hist = jnp.asarray(ds.history.values)
    u = 0
    users = jnp.zeros((20000,), jnp.int32)
    neg = np.asarray(
        sample_negatives(jax.random.PRNGKey(1), users, hist, ds.num_item)
    )
    valid = [i for i in range(ds.num_item)
             if i not in ds.history.values[u, : ds.history.lengths[u]]]
    counts = np.bincount(neg, minlength=ds.num_item)[valid]
    expected = len(neg) / len(valid)
    assert counts.min() > 0.5 * expected
    assert counts.max() < 1.5 * expected


def test_epoch_batches_cover_all_edges(tiny_dataset):
    ds = tiny_dataset
    edges = jnp.asarray(ds.train_edges)
    users, pos, w, _ = make_epoch_batches(jax.random.PRNGKey(2), edges, batch_size=32)
    n_batches = -(-ds.num_edges // 32)
    assert users.shape == (n_batches, 32)
    assert float(w.sum()) == ds.num_edges  # mask marks exactly the real edges
    # Every real (user, pos) pair appears exactly once among weighted slots.
    flat = np.stack([np.asarray(users).ravel(), np.asarray(pos).ravel()], axis=1)
    flat = flat[np.asarray(w).ravel() > 0]
    got = {tuple(r) for r in flat.tolist()}
    want = {tuple(r) for r in ds.train_edges.tolist()}
    assert got == want
    assert len(flat) == ds.num_edges


def test_membership_paths_identical():
    """Broadcast-compare and binary-search membership agree bitwise."""
    import numpy as np
    from chaorec_tpu.data import sampling

    rs = np.random.default_rng(3)
    h = np.sort(rs.integers(0, 500, (64, 20)).astype(np.int32), axis=1)
    h[:, -3:] = 500  # sentinel padding
    cand = rs.integers(0, 500, (64, 8)).astype(np.int32)
    # some guaranteed hits
    cand[:, 0] = h[:, 0]
    import jax.numpy as jnp

    a = sampling._in_sorted(jnp.asarray(h), jnp.asarray(cand))
    old = sampling._BCAST_MAX_H
    try:
        sampling._BCAST_MAX_H = 0  # force binary-search path
        b = sampling._in_sorted(jnp.asarray(h), jnp.asarray(cand))
    finally:
        sampling._BCAST_MAX_H = old
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_coerces_yaml_string_numbers():
    """YAML 1.1 parses '1e-5' as a string (Model_YAML/SMORE.yaml axis);
    Config.replace coerces to the field's numeric type."""
    from chaorec_tpu.config import Config

    c = Config().replace(reg_weight="1e-5", n_layers="3", aggr_mode="add")
    assert isinstance(c.reg_weight, float) and c.reg_weight == 1e-5
    assert isinstance(c.n_layers, int) and c.n_layers == 3
    assert c.aggr_mode == "add"
