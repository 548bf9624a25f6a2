"""BSPM: item-space factored pipeline == reference (U+I)-space pipeline.

Oracle reimplements Model/BSPM.py:60-181 in numpy: full (U+I)^2 normalized
adjacency L, exact top-2q eigenvectors of the symmetric L (== singular
vectors used by sparsesvd), ideal filter D^-1/2 V V^T D^1/2, blur L^T L,
Euler sharpening. The model computes the same thing in item space via the
bipartite pairing argument (see chaorec_tpu/models/bspm.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp

from chaorec_tpu.config import Config
from chaorec_tpu.models import build_model


def _oracle_scores(edges, num_user, num_item, users, q2, k_s, t_s, idl_beta):
    n = num_user + num_item
    a = np.zeros((n, n), np.float64)
    for u, i in edges:
        a[u, num_user + i] = 1.0
        a[num_user + i, u] = 1.0
    deg = a.sum(1) + 1e-7
    dinv = deg ** -0.5
    l = dinv[:, None] * a * dinv[None, :]
    # top-2q eigenvectors by |eigenvalue| of symmetric L
    w, v = np.linalg.eigh(l)
    order = np.argsort(-np.abs(w))[:q2]
    vv = v[:, order]
    p = (dinv[:, None] * vv) @ (vv.T * (1.0 / dinv)[None, :])
    lf = l.T @ l
    rows = l[users]  # user rows of the normalized adjacency
    idl = rows @ p
    blur = (lf @ rows.T).T
    y = idl_beta * idl + blur
    dt = t_s / k_s
    for _ in range(k_s):
        y = y - dt * (lf @ y.T).T
    return y[:, num_user:]  # item part


def test_bspm_matches_reference_pipeline(tiny_dataset):
    ds = tiny_dataset
    k_s, t_s, beta = 2, 1.5, 0.7
    cfg = Config(Model="BSPM", K_s=k_s, T_s=t_s, idl_beta=beta)
    model = build_model(cfg, ds)
    q = model.b.shape[1]
    users = np.arange(16)
    got = np.asarray(model.score_users({}, jnp.asarray(users)))
    want = _oracle_scores(
        ds.train_edges, ds.num_user, ds.num_item, users, 2 * q, k_s, t_s, beta
    )
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_bspm_spectral_cache_reuses_factors_across_grid_combos(tiny_dataset):
    """Grid combos vary only K_s/T_s/idl_beta — the spectral build must be
    computed once and reused (and never aliased across datasets)."""
    from chaorec_tpu.models import bspm as bspm_mod

    ds = tiny_dataset
    bspm_mod._SPECTRAL_CACHE.clear()
    m1 = build_model(Config(Model="BSPM", K_s=2, T_s=1.5, idl_beta=0.7), ds)
    assert len(bspm_mod._SPECTRAL_CACHE) == 1
    m2 = build_model(Config(Model="BSPM", K_s=4, T_s=2.0, idl_beta=1.0), ds)
    assert m2.b is m1.b and m2.c is m1.c  # reused, not recomputed

    # A different interaction matrix must miss the cache.
    import dataclasses

    flipped = np.array(ds.train_edges)[:-2]
    ds2 = dataclasses.replace(ds, train_edges=flipped)
    m3 = build_model(Config(Model="BSPM", K_s=2, T_s=1.5, idl_beta=0.7), ds2)
    assert m3.b is not m1.b
