"""Offline hyperedge-sequence generator (reference-compatible output).

Replaces ``gen_hypergraph_u_i.py``: per train interaction it emits one
hyperedge per modality ``[user, <=uu_topk similar users, item,
<=ii_topk knn items]`` (global item ids), with the reference's randomized
neighbor counts (random.randint(1, topk) prefixes, :117-151) and
sorted-tuple dedup, saved as dtype=object numpy arrays named
``hyperedges_{visual,textual}_u{uu}_i{ii}.npy``. The knn item graphs use
cosine similarity with the diagonal at -inf (:41-47) and are cached as
``ii_{visual,textual}_{k}.pt``-equivalent ``.npy`` files. Similar users
come from ``user_graph_dict.npy`` when present (top-``uu_topk`` prefix,
short rows padded by resampling — dataload-style topk_sample, :14-38),
else from the on-the-fly co-occurrence builder.

Usage: python scripts/gen_hypergraph.py --data_path baby --data_root Data
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chaorec_tpu.data.loading import data_load  # noqa: E402
from chaorec_tpu.graphs.user_graph import (  # noqa: E402
    build_user_cooccurrence, topk_sample)


def knn_indices(feat: np.ndarray, k: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    f = jnp.asarray(np.asarray(feat, np.float32))
    f = f * jax.lax.rsqrt(jnp.sum(f * f, 1, keepdims=True) + 1e-12)
    n = f.shape[0]
    k = min(k, n - 1)
    out = []
    for s in range(0, n, 4096):
        sim = f[s:s + 4096] @ f.T
        rows = jnp.arange(s, min(s + 4096, n))
        sim = sim.at[jnp.arange(sim.shape[0]), rows].set(-jnp.inf)
        out.append(np.asarray(jax.lax.top_k(sim, k)[1]))
    return np.concatenate(out, 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default="baby")
    ap.add_argument("--data_root", default="Data")
    ap.add_argument("--uu_topk", type=int, default=10)
    ap.add_argument("--ii_topk", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    ds = data_load(args.data_path, args.data_root, has_v=True, has_t=True)
    dir_str = os.path.join(args.data_root, args.data_path)
    rs = np.random.default_rng(args.seed)

    # --- similar users
    ug_path = os.path.join(dir_str, "user_graph_dict.npy")
    if os.path.exists(ug_path):
        d = np.load(ug_path, allow_pickle=True).item()
        width = max((len(v[0]) for v in d.values()), default=0)
        idx = np.zeros((ds.num_user, width), np.int32)
        cnt = np.zeros((ds.num_user, width), np.float32)
        lens = np.zeros((ds.num_user,), np.int32)
        for u, (ii, cc) in d.items():
            lens[u] = len(ii)
            idx[u, :len(ii)] = ii
            cnt[u, :len(cc)] = cc
    else:
        idx, cnt, lens = build_user_cooccurrence(
            ds.train_edges, ds.num_user, ds.num_item, topk=args.uu_topk)
    uu, _ = topk_sample(idx, cnt, lens,
                        min(args.uu_topk, ds.num_user - 1), rs)

    # --- knn items per modality (cached)
    graphs = {}
    for mod, feat in (("visual", ds.v_feat), ("textual", ds.t_feat)):
        cache = os.path.join(dir_str, f"ii_{mod}_{args.ii_topk}.npy")
        if os.path.exists(cache):
            graphs[mod] = np.load(cache)
        else:
            graphs[mod] = knn_indices(feat, args.ii_topk)
            np.save(cache, graphs[mod])

    # --- hyperedges with randomized prefix lengths + dedup
    import random

    random.seed(args.seed)
    edges = ds.train_edges
    for mod in ("visual", "textual"):
        ii = graphs[mod]
        seen = set()
        out = []
        for u, item in edges:
            n_u = random.randint(1, max(args.uu_topk, 1))
            n_i = random.randint(1, max(args.ii_topk, 1))
            he = tuple(sorted(
                [int(u)] + uu[u, :n_u].tolist()
                + [int(item) + ds.num_user]
                + (ii[item, :n_i] + ds.num_user).tolist()))
            if he not in seen:
                seen.add(he)
                out.append(list(he))
        path = os.path.join(
            dir_str,
            f"hyperedges_{mod}_u{args.uu_topk}_i{args.ii_topk}.npy")
        np.save(path, np.array(out, dtype=object), allow_pickle=True)
        print(f"saved {path}: {len(out)} hyperedges "
              f"(from {len(edges)} interactions)")


if __name__ == "__main__":
    main()
