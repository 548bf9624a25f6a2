"""Offline U-U co-interaction graph generator (reference-compatible output).

Replaces ``dualgnn-gen-u-u-matrix.py``: instead of the O(U^2) Python double
loop over user pairs (:20-50 there), co-interaction counts are computed as
chunked ``B B^T`` matmuls on the accelerator (graphs/user_graph.py) and the
top-200 neighbors are saved in the same ``user_graph_dict.npy`` format:
``{user: [[neighbor ids...], [co-interaction counts...]]}``.

Usage: python scripts/gen_user_graph.py --data_path baby --data_root Data
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chaorec_tpu.data.loading import data_load  # noqa: E402
from chaorec_tpu.graphs.user_graph import build_user_cooccurrence  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default="baby")
    ap.add_argument("--data_root", default="Data")
    ap.add_argument("--topk", type=int, default=200)
    args = ap.parse_args()

    ds = data_load(args.data_path, args.data_root)
    idx, cnt, lens = build_user_cooccurrence(
        ds.train_edges, ds.num_user, ds.num_item, topk=args.topk
    )
    user_graph_dict = {
        u: [idx[u, : lens[u]].tolist(), cnt[u, : lens[u]].tolist()]
        for u in range(ds.num_user)
    }
    out = os.path.join(args.data_root, args.data_path, "user_graph_dict.npy")
    np.save(out, user_graph_dict, allow_pickle=True)
    print(f"saved {out}: {ds.num_user} users, "
          f"max neighbors {int(lens.max())}, min {int(lens.min())}")


if __name__ == "__main__":
    main()
