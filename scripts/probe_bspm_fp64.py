"""BSPM fp32-vs-fp64 control on a user sample (VERDICT r4 weak #7).

BSPM's -0.4..-1.9% R@20 deltas vs the reference logs were ATTRIBUTED to
fp32 (TPU) vs fp64 (reference torch CPU odeint default dtype) numerics
without a demonstration. BSPM is training-free and scores users
independently, so the control doesn't need the full catalog: build the
model twice (CHAOREC_BSPM_DTYPE toggles every compute site), score the
SAME user sample under both dtypes on CPU, and compare per-sample R@20
plus top-50 overlap. If fp64 moves the sample metric toward the
reference by about the observed gap, the attribution is demonstrated;
if the two dtypes agree, it is refuted and the real cause is elsewhere.

Usage:
  JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python scripts/probe_bspm_fp64.py \
      [--data_path sports] [--sample 4000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(dtype_env, cfg, ds):
    """Mirror the BSPM builder (builders.py:_bspm, incl. the K_s-in-T_b
    reference quirk) with CHAOREC_BSPM_DTYPE toggling the compute dtype.
    The module keeps a single-entry spectral cache keyed on shape +
    checksum — both dtypes would alias, so clear it between builds."""
    import jax
    import jax.numpy as jnp

    import chaorec_tpu.models.bspm as bspm_mod
    from chaorec_tpu.graphs.norm_adj import build_norm_adj, node_degrees

    os.environ["CHAOREC_BSPM_DTYPE"] = dtype_env
    bspm_mod._SPECTRAL_CACHE.clear()
    g = build_norm_adj(ds.train_edges, ds.num_user, ds.num_item,
                       use_dense=True, eps=1e-7)
    _, di = node_degrees(ds.train_edges, ds.num_user, ds.num_item)
    return bspm_mod.BSPM(
        ds.num_user, ds.num_item, g.dense_r, jnp.asarray(di),
        cfg.K_s, cfg.T_s, cfg.K_b, cfg.K_s, cfg.idl_beta,
        jax.random.PRNGKey(cfg.seed + 11))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default="sports")
    ap.add_argument("--sample", type=int, default=4000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from chaorec_tpu.config import Config, grid_combinations, load_yaml_config
    from chaorec_tpu.data.loading import data_load

    cfg = Config(Model="BSPM", data_path=args.data_path,
                 data_root="/root/reference/Data")
    first = next(iter(grid_combinations(load_yaml_config("BSPM"))), {})
    for k, v in first.items():
        if hasattr(cfg, k):
            setattr(cfg, k, type(getattr(cfg, k))(v))
    ds = data_load(cfg.data_path, cfg.data_root)
    print(f"combo: {first}", flush=True)

    rs = np.random.default_rng(0)
    # sample test-split rows (test_users aligns with test_pos rows)
    rows = rs.choice(ds.test_users.shape[0],
                     size=min(args.sample, ds.test_users.shape[0]),
                     replace=False)
    rows = np.sort(rows)
    sample_users = np.asarray(ds.test_users)[rows]
    sample_j = jnp.asarray(sample_users)
    truth_vals = np.asarray(ds.test_pos.values)[rows]
    truth_lens = np.asarray(ds.test_pos.lengths)[rows]

    def r20(model):
        scores = np.array(model.score_users({}, sample_j),
                          dtype=np.float64, copy=True)
        # reference masking semantics: history -> 1e-6, then top-k
        hist = np.asarray(ds.history.values)[sample_users]
        for r in range(scores.shape[0]):
            h = hist[r]
            h = h[h < ds.num_item]
            scores[r, h] = 1e-6
        top = np.argsort(-scores, axis=1)[:, :20]
        recalls = []
        for r in range(rows.size):
            n = int(truth_lens[r])
            if n == 0:
                continue
            truth = set(truth_vals[r, :n].tolist())
            hit = len(truth.intersection(top[r].tolist()))
            recalls.append(hit / n)
        return float(np.mean(recalls)), top

    m32 = build("float32", cfg, ds)
    r32, top32 = r20(m32)
    print(f"fp32 sample R@20: {r32:.5f}", flush=True)
    del m32
    m64 = build("float64", cfg, ds)
    r64, top64 = r20(m64)
    print(f"fp64 sample R@20: {r64:.5f}", flush=True)
    overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 20.0
                       for a, b in zip(top32, top64)])
    print(f"top-20 overlap fp32 vs fp64: {overlap:.4f}", flush=True)
    print(f"delta (fp64-fp32)/fp32: {(r64 - r32) / max(r32, 1e-9):+.3%}",
          flush=True)


if __name__ == "__main__":
    main()
