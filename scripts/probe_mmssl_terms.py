"""Print MMSSL's individual loss terms for the first batch at init.

The MMSSL xfw trajectory still lags the reference (loss +70% at ep6,
testR@20 -6.8%) while all sibling models match to ~0.1% loss — so one
term diverges. This probes OUR side; scripts/probe_mmssl_ref_terms.py
prints the same decomposition from the reference's torch code on CPU.
Magnitudes (not exact values — inits differ by RNG stream) localize
the divergent term.

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_mmssl_terms.py [--data_path baby]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from chaorec_tpu.config import grid_combinations, load_yaml_config, parse_cli
from chaorec_tpu.data.loading import data_load
from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
from chaorec_tpu.models import build_model
from chaorec_tpu.models.base import Batch
from chaorec_tpu.ops.losses import masked_mean
from chaorec_tpu.models.mmssl import full_catalog_cl


def main() -> None:
    sys.argv = [sys.argv[0], "--Model", "MMSSL", "--data_path", "baby",
                "--data_root", "/root/reference/Data"] + sys.argv[1:]
    cfg = parse_cli()
    yaml_cfg = load_yaml_config(cfg.Model)
    first = next(iter(grid_combinations(yaml_cfg)), {})
    for k, v in first.items():
        if hasattr(cfg, k):
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if cur is not None else v)
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    model = build_model(cfg, ds)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    state = model.init_state(jax.random.PRNGKey(1))
    users, pos, weights, _ = make_epoch_batches(
        jax.random.PRNGKey(2), jnp.asarray(ds.train_edges), cfg.batch_size)
    history = jnp.asarray(ds.history.values)
    neg = sample_negatives(jax.random.PRNGKey(3), users[0], history,
                           ds.num_item, cfg.neg_candidates)
    batch = Batch(users[0], pos[0], neg, weights[0], jnp.int32(0), None)
    k_f, k_d = jax.random.split(jax.random.PRNGKey(4))

    @jax.jit
    def terms(model, params, state, batch, k_f, k_d, k_ld):
        out = model.forward(params, state, k_f)
        u_g, i_g, img_item, txt_item, img_user, txt_user, img_uid, txt_uid = out
        bu, bp, bn, w = (batch.users, batch.pos_items, batch.neg_items,
                         batch.weights)
        u, p_, n_ = u_g[bu], i_g[bp], i_g[bn]
        mf = -masked_mean(
            jax.nn.log_sigmoid(jnp.sum(u * p_, 1) - jnp.sum(u * n_, 1)), w)
        emb = model.reg_weight * 0.5 * (
            jnp.sum(u ** 2 * w[:, None]) + jnp.sum(p_ ** 2 * w[:, None])
            + jnp.sum(n_ ** 2 * w[:, None])) / 1024.0
        feat_reg = model.feat_reg_decay * 0.5 * (
            jnp.sum(img_item ** 2) + jnp.sum(txt_item ** 2)
            + jnp.sum(img_user ** 2) + jnp.sum(txt_user ** 2)) / model.num_item
        img_sim = model._u_sim(bu, img_user, img_item)
        txt_sim = model._u_sim(bu, txt_user, txt_item)
        cl = (full_catalog_cl(img_uid[bu], u_g[bu], model.tau)
              + full_catalog_cl(txt_uid[bu], u_g[bu], model.tau))
        g_inputf = jnp.concatenate([img_sim, txt_sim], 0)
        g_lossf = -jnp.mean(model.discriminate(params, g_inputf, k_d))
        loss_d = model.loss_d(params, state, batch, k_ld)
        stats = {n: (jnp.sqrt(jnp.mean(t ** 2)), jnp.max(jnp.abs(t)))
                 for n, t in [("u_g", u_g), ("i_g", i_g),
                              ("img_item", img_item), ("img_user", img_user),
                              ("img_uid", img_uid)]}
        return mf, emb, feat_reg, cl, g_lossf, loss_d, stats

    mf, emb, feat_reg, cl, g_lossf, loss_d, stats = terms(
        model, params, state, batch, k_f, k_d, jax.random.PRNGKey(5))

    print(f"batch_size_actual={batch.users.shape[0]} "
          f"num_batches={users.shape[0]}")
    for name, v in [
        ("mf", mf), ("emb", emb), ("feat_reg", feat_reg),
        ("cl(raw)", cl), ("cl*rate", model.cl_rate * cl),
        ("g_lossf(raw)", g_lossf), ("g_lossf*G_rate", model.G_rate * g_lossf),
        ("loss_D", loss_d),
    ]:
        print(f"  {name:<16} {float(v):+.6e}")
    total = (mf + emb + feat_reg + model.cl_rate * cl
             + model.G_rate * g_lossf)
    print(f"  {'batch_loss':<16} {float(total):+.6e}")
    print(f"  {'loss_D+batch':<16} {float(total + loss_d):+.6e}")
    print(f"  rates: cl_rate={model.cl_rate} G_rate={model.G_rate} "
          f"reg_weight={model.reg_weight} feat_reg_decay={model.feat_reg_decay} "
          f"tau={model.tau}")
    # magnitude stats of the fused embeddings (catches scale bugs in
    # forward itself, independent of loss bookkeeping)
    for name, (rms, mx) in stats.items():
        print(f"  |{name}|: rms={float(rms):.4e} max={float(mx):.4e}")


if __name__ == "__main__":
    main()
