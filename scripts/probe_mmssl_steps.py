"""Trace MMSSL's per-batch loss_D decay through real optimizer steps.

The xfw pair still diverges at the trajectory level (loss +63% at ep6)
while every batch-0 term matches the reference to ~3% — so the gap is
in the UPDATE dynamics, not the loss computation. The reference probe
(parity_logs/mmssl_terms_ref.txt) shows loss_D per batch:
  1.674e6 -> 2.603e5 -> 2.064e5   (6.4x drop after one D step)
This prints the same trajectory from OUR trainer's exact step function
(D Adam(3e-4,0.5,0.9) step, then AdamW(all params) step, fresh states).

Usage: JAX_PLATFORMS=cpu python scripts/probe_mmssl_steps.py [--n 6]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from chaorec_tpu.config import grid_combinations, load_yaml_config, parse_cli
from chaorec_tpu.data.loading import data_load
from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
from chaorec_tpu.models import build_model
from chaorec_tpu.models.base import Batch


def main() -> None:
    n_steps = 6
    argv = sys.argv[1:]
    if "--n" in argv:
        i = argv.index("--n")
        n_steps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sys.argv = [sys.argv[0], "--Model", "MMSSL", "--data_path", "baby",
                "--data_root", "/root/reference/Data"] + argv
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

    d_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "d" if str(path[0].key).startswith("D_") else "frozen",
        params)
    opt_d = optax.multi_transform(
        {"d": optax.adam(3e-4, b1=0.5, b2=0.9),
         "frozen": optax.set_to_zero()}, d_labels)
    opt_main = optax.adamw(cfg.learning_rate, weight_decay=0.01)
    od = opt_d.init(params)
    om = opt_main.init(params)

    @jax.jit
    def step(model, params, od, om, state, batch, rng):
        rng, k_d, k_g = jax.random.split(rng, 3)
        loss_d, g_d = jax.value_and_grad(model.loss_d)(
            params, state, batch, k_d)
        upd, od = opt_d.update(g_d, od, params)
        params = optax.apply_updates(params, upd)
        (loss, state), g = jax.value_and_grad(
            model.loss_stateful, has_aux=True)(params, state, batch, k_g)
        upd, om = opt_main.update(g, om, params)
        params = optax.apply_updates(params, upd)
        # D-grad norm diagnostics: how hard is the D being pushed?
        dn = {k: jnp.sqrt(jnp.sum(v ** 2)) for k, v in g_d.items()
              if k.startswith("D_")}
        return params, od, om, state, rng, loss_d, loss, dn

    rng = jax.random.PRNGKey(10)
    for i in range(min(n_steps, users.shape[0])):
        rng, k_neg = jax.random.split(rng)
        neg = sample_negatives(k_neg, users[i], history, ds.num_item,
                               cfg.neg_candidates)
        batch = Batch(users[i], pos[i], neg, weights[i], jnp.int32(i), None)
        params, od, om, state, rng, loss_d, loss, dn = step(
            model, params, od, om, state, batch, rng)
        gn = " ".join(f"{k}={float(v):.3e}" for k, v in sorted(dn.items()))
        print(f"OURS batch {i}: loss_D={float(loss_d):+.6e} "
              f"batch_loss={float(loss):+.6e}")
        print(f"  d_grad_norms: {gn}")


if __name__ == "__main__":
    main()
