"""Bisect the Grade/AdaGCL TPU worker crash (sports/netfilx, r4).

Grade/sports and AdaGCL/netfilx kill the TPU worker ("kernel fault") on
the first dispatched epoch; Grade/beauty+clothing and every non-generator
model pass. This probe jits ONE component at a time on the failing
workload so the crash attributes to a subprogram. Run each component in
its own process (a worker crash poisons the client):

  for c in enc edge_prob gen_view loss1 bpr gen step eval; do
    timeout 1200 python scripts/probe_grade_crash.py --Model Grade \
        --data_path sports --data_root /root/reference/Data --component $c \
        || echo "component $c FAILED rc=$?"
  done

Exit 0 = component ran on device; nonzero/crash output = culprit.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from chaorec_tpu.config import (  # noqa: E402
    grid_combinations,
    load_yaml_config,
    parse_cli,
)
from chaorec_tpu.data.loading import data_load  # noqa: E402
from chaorec_tpu.data.sampling import (  # noqa: E402
    make_epoch_batches,
    sample_negatives,
)
from chaorec_tpu.models import build_model  # noqa: E402
from chaorec_tpu.models.base import Batch  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    comp = "step"
    if "--component" in argv:
        i = argv.index("--component")
        comp = argv[i + 1]
        del argv[i: i + 2]
    sys.argv[1:] = argv
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
    params = jax.device_put(model.init_params(rng))
    users, pos, weights, _ = make_epoch_batches(
        jax.random.PRNGKey(1), jnp.asarray(ds.train_edges), cfg.batch_size)
    history = jnp.asarray(ds.history.values)
    neg = sample_negatives(jax.random.PRNGKey(2), users[0], history,
                           ds.num_item, cfg.neg_candidates)
    batch = Batch(users[0], pos[0], neg, weights[0], jnp.int32(0), None)
    print(f"probe component={comp} model={cfg.Model} data={cfg.data_path} "
          f"E={ds.train_edges.shape[0]}", flush=True)

    # model is ALWAYS a jit argument (pytree), never a closure constant:
    # big buffers (v_feat on sports = 249 MB fp32) baked as constants
    # overflow the remote-compile tunnel (HTTP 413) before the device
    # ever sees the program.
    if comp == "enc":
        out = jax.jit(lambda m, p: m._encode(p, 1, "id"))(model, params)
    elif comp == "edge_prob":
        def f(m, p):
            x, _, _ = m._encode(p, 1, "id")
            return m._edge_prob(p, 1, x[m.src], x[m.dst])
        out = jax.jit(f)(model, params)
    elif comp == "gen_view":
        out = jax.jit(lambda m, p: m._generate_view(p, 1, "id"))(model, params)
    elif comp == "loss1":
        out = jax.jit(lambda m, p, b, r: jax.value_and_grad(m.loss_1)(p, b, r))(
            model, params, batch, rng)
    elif comp == "bpr":
        out = jax.jit(lambda m, p, b: jax.value_and_grad(m.bpr_reg_loss)(p, b))(
            model, params, batch)
    elif comp == "gen":
        out = jax.jit(lambda m, p, b, r: jax.value_and_grad(m.gen_loss)(p, b, r))(
            model, params, batch, rng)
    elif comp == "step":
        from chaorec_tpu.models.adagcl import generator_labels
        from chaorec_tpu.models.grade import grade_step

        opt = optax.adam(cfg.learning_rate)
        opt_gens = [
            optax.multi_transform(
                {"g": optax.adam(cfg.learning_rate),
                 "f": optax.set_to_zero()},
                generator_labels(model, f"g{i}_"))
            for i in (1, 2, 3)
        ]
        o = opt.init(params)
        gens = tuple(og.init(params) for og in opt_gens)
        out = jax.jit(
            lambda m, p, o, g, b, k1, k3: grade_step(
                m, opt, opt_gens, p, o, g, b, k1, k3)
        )(model, params, o, gens, batch, rng, jax.random.PRNGKey(5))
    elif comp.startswith("scan"):
        # epoch scan truncated to the first N batches (comp = "scanN"),
        # optionally restricted to a subset of the 3 loss steps via
        # PROBE_LOSSES=l1,bpr,gen. Binary-search N to find the batch
        # count where the worker dies, and ablate losses to attribute.
        from chaorec_tpu.models.adagcl import generator_labels

        n_batches = int(comp[4:]) if len(comp) > 4 else users.shape[0]
        losses_on = os.environ.get("PROBE_LOSSES", "l1,bpr,gen").split(",")
        opt = optax.adam(cfg.learning_rate)
        opt_gens = [
            optax.multi_transform(
                {"g": optax.adam(cfg.learning_rate),
                 "f": optax.set_to_zero()},
                generator_labels(model, f"g{i}_"))
            for i in (1, 2, 3)
        ]
        print(f"scan probe: n_batches={n_batches} losses={losses_on}",
              flush=True)

        def epoch(m, params, opts, rng, u_all, p_all, w_all, hist):
            o, o1, o2, o3 = opts

            def step(carry, xs):
                params, o, o1, o2, o3, rng = carry
                u, p, w = xs
                rng, k_neg, k1, k3 = jax.random.split(rng, 4)
                neg = sample_negatives(k_neg, u, hist, ds.num_item,
                                       cfg.neg_candidates)
                b = Batch(u, p, neg, w)
                total = jnp.float32(0)
                if "l1" in losses_on:
                    l1, g = jax.value_and_grad(m.loss_1)(params, b, k1)
                    upd, o = opt.update(g, o, params)
                    params = optax.apply_updates(params, upd)
                    total += l1
                if "bpr" in losses_on:
                    l2, g = jax.value_and_grad(m.bpr_reg_loss)(params, b)
                    upd, o = opt.update(g, o, params)
                    params = optax.apply_updates(params, upd)
                    total += l2
                if "gen" in losses_on:
                    l3, g = jax.value_and_grad(m.gen_loss)(params, b, k3)
                    upd, o1 = opt_gens[0].update(g, o1, params)
                    params = optax.apply_updates(params, upd)
                    upd, o2 = opt_gens[1].update(g, o2, params)
                    params = optax.apply_updates(params, upd)
                    upd, o3 = opt_gens[2].update(g, o3, params)
                    params = optax.apply_updates(params, upd)
                    total += l3
                return (params, o, o1, o2, o3, rng), total

            carry, losses = jax.lax.scan(
                step, (params, o, o1, o2, o3, rng), (u_all, p_all, w_all))
            return carry, jnp.sum(losses)

        opts = (opt.init(params),) + tuple(og.init(params) for og in opt_gens)
        off = int(os.environ.get("PROBE_OFFSET", "0"))
        u_all, p_all, w_all = (users[off:off + n_batches],
                               pos[off:off + n_batches],
                               weights[off:off + n_batches])
        # PROBE_CHUNK=C: dispatch the epoch as ceil(N/C) sequential
        # sub-scan programs (carry stays on device, no host sync between
        # chunks) — the workaround under test for the large-epoch worker
        # crash (per-program execution budget hypothesis).
        chunk = int(os.environ.get("PROBE_CHUNK", "0")) or n_batches
        print(f"scan window: [{off}, {off + u_all.shape[0]}) chunk={chunk}",
              flush=True)
        import time

        jf = jax.jit(epoch)
        rng7 = jax.random.PRNGKey(7)

        def run_once(rng_key):
            carry = (params, *opts, rng_key)
            total = jnp.float32(0)
            for s in range(0, n_batches, chunk):
                e = min(s + chunk, n_batches)
                carry, loss = jf(model, carry[0], tuple(carry[1:5]),
                                 carry[5], u_all[s:e], p_all[s:e],
                                 w_all[s:e], history)
                total = total + loss
            return carry[0], total

        t0 = time.perf_counter()
        new_params, loss = run_once(rng7)
        l0 = float(loss)  # real fetch (sync)
        t1 = time.perf_counter()
        print(f"call1 (compile+exec+fetch): {t1 - t0:.1f}s loss={l0:.3f}",
              flush=True)
        if os.environ.get("PROBE_TIME2"):
            t2 = time.perf_counter()
            _, loss = run_once(jax.random.PRNGKey(9))
            l1 = float(loss)
            t3 = time.perf_counter()
            print(f"call2 (exec+fetch): {t3 - t2:.1f}s loss={l1:.3f}",
                  flush=True)
        out = loss
    elif comp == "epoch":
        # the real trainer's whole-epoch jit, one call (the unit the
        # crashed runs dispatched)
        from chaorec_tpu.train.loop import Trainer

        trainer_cls = getattr(model, "trainer_cls", Trainer)
        tr = trainer_cls(model, ds, cfg)
        base = getattr(tr, "_base", tr)
        opt_state = base.init_opt_state(params)
        _, _, _, loss = base.train_epoch(params, opt_state,
                                         jax.random.PRNGKey(7), 0)
        out = loss
    elif comp == "epoch_eval":
        # the real run's co-residency: whole-epoch program and the fused
        # eval program dispatched back-to-back without an intervening
        # block (Trainer.run's eval_pipeline) — the unit that
        # distinguishes the crashed combo runs from the passing "epoch"
        # and "eval" components run in isolation.
        from chaorec_tpu.eval.metrics import gene_metrics
        from chaorec_tpu.eval.ranking import gene_ranklist
        from chaorec_tpu.train.loop import Trainer

        trainer_cls = getattr(model, "trainer_cls", Trainer)
        tr = trainer_cls(model, ds, cfg)
        base = getattr(tr, "_base", tr)
        opt_state = base.init_opt_state(params)
        new_params, _, _, loss = base.train_epoch(params, opt_state,
                                                  jax.random.PRNGKey(7), 0)
        fu, fi = jax.jit(lambda m, p: m.embeddings(p))(model, new_params)
        rank = gene_ranklist(fu, fi, history, ds.num_user)
        out = (loss, gene_metrics(ds, rank, [5, 10, 20], split="test"))
    elif comp == "epoch_eval_bisect":
        # epoch_eval crashes even fully serialized (probe3), so the
        # fault lives in ONE post-epoch stage. Hard host-sync after each
        # eval stage: the last "stage ... OK" line printed before the
        # worker dies attributes the fault.
        from chaorec_tpu.eval.metrics import gene_metrics
        from chaorec_tpu.eval.ranking import gene_ranklist
        from chaorec_tpu.train.loop import Trainer

        trainer_cls = getattr(model, "trainer_cls", Trainer)
        tr = trainer_cls(model, ds, cfg)
        base = getattr(tr, "_base", tr)
        opt_state = base.init_opt_state(params)
        new_params, _, _, loss = base.train_epoch(params, opt_state,
                                                  jax.random.PRNGKey(7), 0)
        print(f"stage epoch OK loss={float(loss):.3f}", flush=True)
        fu, fi = jax.jit(lambda m, p: m.embeddings(p))(model, new_params)
        print(f"stage embeddings OK fu00={float(fu[0, 0]):.5f}",
              flush=True)
        rank = gene_ranklist(fu, fi, history, ds.num_user)
        print(f"stage ranklist OK r00={int(rank[0, 0])}", flush=True)
        out = gene_metrics(ds, rank, [5, 10, 20], split="test")
        print("stage metrics OK", flush=True)
    elif comp == "run2":
        # the full Trainer.run driver for 2 epochs, checkpointing OFF —
        # isolates the orbax checkpoint manager from the crash.
        from chaorec_tpu.train.loop import Trainer

        cfg.num_epoch = 2
        cfg.checkpoint_dir = ""
        trainer_cls = getattr(model, "trainer_cls", Trainer)
        tr = trainer_cls(model, ds, cfg)
        out = tr.run()
    elif comp == "eval":
        from chaorec_tpu.eval.metrics import gene_metrics
        from chaorec_tpu.eval.ranking import gene_ranklist

        fu, fi = jax.jit(lambda m, p: m.embeddings(p))(model, params)
        rank = gene_ranklist(fu, fi, history, ds.num_user)
        out = gene_metrics(ds, rank, [5, 10, 20], split="test")
    else:
        sys.exit(f"unknown component {comp}")
    # REAL host fetch: block_until_ready does not actually block through
    # the device tunnel (probe rounds 1-3 reported false OKs — the
    # epoch program's crash only surfaces at a value fetch).
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    sig = float(sum(np.asarray(l).ravel()[0] for l in leaves))
    print(f"component {comp}: OK (sig={sig:.5e})", flush=True)


if __name__ == "__main__":
    main()
