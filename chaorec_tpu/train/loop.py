"""Training runtime: whole-epoch jitted steps, eval, early stopping.

Replaces the reference's ``train_and_evaluate.py``: its per-batch Python
loop with host-side DataLoader negative sampling (train_and_evaluate.py:39-48)
becomes **one jitted ``lax.scan`` over the epoch** — edge shuffling,
negative sampling, forward/backward, and the optimizer update all stay on
device; a single scalar (epoch loss) returns to the host per epoch.

Behavioral parity:
- epoch loss = sum of per-batch losses (train_and_evaluate.py:30,48),
  each batch loss a (masked) mean over the batch;
- early stopping on **test** Recall@max(topk) with patience 20
  (train_and_evaluate.py:529,673-677; utils.py:57-79 — an equal score
  counts as an improvement);
- per-epoch log lines: ``Epoch {n}, Loss: {x:.5f}`` then Validation/Test
  metric tables (train_and_evaluate.py:571,661-671);
- best metrics = test metrics at the best epoch (early_stopping.best_metrics).

Beyond the reference (capability adds): optional orbax checkpointing of
params/opt-state and per-epoch wall-clock timing logged as first-class
metrics.
"""

from __future__ import annotations

import functools
import logging
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chaorec_tpu.config import Config
from chaorec_tpu.data.loading import RecDataset
from chaorec_tpu.data.sampling import make_epoch_batches, sample_negatives
from chaorec_tpu.eval.metrics import gene_metrics
from chaorec_tpu.eval.ranking import gene_ranklist
from chaorec_tpu.models.base import Batch, RecModel
from chaorec_tpu.ops.adam_tail import tree_zero_grad_adam_tail

# torch.optim.Adam defaults (main.py:397); shared by the injected main
# optimizer (_shared_inject_adam) and the rebuild-gated manual path.
_ADAM_B1 = 0.9
_ADAM_B2 = 0.999
_ADAM_EPS = 1e-8


class EarlyStopping:
    """Parity with utils.EarlyStopping (utils.py:57-79)."""

    def __init__(self, patience: int = 20, verbose: bool = True):
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.best_metrics = None

    def __call__(self, score: float, metrics) -> None:
        if self.best_score is None:
            self.best_score = score
            self.best_metrics = metrics
        elif score < self.best_score:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.best_metrics = metrics
            self.counter = 0


def _log_metric_tables(val_metrics, test_metrics) -> None:
    logging.info("Validation Metrics:")
    for k, metrics in val_metrics.items():
        metrics_strs = [f"{metric}: {value:.5f}" for metric, value in metrics.items()]
        logging.info(f"{k}: {' | '.join(metrics_strs)}")
    logging.info("Test Metrics:")
    for k, metrics in test_metrics.items():
        metrics_strs = [f"{metric}: {value:.5f}" for metric, value in metrics.items()]
        logging.info(f"{k}: {' | '.join(metrics_strs)}")


@functools.lru_cache(maxsize=None)
def _shared_inject_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8) -> optax.GradientTransformation:
    """One lr-AGNOSTIC Adam instance: the learning rate is an opt_state
    leaf (inject_hyperparams) written in by ``Trainer.init_opt_state``,
    so grid combos differing only in learning_rate share the optimizer
    identity, the jitted epoch function, the trace, AND the compile.
    The construction-time placeholder is NaN — if any code path ever
    initializes state without the lr fixup, training diverges loudly on
    step one instead of silently running at a wrong rate. Hyperparams
    stay python floats so every ``init`` materializes FRESH state
    buffers — a captured jnp scalar would be donated away by the first
    epoch (donate_argnums) and poison every later ``init``."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=float("nan"), b1=b1, b2=b2, eps=eps)


def _set_injected_lr(opt_state, lr: float):
    """Write the real learning rate into every injected-hyperparams
    ``learning_rate`` leaf, wherever it sits in the state pytree (family
    trainers wrap the shared Adam in multi_transform, nesting the
    InjectHyperparams state)."""

    def fix(path, leaf):
        if any(getattr(p, "key", None) == "learning_rate" for p in path):
            return jnp.asarray(lr, jnp.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, opt_state)


def dispatch_chunked(jit_chunk, model, params, opts, rng, batches, history,
                     max_batches: int):
    """Dispatch one epoch as ceil(N / max_batches) sequential sub-scan
    programs (carry stays on device; losses summed on device).

    Why this exists: the TPU worker enforces a per-program execution
    budget — Grade/sports (155 batches) and AdaGCL/netfilx (254) crash
    the worker at full epoch length while 78-batch prefixes of the
    IDENTICAL step program pass (parity_logs/grade_crash_probe5.txt).
    Chunking bounds each program's runtime at the cost of one tunnel
    round trip (~35 ms) per extra dispatch and at most one extra
    compile (the remainder chunk's shape). ``max_batches`` <= 0 keeps
    the whole epoch in one program; batch semantics are bit-identical
    either way (same scan, same rng threading, sliced inputs)."""
    users, pos, weights = batches
    n = users.shape[0]
    c = max_batches if 0 < max_batches < n else n
    total = None
    s = 0
    while s < n:
        e = min(s + c, n)
        params, opts, rng, loss = jit_chunk(
            model, params, opts, rng, users[s:e], pos[s:e], weights[s:e],
            history)
        total = loss if total is None else total + loss
        s = e
    return params, opts, rng, total


def apply_relaxed_precision(model, params, cfg):
    """--relaxed_precision bf16: bf16 STORAGE for the row-sparse feature
    tables + their Adam moments (init_opt_state's zeros_like inherits
    the dtype); per-step math stays fp32 (ops/indexed_adam.py). ~2x less
    HBM traffic on the dominant (p, m, v) table sweep; the quality delta
    is measured on the xfw oracle, not assumed."""
    if getattr(cfg, "relaxed_precision", "") == "bf16" and model.table_params:
        for n in model.table_params:
            params[n] = params[n].astype(jnp.bfloat16)
        logging.info("relaxed_precision=bf16: tables %s stored bf16",
                     list(model.table_params))
    return params


def _epoch_lr_key(model, cfg) -> float:
    """The learning rate enters the compiled epoch as a constant ONLY
    for row-sparse-table models (the fused row-Adam takes it as a python
    float). For everything else the lr lives in opt_state
    (inject_hyperparams), so keying the epoch cache on it would fragment
    one compile per lr grid point — return a fixed 0.0 instead."""
    return float(cfg.learning_rate) if model.table_params else 0.0


@functools.lru_cache(maxsize=64)
def _jitted_epoch(optimizer, batch_size: int, neg_candidates: int,
                  table_lr: float):
    """The jitted whole-epoch scan, memoized at module level so grid
    combos in one process share BOTH the python function identity (jit
    cache hits skip retracing entirely) and — via the model-pytree
    traced hyperparameters and the opt_state-resident learning rate —
    the compiled XLA program. All per-model branch decisions (stateful,
    row-sparse tables, user-rows mode, MCLN's interest items) read the
    model's STATIC pytree attributes at trace time, so one factory
    serves every model; the jit cache distinguishes model structures by
    treedef."""
    from chaorec_tpu.ops.indexed_adam import (
        table_adam_update as row_adam_update,
    )

    def epoch(model, params, opt_state, mstate, rng, edges, history):
        stateful = model.stateful
        table_names = tuple(model.table_params)
        user_rows = getattr(model, "trainer_mode", "bpr") == "user_rows"
        num_item = model.num_item
        rng, shuffle_rng = jax.random.split(rng)
        users, pos, weights, _ = make_epoch_batches(
            shuffle_rng, edges, batch_size
        )

        def make_step(frozen_mstate=None):
            # frozen_mstate is not None: rebuild-once models
            # (frozen_state_epoch, LATTICE/MICRO) run batches 1..N-1
            # with the carried graph as a scan INVARIANT — carrying the
            # (often hundreds-of-MB dense) graph state through the scan
            # forces XLA to copy it every iteration (measured: ~6
            # (I, I)-sized copies/converts per step on microlens,
            # parity_logs/LATTICE_microlens.profile_r4.txt).
            frozen = frozen_mstate is not None

            def step(carry, xs):
                if frozen:
                    params, opt_state, rng = carry
                    mstate = frozen_mstate
                else:
                    params, opt_state, mstate, rng = carry
                u, p, w, idx = xs
                rng, neg_rng, int_rng, loss_rng = jax.random.split(rng, 4)
                if user_rows:
                    neg = p
                else:
                    neg = sample_negatives(
                        neg_rng, u, history, num_item, neg_candidates
                    )
                int_items = None
                if getattr(model, "needs_int_items", False):
                    int_items = sample_negatives(
                        int_rng, u, history, num_item, neg_candidates
                    )
                batch = Batch(u, p, neg, w, idx, int_items)
                if table_names:
                    # Row-sparse tables: gradients only for the gathered
                    # rows (the dense table gradient never exists), exact
                    # row-sparse Adam for the table update.
                    adam_state, table_state, count = opt_state
                    dense = {k: v for k, v in params.items()
                             if k not in table_names}
                    rows = model.table_rows(batch)
                    gathered = {n: params[n][rows[n]] for n in table_names}
                    loss, (g_dense, g_rows) = jax.value_and_grad(
                        model.loss_tables, argnums=(0, 1)
                    )(dense, gathered, batch, loss_rng)
                    updates, adam_state = optimizer.update(
                        g_dense, adam_state, dense)
                    dense = optax.apply_updates(dense, updates)
                    count = count + 1
                    new_tables = {}
                    new_tstate = {}
                    for n in table_names:
                        new_tables[n], new_tstate[n] = row_adam_update(
                            params[n], table_state[n], rows[n], g_rows[n],
                            count, table_lr)
                    params = {**dense, **new_tables}
                    opt_state = (adam_state, new_tstate, count)
                elif stateful:
                    (loss, mstate), grads = jax.value_and_grad(
                        model.loss_stateful, has_aux=True
                    )(params, mstate, batch, loss_rng)
                    e0 = tuple(model.epoch0_params)
                    if e0:
                        # Rebuild-gated subtree: the real gradient exists
                        # only on batch 0 (the carried graph is detached
                        # elsewhere), but the reference's torch 1.11 Adam
                        # (zero_grad(set_to_none=False), main.py:397) keeps
                        # stepping these params with g = 0 on every later
                        # batch — momentum-decay drift plus a per-batch
                        # step-count increment. We apply the real update
                        # here and the EXACT closed-form zero-grad tail
                        # once after the scan (ops/adam_tail.py); the gated
                        # values are never read off batch 0 (carried state
                        # is stop_gradient'd), so deferring the tail inside
                        # the epoch is equivalent.
                        main_state, (gmu, gnu, gcount, glr) = opt_state
                        p_main = {k: v for k, v in params.items()
                                  if k not in e0}
                        g_main = {k: v for k, v in grads.items()
                                  if k not in e0}
                        updates, main_state = optimizer.update(
                            g_main, main_state, p_main)
                        p_main = optax.apply_updates(p_main, updates)
                        p_gate = {k: params[k] for k in e0}
                        # torch per-param `step` counts EVERY batch (the
                        # zeroed grad is not None), not just rebuilds.
                        gcount = gcount + 1

                        def _gate_apply(args):
                            p_g, mu, nu = args
                            t = gcount.astype(jnp.float32)
                            out_p, out_mu, out_nu = {}, {}, {}
                            for k in e0:
                                g = grads[k]
                                m = _ADAM_B1 * mu[k] + (1 - _ADAM_B1) * g
                                v = _ADAM_B2 * nu[k] + (1 - _ADAM_B2) * g * g
                                mhat = m / (1 - _ADAM_B1 ** t)
                                vhat = v / (1 - _ADAM_B2 ** t)
                                out_p[k] = p_g[k] - glr * mhat / (
                                    jnp.sqrt(vhat) + _ADAM_EPS)
                                out_mu[k], out_nu[k] = m, v
                            return out_p, out_mu, out_nu

                        if frozen:
                            # idx >= 1 always here: the gate never fires
                            # (the closed-form tail covers these steps)
                            pass
                        else:
                            p_gate, gmu, gnu = jax.lax.cond(
                                idx == 0, _gate_apply, lambda a: a,
                                (p_gate, gmu, gnu))
                        params = {**p_main, **p_gate}
                        opt_state = (main_state, (gmu, gnu, gcount, glr))
                    else:
                        updates, opt_state = optimizer.update(
                            grads, opt_state, params)
                        params = optax.apply_updates(params, updates)
                else:
                    loss, grads = jax.value_and_grad(model.loss)(
                        params, batch, loss_rng
                    )
                    updates, opt_state = optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                if frozen:
                    return (params, opt_state, rng), loss
                return (params, opt_state, mstate, rng), loss

            return step

        n_batches = users.shape[0]
        if stateful and getattr(model, "frozen_state_epoch", False) \
                and n_batches > 1 and not table_names:
            # batch 0 (the rebuild step) runs OUTSIDE the scan — same
            # math and the same per-batch RNG-split sequence as running
            # it as the scan's first iteration — then the remaining
            # batches scan with the rebuilt graph as an invariant.
            carry0 = (params, opt_state, mstate, rng)
            (params, opt_state, mstate, rng), loss0 = make_step()(
                carry0,
                (users[0], pos[0], weights[0], jnp.zeros((), jnp.int32)),
            )
            (params, opt_state, rng), losses = jax.lax.scan(
                make_step(frozen_mstate=mstate),
                (params, opt_state, rng),
                (users[1:], pos[1:], weights[1:],
                 jnp.arange(1, n_batches, dtype=jnp.int32)),
            )
            losses = jnp.concatenate([loss0[None], losses])
        else:
            (params, opt_state, mstate, rng), losses = jax.lax.scan(
                make_step(), (params, opt_state, mstate, rng),
                (users, pos, weights,
                 jnp.arange(n_batches, dtype=jnp.int32)),
            )
        e0 = tuple(model.epoch0_params) if stateful else ()
        if e0 and not table_names:
            # The n_batches-1 zero-gradient Adam updates torch 1.11
            # applies to the gated subtree (set_to_none=False), as one
            # fused closed-form pass instead of a full HBM sweep of the
            # feature tables per batch (ops/adam_tail.py).
            main_state, (gmu, gnu, gcount, glr) = opt_state
            n_tail = users.shape[0] - 1
            p_gate = {k: params[k] for k in e0}
            p_gate, gmu, gnu = tree_zero_grad_adam_tail(
                p_gate, gmu, gnu, gcount - n_tail, n_tail, glr,
                _ADAM_B1, _ADAM_B2, _ADAM_EPS)
            params = {**params, **p_gate}
            opt_state = (main_state, (gmu, gnu, gcount, glr))
        return params, opt_state, mstate, rng, jnp.sum(losses)

    return jax.jit(epoch, donate_argnums=(1, 2))


class Trainer:
    """Standard BPR-style trainer; special families plug in custom epochs."""

    def __init__(self, model: RecModel, dataset: RecDataset, cfg: Config,
                 optimizer: Optional[optax.GradientTransformation] = None):
        self.model = model
        self.dataset = dataset
        self.cfg = cfg
        self.optimizer = optimizer or self.make_optimizer()
        self.edges = jnp.asarray(dataset.train_edges)
        self.history = jnp.asarray(dataset.history.values)
        # Dense (U, I) uint8 history indicator for eval masking: the
        # elementwise select fuses into the scoring matmul; the scatter
        # fallback lowers to a 3 GiB/s sort+scatter (see eval/ranking.py).
        # Gated on memory (uint8 bytes == U*I, cfg seen_mask_max_bytes) and
        # built lazily on the first evaluate so training-only phases never
        # hold the (up to ~700 MB on real datasets) buffer in HBM.
        self._seen_mask_cache = None
        self._epoch_fn = None
        self.model_state = model.init_state(jax.random.PRNGKey(cfg.seed + 1))
        # Model is a pytree argument, not a closure: keeps graph buffers out
        # of the lowered HLO (see RecModel.__init_subclass__).
        if model.stateful:
            self._embeddings_fn = jax.jit(
                lambda m, p, s: m.embeddings_stateful(p, s)
            )
        else:
            self._embeddings_fn = jax.jit(lambda m, p, s: m.embeddings(p))

    @property
    def _seen_mask(self):
        """Lazy dense seen-mask; ``None`` when U*I exceeds the byte cap."""
        if self._seen_mask_cache is None:
            ds = self.dataset
            cap = int(self.cfg.get("seen_mask_max_bytes", 2_000_000_000))
            if ds.num_user * ds.num_item > cap:
                return None
            # built from the padded history table (NOT train_edges) so the
            # dense mask marks exactly what the scatter path masks — the
            # user_item_dict.npy contents where that file exists
            hv, hl = ds.history.values, ds.history.lengths
            valid = np.arange(hv.shape[1])[None, :] < hl[:, None]
            rows = np.broadcast_to(
                np.arange(ds.num_user)[:, None], hv.shape)[valid]
            seen = np.zeros((ds.num_user, ds.num_item), np.uint8)
            seen[rows, hv[valid]] = 1
            self._seen_mask_cache = jnp.asarray(seen)
        return self._seen_mask_cache

    def make_optimizer(self) -> optax.GradientTransformation:
        """Adam with torch defaults (main.py:397).

        The learning rate rides the opt_state as a traced leaf
        (``optax.inject_hyperparams``) instead of a baked HLO constant,
        so YAML grid combos that differ only in learning_rate reuse one
        compiled epoch program (same math — inject_hyperparams only
        moves where the scalar lives). Memoized: same-hyperparameter
        Trainers (grid combos in one process) share the instance, which
        keeps the jitted epoch's identity stable (see _jitted_epoch)."""
        return _shared_inject_adam()

    def init_opt_state(self, params):
        """Optimizer state; composite when the model declares row-sparse
        table params: (adam_state_over_dense, {table: (m, v)}, count).
        The real learning rate is written into the injected-hyperparams
        leaves here (the shared optimizer is constructed lr-agnostic)."""
        lr = float(self.cfg.learning_rate)
        table_names = tuple(self.model.table_params)
        e0 = tuple(self.model.epoch0_params)
        if e0 and table_names:
            raise ValueError(
                f"{self.model.name}: table_params and epoch0_params are "
                "mutually exclusive (the row-sparse path has no "
                "rebuild-gated schema)")
        if e0:
            # (main_state, (mu, nu, torch_step_count, lr)) pair
            # mirroring _jitted_epoch's rebuild-gated split: real Adam
            # update on each epoch's batch 0 plus the closed-form
            # zero-grad tail (torch 1.11 set_to_none=False semantics).
            main = {k: v for k, v in params.items() if k not in e0}
            return (_set_injected_lr(self.optimizer.init(main), lr),
                    ({k: jnp.zeros_like(params[k]) for k in e0},
                     {k: jnp.zeros_like(params[k]) for k in e0},
                     jnp.zeros((), jnp.int32),
                     jnp.asarray(lr, jnp.float32)))
        if not table_names:
            return _set_injected_lr(self.optimizer.init(params), lr)
        from chaorec_tpu.ops.indexed_adam import init_table_state

        dense = {k: v for k, v in params.items() if k not in table_names}
        return (
            _set_injected_lr(self.optimizer.init(dense), lr),
            {n: init_table_state(params[n]) for n in table_names},
            jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _build_epoch_fn(self) -> Callable:
        cfg = self.cfg
        # "user_rows" models (VAE/diffusion) iterate shuffled users; the
        # reference feeds them dense rows via DiffusionData loaders
        # (main.py:202-218) instead of BPR triples.
        if getattr(self.model, "trainer_mode", "bpr") == "user_rows":
            n_u = self.dataset.num_user
            self.edges = jnp.stack(
                [jnp.arange(n_u, dtype=jnp.int32),
                 jnp.zeros((n_u,), jnp.int32)], axis=1,
            )
        jitted = _jitted_epoch(self.optimizer, int(cfg.batch_size),
                               int(cfg.neg_candidates),
                               _epoch_lr_key(self.model, cfg))
        return lambda params, opt_state, rng: jitted(
            self.model, params, opt_state, self.model_state, rng,
            self.edges, self.history,
        )

    def train_epoch(self, params, opt_state, rng, epoch: int):
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        params, opt_state, self.model_state, rng, loss = self._epoch_fn(
            params, opt_state, rng
        )
        return params, opt_state, rng, loss

    # ------------------------------------------------------------------
    def evaluate_async(self, params, extra_scalar=None):
        """Dispatch ranking + metric computation; defer the blocking fetch.

        Returns ``(rank_list, resolve)``: ``resolve()`` performs the single
        device->host transfer and returns ``(val, test[, extra_float])``.
        Deferring the resolve lets the run loop overlap the fetch round
        trip with the NEXT epoch's device work (one-epoch-deep pipeline)."""
        if self.model.rank_mode == "scores":
            # per-eval-pass redraws (LightGT's eval subsequences mirror
            # the reference EvalDataset reshuffle, dataload.py:124-145)
            if hasattr(self.model, "resample_eval"):
                self.model.resample_eval()
            rank_list = self._rank_from_scores(params)
        else:
            user_emb, item_emb = self._embeddings_fn(
                self.model, params, self.model_state
            )
            rank_list = gene_ranklist(
                user_emb,
                item_emb,
                self.history,
                self.dataset.num_user,
                topk=self.cfg.rank_topk,
                user_chunk=self.cfg.eval_user_chunk,
                seen_mask=self._seen_mask,  # lazy property below
            )
        from chaorec_tpu.eval.metrics import gene_metrics_pair_async

        _, resolve = gene_metrics_pair_async(
            self.dataset, rank_list, list(self.cfg.topk),
            extra_scalar=extra_scalar)
        return rank_list, resolve

    def evaluate(self, params, extra_scalar=None):
        """(val, test, rank_list[, extra_scalar_as_float]).

        ``extra_scalar`` piggybacks on the single metrics fetch — over the
        remote TPU link one round trip per epoch instead of two."""
        rank_list, resolve = self.evaluate_async(params, extra_scalar)
        out = resolve()
        if extra_scalar is not None:
            val_metrics, test_metrics, scalar = out
            return val_metrics, test_metrics, rank_list, scalar
        val_metrics, test_metrics = out
        return val_metrics, test_metrics, rank_list

    def _rank_from_scores(self, params) -> jnp.ndarray:
        """Chunked full-catalog ranking for score-mode models."""
        from chaorec_tpu.eval.ranking import mask_and_topk, mask_and_topk_dense

        if not hasattr(self, "_score_fn"):
            if self.model.stateful and hasattr(self.model, "score_users_stateful"):
                self._score_fn = jax.jit(
                    lambda m, p, s, ids: m.score_users_stateful(p, s, ids)
                )
                self._score_takes_state = True
            else:
                self._score_fn = jax.jit(
                    lambda m, p, s, ids: m.score_users(p, ids)
                )
                self._score_takes_state = False
        n = self.dataset.num_user
        chunk = self.cfg.eval_user_chunk
        topk = min(self.cfg.rank_topk, self.dataset.num_item)
        mask_value = float(getattr(self.model, "mask_value", 1e-6))
        outs = []
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            ids = jnp.arange(start, end, dtype=jnp.int32)
            scores = self._score_fn(self.model, params, self.model_state, ids)
            if self._seen_mask is not None:
                outs.append(
                    mask_and_topk_dense(scores, self._seen_mask[start:end],
                                        topk, n, mask_value)
                )
            else:
                outs.append(
                    mask_and_topk(scores, self.history[start:end], topk, n,
                                  mask_value)
                )
        return jnp.concatenate(outs, axis=0)

    # ------------------------------------------------------------------
    def run(self) -> Dict:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        params = apply_relaxed_precision(
            self.model, self.model.init_params(init_rng), cfg)
        if cfg.mesh_shape:
            # Mesh training (--mesh_shape "dp=4,mp=2"): row-shard the 2-D
            # parameter tables over "mp" and let XLA propagate shardings
            # through the jitted epoch scan, inserting the ICI collectives
            # (see parallel/mesh.py; validated on the virtual CPU mesh in
            # tests/test_parallel.py).
            from chaorec_tpu.parallel.mesh import parse_mesh_spec, shard_params

            self.mesh = parse_mesh_spec(cfg.mesh_shape)
            logging.info("mesh training enabled: %s", self.mesh)
            params = shard_params(params, self.mesh)
        opt_state = self.init_opt_state(params)
        early_stopping = EarlyStopping(patience=cfg.patience, verbose=True)

        # --- checkpoint/resume (capability add; see train/checkpoint.py)
        ckpt = None
        start_epoch = 0
        if cfg.checkpoint_dir and cfg.checkpoint_every > 0:
            from chaorec_tpu.train.checkpoint import CheckpointManager

            ckpt = CheckpointManager(cfg.checkpoint_dir)
            latest = ckpt.latest_step()
            if latest is not None:
                like = {"params": params, "opt_state": opt_state,
                        "mstate": self.model_state, "rng": rng,
                        "es": {"best_score": jnp.zeros(()),
                               "counter": jnp.zeros((), jnp.int32)}}
                try:
                    tree, metrics = ckpt.restore(latest, like)
                except Exception as e:
                    # most common cause: checkpoint written under a
                    # different optimizer-state schema (e.g. pre-
                    # inject_hyperparams opt states lack the lr leaf)
                    raise RuntimeError(
                        f"checkpoint at {cfg.checkpoint_dir} (step "
                        f"{latest}) does not match the current "
                        "optimizer/state schema — restart with a fresh "
                        "--checkpoint_dir or delete the stale checkpoint"
                    ) from e
                params = tree["params"]
                opt_state = tree["opt_state"]
                self.model_state = tree["mstate"]
                rng = jnp.asarray(tree["rng"])
                if metrics is not None:
                    early_stopping.best_metrics = {
                        int(k): v for k, v in metrics.items()}
                    early_stopping.best_score = float(
                        tree["es"]["best_score"])
                    early_stopping.counter = int(tree["es"]["counter"])
                start_epoch = latest
                logging.info("resumed from checkpoint at epoch %d", latest)

        # One-epoch-deep eval pipeline: dispatch epoch N's train+eval, then
        # resolve epoch N-1's metrics fetch while N computes on device.
        # Metric values, early-stop decisions, and the log are IDENTICAL to
        # the unpipelined loop (same computations, resolved in order); the
        # only difference is that when early stopping triggers, one already-
        # dispatched epoch's device work is discarded unlogged. Disabled
        # whenever EVERY epoch must be observed before the next one starts:
        # export (best-weight snapshots), profiling (clean trace windows).
        # Checkpointing coexists with the pipeline: at each checkpoint
        # boundary the pending entry is resolved early (a one-epoch drain)
        # so the saved early-stop state covers exactly the epochs the
        # saved params do — exact continuation, while the other
        # checkpoint_every-1 epochs stay pipelined.
        # Device-program serialization guard: on the generator families at
        # large edge counts (Grade/sports, AdaGCL/netfilx) the whole-epoch
        # program and the fused eval program dispatched back-to-back kill
        # the TPU worker, while each passes in isolation
        # (parity_logs/grade_crash_probe.txt — epoch OK, eval OK,
        # epoch+eval co-resident faults). When a model declares
        # serialize_device, block on the epoch program before dispatching
        # eval so only one large program is ever resident. On a single
        # chip programs execute serially anyway — this costs only the
        # host-side metrics-fetch overlap, not device time.
        serialize = bool(getattr(self.model, "serialize_device", False))
        pipeline = (cfg.eval_pipeline and not serialize
                    and not cfg.export_artifact and not cfg.profile_dir)

        def finish(entry) -> bool:
            """Resolve one epoch's metrics fetch; log; early-stop update."""
            t0 = time.perf_counter()
            out = entry["resolve"]()
            if entry["has_scalar"]:
                val_metrics, test_metrics, loss = out
            else:
                val_metrics, test_metrics = out
                loss = entry["loss"]
            resolve_s = time.perf_counter() - t0
            logging.info("Epoch {}, Loss: {:.5f}".format(
                entry["epoch"] + 1, loss))
            _log_metric_tables(val_metrics, test_metrics)
            # device work resolves at the fetch; the dispatch slot is
            # host-side only for async epochs
            logging.info(
                "epoch_time_s: total %.3f (train-dispatch %.3f | "
                "eval+sync %.3f)",
                entry["dispatch_s"] + resolve_s, entry["dispatch_s"],
                resolve_s,
            )
            recall = test_metrics[max(cfg.topk)]["recall"]
            early_stopping(recall, test_metrics)
            # Keep a host copy of the best epoch's weights for the serving
            # export (host copy: device buffers are donated next epoch).
            if cfg.export_artifact and early_stopping.counter == 0:
                self.best_params_host = jax.device_get(entry["params"])
                self.best_mstate_host = jax.device_get(entry["mstate"])
            return early_stopping.early_stop

        profiled = False
        pending = None
        stopped = False
        for epoch in range(start_epoch, cfg.num_epoch):
            # trace the second epoch: steady-state, no compile noise
            if cfg.profile_dir and epoch == start_epoch + 1 and not profiled:
                jax.profiler.start_trace(cfg.profile_dir)
                profiled = True
            t0 = time.perf_counter()
            # pre_epoch (graph pruning / operator rebuilds) counts as train
            # time — it is real per-epoch work
            self.model.pre_epoch(params, rng, epoch)
            params, opt_state, rng, loss = self.train_epoch(
                params, opt_state, rng, epoch
            )
            if serialize:
                # A REAL host fetch, not block_until_ready: through the
                # remote-TPU tunnel block_until_ready returns without
                # waiting (memory: tpu-tunnel-measurement), which made
                # this guard a silent no-op. Fetching one scalar of an
                # epoch-program output waits for the whole program, so
                # the fused eval program is only dispatched once the
                # epoch program has retired.
                leaf = jax.tree_util.tree_leaves(params)[0]
                jax.device_get(leaf.reshape(-1)[0])
            has_scalar = not isinstance(loss, float)
            _, resolve = self.evaluate_async(
                params, extra_scalar=loss if has_scalar else None)
            entry = {
                "epoch": epoch, "resolve": resolve, "has_scalar": has_scalar,
                "loss": loss, "dispatch_s": time.perf_counter() - t0,
                "params": params, "mstate": self.model_state,
            }
            at_ckpt = (ckpt is not None
                       and (epoch + 1) % cfg.checkpoint_every == 0)
            if pipeline:
                if pending is not None:
                    stopped = finish(pending)
                pending = entry
                if at_ckpt and not stopped:
                    # Drain the pipeline at the boundary: the saved
                    # early-stop state then covers epoch `epoch`
                    # itself, matching the saved params exactly.
                    stopped = finish(pending)
                    pending = None
            else:
                stopped = finish(entry)

            if cfg.profile_dir and profiled and epoch == start_epoch + 1:
                jax.profiler.stop_trace()
                logging.info("profiler trace written to %s", cfg.profile_dir)

            if at_ckpt and (not pipeline or pending is None):
                ckpt.save(
                    epoch + 1,
                    {"params": params, "opt_state": opt_state,
                     "mstate": self.model_state, "rng": rng,
                     "es": {"best_score": jnp.asarray(
                         early_stopping.best_score or 0.0),
                         "counter": jnp.asarray(early_stopping.counter,
                                                jnp.int32)}},
                    metrics={str(k): dict(v) for k, v in
                             (early_stopping.best_metrics or {}).items()},
                )

            if stopped:
                # in-flight epoch (if any) is discarded unlogged — exactly
                # the epochs the unpipelined loop would never have run
                pending = None
                print("Early stopping")
                break
        if pending is not None and not stopped:
            finish(pending)

        best_metrics = early_stopping.best_metrics
        logging.info("Best Test Metrics:")
        for k, metrics in best_metrics.items():
            metrics_strs = [f"{metric}: {value:.5f}" for metric, value in metrics.items()]
            logging.info(f"{k}: {' | '.join(metrics_strs)}")
        self.final_params = params
        return best_metrics


def train_and_evaluate(model: RecModel, dataset: RecDataset, cfg: Config) -> Dict:
    """Convenience one-shot entry (mirrors train_and_evaluate.py:523)."""
    trainer_cls = getattr(model, "trainer_cls", Trainer)
    return trainer_cls(model, dataset, cfg).run()
