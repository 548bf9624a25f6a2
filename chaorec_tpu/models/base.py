"""Model protocol: pure-functional, jit-first.

The reference's informal protocol (SURVEY.md §2.4): constructor takes
``(num_user, num_item, edge_index, user_item_dict, ...)``; ``loss(users,
pos, neg)`` subtracts the global item offset; ``gene_ranklist(topk=50)``
does the full-catalog ranking.

TPU-native redesign: a model is a *static config object* whose methods are
pure functions of an explicit parameter pytree —

- ``init_params(rng) -> params``       (plain dict of jnp arrays)
- ``loss(params, batch, rng) -> (scalar, aux)``   jitted inside the epoch scan
- ``embeddings(params) -> (user_emb, item_emb)``  consumed by the shared
  fused ranking kernel (eval/ranking.py)
- optional ``pre_epoch(params, rng, epoch) -> model-state update`` hook
  (reference's ``pre_epoch_processing``, train_and_evaluate.py:555-557)
- optional ``param_labels()`` for multi-optimizer models (MMSSL/AdaGCL/...)

Item ids inside batches are already 0-based (the global offset is removed
once at data load; see data/loading.py) — the per-model ``- num_user``
boilerplate of the reference is gone by construction.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _is_dynamic(v: Any) -> bool:
    """An attribute is a pytree leaf-bundle iff it contains array data."""
    return any(
        isinstance(leaf, (jax.Array, np.ndarray))
        for leaf in jax.tree_util.tree_leaves(v)
    )


# Continuous loss-shaping hyperparameters that appear ONLY
# multiplicatively in traced code (audited: no Python `if`/`int()`/shape
# use anywhere in models/, ops/, train/ — pinned by
# tests/test_compile_sharing.py's source guard). They flatten as pytree
# LEAVES (kept as python scalars, so in-jit they trace WEAK-typed and
# promotion semantics are bit-identical to the baked-constant form),
# which makes them jit arguments instead of HLO constants: every YAML
# grid combo differing only in these axes reuses one compiled epoch
# program. The reference's AdaGCL grid is 96 combos of which only
# n_layers∈{1,2} is structural — 2 XLA compiles instead of 96 at 5-25
# min per remote compile. Structural knobs (n_layers, dims, topk,
# steps, dropout's <=0 gate, HCCF's keep_rate>=1 gate) stay static.
TRACED_SCALAR_ATTRS = frozenset({
    "reg_weight", "ssl_alpha", "ssl_temp", "ssl_temp2", "cl_weight",
    "noise_alpha", "G_rate", "e_loss", "ris_lambda", "b2",
    "ctra", "cen_reg", "align_weight",
    "mult", "leaky", "idl_beta", "gamma", "t", "lambda_coeff", "beta1",
    "beta2", "neg_weight", "tau", "beta",
    # per-model aliases of the same config axes (names as models
    # actually store them — pinned by tests/test_compile_sharing.py)
    "ssl_reg", "lambda_1", "lambda_2", "temp", "temp_node", "alpha",
    "cl_rate", "kl_weight", "um_loss_w", "vt_loss_w", "cor_decay",
})


def _is_traced_scalar(k: str, v: Any, extras=frozenset()) -> bool:
    return ((k in TRACED_SCALAR_ATTRS or k in extras)
            and isinstance(v, (int, float)) and not isinstance(v, bool))


class Batch(NamedTuple):
    """One training micro-batch; all shapes static.

    ``weights`` in {0,1} marks real vs padded rows (fixed-shape batching of
    the reference's smaller final batch). ``index`` is the batch's position
    within the epoch (scalar) — used by models with first-batch semantics
    (LATTICE/MICRO graph rebuilds, train_and_evaluate.py:98-106)."""

    users: jnp.ndarray  # (B,) int32
    pos_items: jnp.ndarray  # (B,) int32, 0-based
    neg_items: jnp.ndarray  # (B,) int32, 0-based
    weights: jnp.ndarray  # (B,) float32
    index: Any = None  # scalar int32 batch index within the epoch
    # Second independent uniform negative ("interest" items) for MCLN
    # (dataload.py:81-84,103-104); sampled when model.needs_int_items.
    int_items: Any = None


class RecModel:
    """Base class: holds static hyperparams + graph/feature buffers.

    Every subclass is auto-registered as a **pytree**: attributes holding
    array data (graphs, modality features, rebuilt-adjacency buffers) are
    leaves; scalars/strings are static aux. Models therefore flow through
    ``jax.jit`` as *arguments* — never as Python closures — so large
    buffers are real device inputs instead of HLO constants (closure
    capture would embed e.g. a 1.7 GB dense adjacency into the lowered
    module and force device->host fetches at trace time).
    """

    name: str = "RecModel"

    def __init__(self, num_user: int, num_item: int):
        self.num_user = num_user
        self.num_item = num_item

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)

        # models whose use of a name is gate-free may trace extra
        # scalars (e.g. BM3's dropout: pure bernoulli p, while
        # DHCF/SMORE/FREEDOM/... branch on dropout>0 structurally)
        extras = frozenset(getattr(cls, "extra_traced_scalars", ()))

        def flatten(self):
            dyn_names, dyn_vals, static = [], [], []
            for k, v in sorted(vars(self).items()):
                if _is_dynamic(v):
                    dyn_names.append(k)
                    dyn_vals.append(v)
                elif _is_traced_scalar(k, v, extras):
                    dyn_names.append(k)
                    # coerce int grid points (YAML "ssl_alpha: [1]") to
                    # float so every combo's leaf has the same weak-f32
                    # aval — an i32 leaf would lower to different HLO
                    # and silently split the shared compile
                    dyn_vals.append(float(v))
                else:
                    static.append((k, v))
            return tuple(dyn_vals), (tuple(dyn_names), tuple(static))

        def unflatten(aux, children):
            dyn_names, static = aux
            obj = object.__new__(cls)
            for k, v in static:
                object.__setattr__(obj, k, v)
            for k, v in zip(dyn_names, children):
                object.__setattr__(obj, k, v)
            return obj

        jax.tree_util.register_pytree_node(cls, flatten, unflatten)

    # --- required API ---
    def init_params(self, rng: jax.Array) -> Params:
        raise NotImplementedError

    def loss(self, params: Params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        raise NotImplementedError

    def embeddings(self, params: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(user_emb, item_emb) used for full-catalog scoring."""
        raise NotImplementedError

    # --- score-ranking API: models whose ranking is not an embedding dot
    # product (VAE / diffusion decoders produce logits directly). Set
    # rank_mode = "scores" and implement score_users. ---
    rank_mode: str = "embeddings"

    def score_users(self, params: Params, user_ids: jnp.ndarray) -> jnp.ndarray:
        """(len(user_ids), num_item) ranking scores (pre-masking)."""
        raise NotImplementedError

    # --- stateful-model API (models with non-gradient buffers updated
    # every step, e.g. DGCF's routing scores). The trainer threads `state`
    # through the epoch scan when `stateful` is True. ---
    stateful: bool = False

    def init_state(self, rng: jax.Array):
        return None

    def loss_stateful(self, params: Params, state, batch: Batch, rng: jax.Array):
        """Returns (loss, new_state)."""
        raise NotImplementedError

    def embeddings_stateful(self, params: Params, state):
        raise NotImplementedError

    # --- row-sparse table API: params listed here are large tables whose
    # per-step gradient is nonzero only on batch rows (trainable raw
    # modality features, reference nn.Embedding.from_pretrained(freeze=
    # False)). The trainer then computes row gradients directly and applies
    # the exact-math row-sparse Adam (ops/indexed_adam.py) instead of
    # materializing a full-table dense gradient every step. ---
    table_params: Tuple[str, ...] = ()

    # --- params whose gradient is nonzero ONLY on each epoch's first
    # batch (graph-rebuild-gated subtrees: LATTICE/MICRO recompute their
    # learned item graphs when batch.index == 0 and detach the carried
    # graph otherwise, train_and_evaluate.py:98-103 + Model/LATTICE.py:
    # 137-158). The reference pins torch 1.11, where zero_grad()
    # defaults to set_to_none=False: after batch 0's backward populates
    # .grad, every later batch re-zeroes the tensor and Adam KEEPS
    # stepping the subtree with g = 0 (momentum-decay drift, per-batch
    # step count). The trainer reproduces this exactly with a real
    # update under lax.cond(index == 0) plus the fused closed-form
    # zero-grad tail at epoch end (ops/adam_tail.py) — the
    # tens-of-MB-to-GB Adam HBM sweep over trainable feature tables
    # runs once per epoch instead of every step. Declaring this is
    # only valid when the subtree's VALUES are never read off batch 0
    # (the carried graph is the only consumer). ---
    epoch0_params: Tuple[str, ...] = ()

    def table_rows(self, batch: Batch):
        """{table_name: (B,) row indices} this batch's loss touches."""
        raise NotImplementedError

    def loss_tables(self, dense_params: Params, table_rows_vals, batch: Batch,
                    rng: jax.Array) -> jnp.ndarray:
        """Loss with the table rows pre-gathered (table_rows_vals[name] =
        table[rows]); identical math to ``loss``."""
        raise NotImplementedError

    # --- optional hooks ---
    def pre_epoch(self, params: Params, rng: jax.Array, epoch: int) -> None:
        """Epoch-boundary host-orchestrated update (graph rebuilds etc.)."""
        return None

    def param_labels(self, params: Params) -> Optional[Params]:
        """Optax multi-transform labels for multi-optimizer models."""
        return None

    def extra_batch_fields(self) -> Tuple[str, ...]:
        """Extra per-batch tensors this model needs (e.g. 'int_items')."""
        return ()
