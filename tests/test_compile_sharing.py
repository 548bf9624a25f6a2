"""Grid combos that differ only in continuous hyperparameters must share
one compiled epoch program.

Continuous loss-shaping scalars (reg_weight, ssl_alpha, ssl_temp, ...)
flatten as model-pytree leaves (models/base.py TRACED_SCALAR_ATTRS —
kept as python floats so they trace weak-typed, preserving bf16
promotion) and the learning rate rides the opt_state
(optax.inject_hyperparams), so they are jit ARGUMENTS, not baked HLO
constants. The reference's AdaGCL grid is 96 combos of which only
n_layers∈{1,2} is structural — 2 XLA compiles instead of 96 at 5-25 min
per remote compile on the TPU tunnel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chaorec_tpu.config import Config
from chaorec_tpu.models import TRACED_SCALAR_ATTRS, build_model
from chaorec_tpu.models.base import Batch

pytestmark = pytest.mark.fast


def _batch(ds, b=64, seed=1):
    rs = np.random.default_rng(seed)
    return Batch(
        jnp.asarray(rs.integers(0, ds.num_user, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.asarray(rs.integers(0, ds.num_item, b).astype(np.int32)),
        jnp.ones((b,), jnp.float32), jnp.int32(0), None,
    )


def test_traced_attrs_are_leaves_not_constants(tiny_dataset):
    cfg = Config(Model="SGL", dim_E=16, n_layers=2, learning_rate=1e-3,
                 reg_weight=1e-3, ssl_alpha=0.01, ssl_temp=0.2)
    m = build_model(cfg, tiny_dataset)
    # the scalars stay python floats outside jit (weak-typed when
    # traced, so bf16 promotion semantics are unchanged) ...
    assert isinstance(m.reg_weight, float)
    # ... but flatten as pytree leaves: a jaxpr over the model treats
    # them as input variables, so two combos produce the SAME jaxpr
    j1 = jax.make_jaxpr(lambda mm: mm.reg_weight * mm.ssl_temp)(m)
    m2 = build_model(cfg.replace(reg_weight=0.7, ssl_temp=0.9),
                     tiny_dataset)
    j2 = jax.make_jaxpr(lambda mm: mm.reg_weight * mm.ssl_temp)(m2)
    assert str(j1) == str(j2)


def test_continuous_combos_share_lowered_hlo(tiny_dataset):
    """Two SGL combos differing in reg/ssl_alpha/ssl_temp AND lr lower
    to byte-identical HLO for a full train step (loss + grad +
    inject-hyperparams Adam): the XLA compile is shared; only the
    argument values differ."""
    ds = tiny_dataset

    def mk(reg, alpha, temp, lr):
        cfg = Config(Model="SGL", dim_E=16, n_layers=2, learning_rate=lr,
                     reg_weight=reg, ssl_alpha=alpha, ssl_temp=temp)
        model = build_model(cfg, ds)
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=jnp.float32(lr))
        params = model.init_params(jax.random.PRNGKey(0))
        return model, opt, params

    def step(model, params, opt_state, batch, rng, opt):
        loss, grads = jax.value_and_grad(model.loss)(params, batch, rng)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    batch = _batch(ds)
    rng = jax.random.PRNGKey(3)

    mA, optA, pA = mk(1e-3, 0.01, 0.2, 1e-3)
    mB, optB, pB = mk(1e-2, 0.10, 0.5, 5e-4)

    assert (jax.tree_util.tree_structure(mA)
            == jax.tree_util.tree_structure(mB))

    lowA = jax.jit(lambda m, p, o, b, r: step(m, p, o, b, r, optA)).lower(
        mA, pA, optA.init(pA), batch, rng)
    lowB = jax.jit(lambda m, p, o, b, r: step(m, p, o, b, r, optB)).lower(
        mB, pB, optB.init(pB), batch, rng)
    assert lowA.as_text() == lowB.as_text()


def test_structural_combo_still_differs(tiny_dataset):
    """n_layers is structural: the model pytree static aux differs, so
    the programs are (correctly) different."""
    ds = tiny_dataset
    m1 = build_model(Config(Model="SGL", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-3,
                            ssl_alpha=0.01, ssl_temp=0.2), ds)
    m2 = build_model(Config(Model="SGL", dim_E=16, n_layers=2,
                            learning_rate=1e-3, reg_weight=1e-3,
                            ssl_alpha=0.01, ssl_temp=0.2), ds)
    assert (jax.tree_util.tree_structure(m1)
            != jax.tree_util.tree_structure(m2))


def test_traced_values_still_reach_the_loss(tiny_dataset):
    """The traced scalars are not dead: changing reg_weight changes the
    loss value (through the same compiled program)."""
    ds = tiny_dataset
    batch = _batch(ds)
    rng = jax.random.PRNGKey(0)

    def loss_of(reg):
        cfg = Config(Model="BPR", dim_E=16, learning_rate=1e-3,
                     reg_weight=reg)
        m = build_model(cfg, ds)
        p = m.init_params(jax.random.PRNGKey(0))
        return float(jax.jit(lambda m, p, b, r: m.loss(p, b, r))(
            m, p, batch, rng))

    assert loss_of(10.0) > loss_of(1e-3)


def test_whitelist_attrs_have_no_python_control_flow():
    """Source guard: no model may branch on a traced scalar attr — that
    would throw a TracerBoolConversionError at runtime for pytree-arg
    models; keep the whitelist multiplicative-only."""
    import re
    from pathlib import Path

    import chaorec_tpu.models as mpkg

    pat = re.compile(
        r"if\s+[^:\n]*self\.(" + "|".join(sorted(TRACED_SCALAR_ATTRS))
        + r")\b")
    offenders = []
    for f in Path(mpkg.__path__[0]).glob("*.py"):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{f.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_epoch_fn_shared_across_grid_combos(tiny_dataset):
    """In one process (the CLI grid loop), two combos differing only in
    reg_weight share the optimizer instance, the jitted epoch function
    identity, AND the trace itself (cache size stays 1 after both run)."""
    from chaorec_tpu.train.loop import Trainer, _jitted_epoch

    ds = tiny_dataset
    cfgA = Config(Model="BPR", batch_size=64, dim_E=16, learning_rate=0.05,
                  reg_weight=1e-4, num_epoch=1, patience=1)
    cfgB = cfgA.replace(reg_weight=1e-2)

    def one_epoch(cfg):
        m = build_model(cfg, ds)
        tr = Trainer(m, ds, cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        o = tr.init_opt_state(p)
        tr.train_epoch(p, o, jax.random.PRNGKey(1), 0)
        return tr

    trA = one_epoch(cfgA)
    factory_before = _jitted_epoch.cache_info().currsize
    jitted = _jitted_epoch(trA.optimizer, 64,
                           int(cfgA.neg_candidates),
                           float(cfgA.learning_rate))
    traces_before = jitted._cache_size()
    trB = one_epoch(cfgB)
    assert trA.optimizer is trB.optimizer
    # same factory entry, and combo B added NO new trace (identical
    # treedef + shapes ride through combo A's cached program)
    assert _jitted_epoch.cache_info().currsize == factory_before
    assert jitted._cache_size() == traces_before


def test_bm3_dropout_axis_traces(tiny_dataset):
    """BM3 opts its gate-free dropout into the traced set: two dropout
    values share the jaxpr; DHCF (which branches on dropout > 0) keeps
    it static."""
    from chaorec_tpu.models import build_model

    kwargs = dict(dim_E=16, n_layers=1, learning_rate=1e-3,
                  reg_weight=0.1, cl_weight=2.0)
    mA = build_model(Config(Model="BM3", dropout=0.3, **kwargs),
                     tiny_dataset)
    mB = build_model(Config(Model="BM3", dropout=0.5, **kwargs),
                     tiny_dataset)
    assert (jax.tree_util.tree_structure(mA)
            == jax.tree_util.tree_structure(mB))

    d1 = build_model(Config(Model="DHCF", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-4,
                            dropout=0.1), tiny_dataset)
    assert isinstance(vars(d1)["dropout"], float)
    # DHCF's dropout stays in the static aux (no pytree leaf)
    names = [k for k, v in sorted(vars(d1).items())]
    leaves, treedef = jax.tree_util.tree_flatten(d1)
    assert len(leaves) < len(names)  # sanity: aux exists
    d2 = build_model(Config(Model="DHCF", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-4,
                            dropout=0.2), tiny_dataset)
    assert (jax.tree_util.tree_structure(d1)
            != jax.tree_util.tree_structure(d2))


def test_family_model_combos_share_structure(tiny_dataset):
    """The family-trainer models' continuous grid axes are traced too:
    AdaGCL's 96-combo reference grid (n_layers x lr x reg x ssl_alpha x
    ssl_temp) collapses to its 2 structural n_layers values — combos
    differing only in the continuous axes share the model treedef, so
    their whole-epoch scans lower to the same HLO (the persistent
    compilation cache dedupes the 5-25 min remote compiles)."""
    ds = tiny_dataset

    def ada(reg, alpha, temp):
        return build_model(
            Config(Model="AdaGCL", dim_E=16, n_layers=2, learning_rate=1e-3,
                   reg_weight=reg, ssl_alpha=alpha, ssl_temp=temp), ds)

    a1 = ada(0.1, 0.1, 0.1)
    a2 = ada(0.001, 1.0, 0.5)
    assert (jax.tree_util.tree_structure(a1)
            == jax.tree_util.tree_structure(a2))

    def hccf(reg, alpha, temp, leaky, mult):
        return build_model(
            Config(Model="HCCF", dim_E=16, n_layers=2, learning_rate=1e-3,
                   reg_weight=reg, ssl_alpha=alpha, ssl_temp=temp,
                   leaky=leaky, keepRate=1.0, mult=mult), ds)

    h1 = hccf(1e-5, 0.1, 0.5, 0.5, 0.01)
    h2 = hccf(1e-3, 1.0, 0.1, 1.0, 0.10)
    assert (jax.tree_util.tree_structure(h1)
            == jax.tree_util.tree_structure(h2))
