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
    """Source guard: no traced scalar attr may feed Python control flow
    or a static-int context — that raises Tracer*Error at runtime only
    for the affected model/combo. Scans models/, ops/, train/ for
    branch (`if`/`while`/ternary/and/or), `int()`, `range()`, and
    `round()` uses of every whitelisted name, including per-class
    extra_traced_scalars. (Scalars that arrive as plain function
    PARAMETERS — e.g. a `temperature` argument — cannot be guarded by
    name here; keep such helpers branch-free, as
    ops/losses.catalog_logsumexp is.)"""
    import re
    from pathlib import Path

    import chaorec_tpu.models as mpkg
    from chaorec_tpu.models.base import RecModel

    import sys

    import chaorec_tpu.models.builders  # noqa: F401 — populate subclasses

    def patterns(attr_names):
        alt = "|".join(sorted(attr_names))
        return [
            re.compile(r"\b(if|while|elif|assert)\s+[^:\n]*self\.(" + alt + r")\b"),
            re.compile(r"\b(int|range|round|bool)\(\s*self\.(" + alt + r")\b"),
            re.compile(r"self\.(" + alt + r")\s+(and|or)\s"),
        ]

    def scan(path, pats, offenders, label):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if any(p.search(line) for p in pats):
                offenders.append(f"{label}:{i}: {line.strip()}")

    offenders = []
    pkg_root = Path(mpkg.__path__[0]).parent
    global_pats = patterns(TRACED_SCALAR_ATTRS)
    for sub in ("models", "ops", "train"):
        for f in (pkg_root / sub).glob("*.py"):
            scan(f, global_pats, offenders, f"{sub}/{f.name}")
    # per-class extras are traced only for the declaring class: check
    # just its defining module
    for cls in RecModel.__subclasses__():
        extras = getattr(cls, "extra_traced_scalars", None)
        if extras:
            f = Path(sys.modules[cls.__module__].__file__)
            scan(f, patterns(extras), offenders, f.name)
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

    from chaorec_tpu.train.loop import _epoch_lr_key

    trA = one_epoch(cfgA)
    factory_before = _jitted_epoch.cache_info().currsize
    jitted = _jitted_epoch(trA.optimizer, 64,
                           int(cfgA.neg_candidates),
                           _epoch_lr_key(trA.model, cfgA))
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


def test_lr_axis_shares_trace_and_takes_effect(tiny_dataset):
    """Combos differing ONLY in learning_rate share the optimizer
    instance and the trace (the lr is written into opt_state at init —
    the shared optimizer itself is lr-agnostic with a NaN placeholder,
    so a missed fixup would blow up loudly here)."""
    from chaorec_tpu.train.loop import Trainer, _epoch_lr_key, _jitted_epoch

    ds = tiny_dataset
    cfgA = Config(Model="BPR", batch_size=64, dim_E=16, learning_rate=0.05,
                  reg_weight=1e-4)
    cfgB = cfgA.replace(learning_rate=0.001)

    def one_epoch(cfg):
        m = build_model(cfg, ds)
        tr = Trainer(m, ds, cfg)
        p0 = m.init_params(jax.random.PRNGKey(0))
        o = tr.init_opt_state(p0)
        # the injected leaf carries the combo's real lr
        np.testing.assert_allclose(float(o.hyperparams["learning_rate"]),
                                   cfg.learning_rate, rtol=1e-6)
        p0 = m.init_params(jax.random.PRNGKey(0))  # fresh (donated)
        o = tr.init_opt_state(p0)
        p1, _, _, _ = tr.train_epoch(p0, o, jax.random.PRNGKey(1), 0)
        flat = np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(p1)])
        assert np.all(np.isfinite(flat))  # NaN placeholder never leaks
        return tr, flat

    trA, pA = one_epoch(cfgA)
    jitted = _jitted_epoch(trA.optimizer, 64, int(cfgA.neg_candidates),
                           _epoch_lr_key(trA.model, cfgA))
    traces_before = jitted._cache_size()
    trB, pB = one_epoch(cfgB)
    assert trA.optimizer is trB.optimizer
    # the two combos must resolve to the SAME jitted wrapper (an lr-keyed
    # wrapper would make the no-retrace assertion below pass vacuously)
    assert _jitted_epoch(trB.optimizer, 64, int(cfgB.neg_candidates),
                         _epoch_lr_key(trB.model, cfgB)) is jitted
    assert jitted._cache_size() == traces_before  # lr-only: no retrace
    # and the two learning rates genuinely produced different updates
    assert not np.allclose(pA, pB)


def test_alias_axes_really_trace(tiny_dataset):
    """Regression for the dead-alias bug: GUME's um_loss/vt_loss and
    DGCF's corDecay grid axes are stored under different attr names
    (um_loss_w/vt_loss_w/cor_decay) — combos differing only in them must
    share the treedef, and integer YAML grid points (AdaGCL's
    ssl_alpha: 1) must coerce to float so the leaf aval is identical."""
    ds = tiny_dataset

    g1 = build_model(Config(Model="GUME", dim_E=16, n_layers=1,
                            n_ui_layers=1, learning_rate=1e-3,
                            um_loss=0.1, vt_loss=0.1), ds)
    g2 = build_model(Config(Model="GUME", dim_E=16, n_layers=1,
                            n_ui_layers=1, learning_rate=1e-3,
                            um_loss=0.2, vt_loss=0.001), ds)
    assert (jax.tree_util.tree_structure(g1)
            == jax.tree_util.tree_structure(g2))

    d1 = build_model(Config(Model="DGCF", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-3,
                            corDecay=0.01, n_factors=2, n_iterations=1),
                     ds)
    d2 = build_model(Config(Model="DGCF", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-3,
                            corDecay=0.0001, n_factors=2, n_iterations=1),
                     ds)
    assert (jax.tree_util.tree_structure(d1)
            == jax.tree_util.tree_structure(d2))

    # int vs float grid values: identical jaxpr (flatten coerces)
    s1 = build_model(Config(Model="SGL", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-3,
                            ssl_alpha=1, ssl_temp=1), ds)
    s2 = build_model(Config(Model="SGL", dim_E=16, n_layers=1,
                            learning_rate=1e-3, reg_weight=1e-3,
                            ssl_alpha=0.01, ssl_temp=0.2), ds)
    j1 = jax.make_jaxpr(lambda mm: mm.ssl_reg * mm.ssl_temp)(s1)
    j2 = jax.make_jaxpr(lambda mm: mm.ssl_reg * mm.ssl_temp)(s2)
    assert str(j1) == str(j2)
