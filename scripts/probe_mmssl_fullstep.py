"""Full-step MMSSL A/B oracle: identical params, batches, and noise.

probe_mmssl_dstep.py proved the D substep (D forward, BatchNorm,
second-order GP, Adam) is bit-faithful. This probe extends the A/B to
the COMPLETE per-batch update — loss_D -> Adam(D) -> batch_loss ->
AdamW(all) — with every remaining free variable pinned:

- the reference's own initial parameters (state_dict exported at the
  first loss_D call, before any update) are loaded into our pytree;
- the reference's exact (users, pos, neg) batches are replayed;
- all nn.Dropout modules set to p=0 / jax.random.bernoulli patched to
  ones (dropout off on both sides);
- torch.rand / Tensor.uniform_ / jax.random.uniform patched to a
  constant 0.5 (gp alpha and gumbel noise identical on both sides).

If the loss_D / batch_loss trajectories match for K batches, our MMSSL
step semantics are faithful end-to-end and the xfw divergence is
init-draw sensitivity of the adversarial dynamics; if they split, the
first diverging term localizes the bug (reference loop:
train_and_evaluate.py:49-71, model: Model/MMSSL.py:289-624).

Usage:
  python scripts/probe_mmssl_fullstep.py --side ref    # exports /tmp/mmssl_fs_*
  JAX_PLATFORMS=cpu python scripts/probe_mmssl_fullstep.py --side ours
"""

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

K = 3  # batches to replay


def run_ref() -> None:
    from xfw_oracle import REF, build_sandbox, first_combo, write_yaml

    combo = first_combo("MMSSL")
    root = build_sandbox("baby")
    write_yaml(root, "MMSSL", combo)
    child = f"""
import sys
import numpy as np
import torch
sys.path.insert(0, {str(REPO / 'scripts')!r})
sys.path.insert(0, {str(REF)!r})
import xfw_shims
xfw_shims.install_all()

from Model.MMSSL import MMSSL

_state = {{"n": 0, "setup": False}}

def _pin_stochasticity(model):
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    torch.rand = lambda *s, **k: torch.full(
        s if not (len(s) == 1 and isinstance(s[0], (tuple, list))) else
        tuple(s[0]), 0.5)
    _uf = torch.Tensor.uniform_
    torch.Tensor.uniform_ = lambda self, a=0.0, b=1.0: self.fill_(0.5)

_loss_D = MMSSL.loss_D
def loss_D_probe(self, users, pos_items, neg_items):
    if not _state["setup"]:
        _state["setup"] = True
        _gdump["model"] = self
        _pin_stochasticity(self)
        sd = {{k: v.detach().cpu().numpy()
              for k, v in self.state_dict().items()}}
        np.savez('/tmp/mmssl_fs_params.npz', **sd)
        print('REF param keys:', sorted(sd.keys()), flush=True)
        import os as _os
        if _os.environ.get('MMSSL_PERTURB'):
            # chaos control: 1e-7 on the first Linear bias — far below
            # any meaningful precision; a non-chaotic system would show
            # ~1e-7-scale effects on loss_D[1..2]
            self.D.net[0].bias.data.add_(1e-7)
            print('REF PERTURBED D.net[0].bias by +1e-7', flush=True)
    if _state["n"] < {K}:
        np.savez(f'/tmp/mmssl_fs_batch{{_state["n"]}}.npz',
                 users=users.cpu().numpy(), pos=pos_items.cpu().numpy(),
                 neg=neg_items.cpu().numpy())
    if _state["n"] == 1:
        sd = {{k: v.detach().cpu().numpy()
              for k, v in self.state_dict().items()}}
        np.savez('/tmp/mmssl_fs_params_after0.npz', **sd)
    out = _loss_D(self, users, pos_items, neg_items)
    print(f'REF loss_D[{{_state["n"]}}]: {{float(out):+.7e}}', flush=True)
    return out
MMSSL.loss_D = loss_D_probe

import os as _os2
_EPS = _os2.environ.get('MMSSL_ADAM_EPS')

def _apply_eps(opt):
    if _EPS:
        for g in opt.param_groups:
            g['eps'] = float(_EPS)

_adam_step = torch.optim.Adam.step
_adamw_step = torch.optim.AdamW.step
_gdump = {{"model": None, "d": False, "w": False}}

def _dump_grads(tag):
    m = _gdump["model"]
    if m is None:
        return
    gd = {{k: p.grad.detach().cpu().numpy()
          for k, p in m.named_parameters() if p.grad is not None}}
    np.savez(f'/tmp/mmssl_fs_grads_{{tag}}.npz', **gd)

def adam_step_probe(self, *a, **k):
    _apply_eps(self)
    if not _gdump["d"]:
        _gdump["d"] = True
        _dump_grads('d0')
    return _adam_step(self, *a, **k)

def adamw_step_probe(self, *a, **k):
    _apply_eps(self)
    if not _gdump["w"]:
        _gdump["w"] = True
        _dump_grads('main0')
    return _adamw_step(self, *a, **k)

torch.optim.Adam.step = adam_step_probe
torch.optim.AdamW.step = adamw_step_probe

_loss = MMSSL.loss
def loss_probe(self, users, pos_items, neg_items, idx):
    out = _loss(self, users, pos_items, neg_items, idx)
    print(f'REF batch_loss[{{int(idx)}}]: {{float(out):+.7e}}', flush=True)
    _state["n"] += 1
    if _state["n"] >= {K}:
        print('REF fullstep probe complete', flush=True)
        raise SystemExit(0)
    return out
MMSSL.loss = loss_probe

import runpy
sys.argv = ['main.py', '--Model', 'MMSSL', '--data_path', 'baby',
            '--num_epoch', '1', '--num_workers', '0']
runpy.run_path({str(REF / 'main.py')!r}, run_name='__main__')
"""
    rc = subprocess.call([sys.executable, "-c", child], cwd=root)
    sys.exit(0 if rc == 0 else rc)


def _compare_grads(tag, gtree, mapping, np):
    """Per-tensor cosine + relative L2 error vs the reference grad dump."""
    ref = dict(np.load(f"/tmp/mmssl_fs_grads_{tag}.npz"))
    # torch name -> ref array; ours key -> torch name via mapping
    print(f"OURS grad check [{tag}]:")
    for ours_k, ref_k in mapping.items():
        if ours_k not in gtree or ref_k not in ref:
            continue
        ov = np.asarray(gtree[ours_k], np.float64).ravel()
        rv = np.asarray(ref[ref_k], np.float64).ravel()
        if ov.shape != rv.shape:
            print(f"  {ours_k:20s} SHAPE {ov.shape} vs {rv.shape}")
            continue
        rn = np.linalg.norm(rv)
        on = np.linalg.norm(ov)
        cos = float(ov @ rv / (on * rn + 1e-30))
        rel = float(np.linalg.norm(ov - rv) / (rn + 1e-30))
        print(f"  {ours_k:20s} |ref|={rn:.3e} |ours|={on:.3e} "
              f"cos={cos:+.6f} relL2={rel:.3e}", flush=True)


def _build_ours():
    """Shared ours-side setup: model, ref-ported params, pinned RNG.

    Returns (model, params, state, mapping, key)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from chaorec_tpu.config import grid_combinations, load_yaml_config, parse_cli
    from chaorec_tpu.data.loading import data_load
    from chaorec_tpu.models import build_model
    from chaorec_tpu.models.base import Batch

    sys.argv = [sys.argv[0], "--Model", "MMSSL", "--data_path", "baby",
                "--data_root", "/tmp/xfw_root/Data"]
    cfg = parse_cli()
    yaml_cfg = load_yaml_config(cfg.Model)
    first = next(iter(grid_combinations(yaml_cfg)), {})
    for k, v in first.items():
        if hasattr(cfg, k):
            cur = getattr(cfg, k)
            setattr(cfg, k, type(cur)(v) if cur is not None else v)
    ds = data_load(cfg.data_path, cfg.data_root, has_v=True, has_t=True)
    model = build_model(cfg, ds)
    params = model.init_params(jax.random.PRNGKey(0))
    state = model.init_state(jax.random.PRNGKey(1))

    # pin stochasticity AFTER init: uniform -> 0.5 (gumbel + gp alpha);
    # dropout OFF exactly like torch p=0 (no 1/keep inflation): feature
    # dropout via drop_rate=0 + all-ones masks, D dropout by forcing
    # rng=None through discriminate.
    jax.random.uniform = (
        lambda key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0:
        jnp.full(shape, 0.5, dtype))
    jax.random.bernoulli = (
        lambda key, p=0.5, shape=None: jnp.ones(shape, bool))
    model.drop_rate = 0.0
    _disc = type(model).discriminate
    model.discriminate = (
        lambda p, x, rng=None, _d=_disc, _m=model: _d(_m, p, x, None))

    sd = dict(np.load("/tmp/mmssl_fs_params.npz"))
    mapping = {
        "user_id_embedding": "user_id_embedding.weight",
        "item_id_embedding": "item_id_embedding.weight",
        "image_trans_w": "image_trans.weight",
        "image_trans_b": "image_trans.bias",
        "text_trans_w": "text_trans.weight",
        "text_trans_b": "text_trans.bias",
        "w_cat": "weight_dict.w_self_attention_cat",
        "D_w1": "D.net.0.weight", "D_b1": "D.net.0.bias",
        "D_bn1_g": "D.net.2.weight", "D_bn1_b": "D.net.2.bias",
        "D_w2": "D.net.4.weight", "D_b2": "D.net.4.bias",
        "D_bn2_g": "D.net.6.weight", "D_bn2_b": "D.net.6.bias",
        "D_w3": "D.net.8.weight", "D_b3": "D.net.8.bias",
    }
    missing = [k for k in params if k not in mapping]
    if missing:
        print(f"OURS unmapped params (left at our init): {missing}")
    for ours_k, ref_k in mapping.items():
        if ours_k not in params:
            print(f"OURS missing key {ours_k}")
            continue
        v = jnp.asarray(sd[ref_k])
        if params[ours_k].shape != v.shape:
            print(f"OURS shape clash {ours_k}: {params[ours_k].shape} "
                  f"vs ref {v.shape}")
            continue
        params[ours_k] = v
    return model, params, state, mapping, jax.random.PRNGKey(0), cfg


def run_ours() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    model, params, state, mapping, key, cfg = _build_ours()

    import jax.tree_util as jtu

    import os as _os

    eps = float(_os.environ.get("MMSSL_ADAM_EPS", "1e-8"))
    if eps != 1e-8:
        print(f"OURS ADAM EPS OVERRIDE: {eps}", flush=True)
    d_labels = jtu.tree_map_with_path(
        lambda path, _: "d" if str(path[0].key).startswith("D_") else "frozen",
        params)
    opt_d = optax.multi_transform(
        {"d": optax.adam(3e-4, b1=0.5, b2=0.9, eps=eps),
         "frozen": optax.set_to_zero()}, d_labels)
    opt_main = optax.adamw(cfg.learning_rate, weight_decay=0.01, eps=eps)
    od = opt_d.init(params)
    om = opt_main.init(params)

    from chaorec_tpu.models.base import Batch

    for i in range(K):
        b = np.load(f"/tmp/mmssl_fs_batch{i}.npz")
        users = jnp.asarray(b["users"], jnp.int32)
        pos = jnp.asarray(b["pos"], jnp.int32) - model.num_user
        neg = jnp.asarray(b["neg"], jnp.int32) - model.num_user
        w = jnp.ones(users.shape[0], jnp.float32)
        batch = Batch(users, pos, neg, w, jnp.int32(i))
        loss_d_v, g_d = jax.value_and_grad(model.loss_d)(
            params, state, batch, key)
        print(f"OURS loss_D[{i}]: {float(loss_d_v):+.7e}", flush=True)
        if i == 0:
            _compare_grads("d0", g_d, mapping, np)
        upd, od = opt_d.update(g_d, od, params)
        params = optax.apply_updates(params, upd)
        (loss_v, state), g = jax.value_and_grad(
            model.loss_stateful, has_aux=True)(params, state, batch, key)
        print(f"OURS batch_loss[{i}]: {float(loss_v):+.7e}", flush=True)
        if i == 0:
            _compare_grads("main0", g, mapping, np)
        upd, om = opt_main.update(g, om, params)
        params = optax.apply_updates(params, upd)
        if i == 0:
            np.savez("/tmp/mmssl_fs_ours_after0.npz",
                     **{k: np.asarray(v) for k, v in params.items()})
            ref_after = dict(np.load("/tmp/mmssl_fs_params_after0.npz"))
            print("OURS post-batch-0 param deltas vs ref:")
            for ours_k, ref_k in mapping.items():
                if ours_k not in params:
                    continue
                rv = np.asarray(ref_after[ref_k])
                ov = np.asarray(params[ours_k])
                if rv.shape != ov.shape:
                    continue
                d = np.abs(rv - ov)
                scale = np.abs(rv).max() + 1e-12
                print(f"  {ours_k:20s} maxabs={d.max():.3e} "
                      f"rel={d.max() / scale:.3e}", flush=True)


def run_hybrid() -> None:
    """Pinpoint the tensor whose post-batch-0 difference drives the
    batch-1 loss_D gap: evaluate OUR loss_d on batch 1 with the ref's
    post-batch-0 params, swapping in our post-batch-0 tensors one at a
    time (run --side ours first so /tmp/mmssl_fs_ours_after0.npz exists)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    model, params, state, mapping, key, _cfg = _build_ours()
    ref_after = dict(np.load("/tmp/mmssl_fs_params_after0.npz"))
    ours_after = dict(np.load("/tmp/mmssl_fs_ours_after0.npz"))

    from chaorec_tpu.models.base import Batch

    b = np.load("/tmp/mmssl_fs_batch1.npz")
    batch = Batch(jnp.asarray(b["users"], jnp.int32),
                  jnp.asarray(b["pos"], jnp.int32) - model.num_user,
                  jnp.asarray(b["neg"], jnp.int32) - model.num_user,
                  jnp.ones(b["users"].shape[0], jnp.float32), jnp.int32(1))
    # state after batch 0 = accumulate of batch-0 picks; rebuild our side
    b0 = np.load("/tmp/mmssl_fs_batch0.npz")
    batch0 = Batch(jnp.asarray(b0["users"], jnp.int32),
                   jnp.asarray(b0["pos"], jnp.int32) - model.num_user,
                   jnp.asarray(b0["neg"], jnp.int32) - model.num_user,
                   jnp.ones(b0["users"].shape[0], jnp.float32), jnp.int32(0))
    base = {k: jnp.asarray(ref_after[rk]) for k, rk in mapping.items()
            if k in params}
    for k in params:
        if k not in base:
            base[k] = params[k]
    _, state0 = model.loss_stateful(base, state, batch0, key)

    def eval_ld(p):
        return float(model.loss_d(p, state0, batch, key))

    ld_ref = eval_ld(base)
    print(f"HYB loss_D[1] all-ref:  {ld_ref:+.7e}")
    full_ours = dict(base)
    for k in mapping:
        if k in full_ours and k in ours_after:
            full_ours[k] = jnp.asarray(ours_after[k])
    ld_ours = eval_ld(full_ours)
    print(f"HYB loss_D[1] all-ours: {ld_ours:+.7e}  (gap {ld_ours-ld_ref:+.3e})")
    for k in mapping:
        if k not in base or k not in ours_after:
            continue
        p = dict(base)
        p[k] = jnp.asarray(ours_after[k])
        ld = eval_ld(p)
        print(f"HYB swap {k:20s} {ld:+.7e}  (moved {ld-ld_ref:+.3e})",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours", "hybrid"],
                    required=True)
    side = ap.parse_args().side
    if side == "ref":
        run_ref()
    elif side == "hybrid":
        run_hybrid()
    else:
        run_ours()
