"""A/B D-substep oracle: identical params + inputs through both frameworks.

The MMSSL xfw pair diverges in UPDATE dynamics (per-batch loss_D drops
6.4x after one reference D step vs 2.1x in ours) while batch-0 terms
match to ~3%. The xfw harness aligns features/seed but NOT the exact
parameter draws (torch vs JAX RNG), and adversarial dynamics amplify
init differences — so this probe removes every free variable:

- one fixed Discriminator init (exported from the REFERENCE's own
  Discriminator(dim), Model/MMSSL.py:21-45),
- one fixed (inputf, inputr) pair of row-normalized matrices,
- dropout OFF (p=0), fixed gp alpha = 0.37, gp_rate = 1.0,
- K Adam(3e-4, betas=(0.5, 0.9)) steps minimizing
  loss_D = -D(inputr).mean() + D(inputf).mean() + gp  (WGAN-GP recipe,
  gradient_penalty at Model/MMSSL.py:193-215, LAMBDA=0.3),

then compares the per-step loss_D trajectories. A match exonerates our
D/batchnorm/gp/Adam semantics and pins the xfw gap on the generator
side; a mismatch localizes the bug to this substep.

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_mmssl_dstep.py --side ref
  JAX_PLATFORMS=cpu python scripts/probe_mmssl_dstep.py --side ours
  (ref writes /tmp/mmssl_dstep_{params,inputs}.npz; ours reads them)
"""

import argparse
import sys

import numpy as np

DIM = 512
B = 128
K = 8
ALPHA = 0.37
LAMBDA = 0.3


def make_inputs():
    rs = np.random.RandomState(0)
    f = rs.normal(size=(2 * B, DIM)).astype(np.float32)
    r = rs.normal(size=(2 * B, DIM)).astype(np.float32)
    # real loss_d inputs are l2-normalized rows (sims and u_real)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    return f, r


def run_ref():
    import torch

    sys.path.insert(0, "/root/repo/scripts")
    import xfw_shims

    xfw_shims.install_all()
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/Model")
    torch.manual_seed(0)
    from MMSSL import Discriminator

    d = Discriminator(DIM)
    # dropout off: isolate deterministic semantics
    for m in d.net:
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd = {k: v.detach().numpy() for k, v in d.state_dict().items()}
    np.savez("/tmp/mmssl_dstep_params.npz", **sd)
    f, r = make_inputs()
    np.savez("/tmp/mmssl_dstep_inputs.npz", f=f, r=r)
    inputf = torch.tensor(f)
    inputr = torch.tensor(r)
    opt = torch.optim.Adam(d.parameters(), lr=3e-4, betas=(0.5, 0.9))
    for step in range(K):
        opt.zero_grad()
        lossf = d(inputf).mean()
        lossr = -d(inputr).mean()
        interp = (ALPHA * inputr + (1 - ALPHA) * inputf).requires_grad_()
        di = d(interp)
        g = torch.autograd.grad(di, interp, torch.ones_like(di),
                                create_graph=True)[0]
        gp = ((g.norm(2, dim=1) - 1) ** 2).mean() * LAMBDA
        loss = lossr + lossf + gp
        loss.backward()
        opt.step()
        print(f"REF  step {step}: loss_D={loss.item():+.6e} "
              f"lossr={lossr.item():+.6e} lossf={lossf.item():+.6e} "
              f"gp={gp.item():+.6e}")


def run_ours():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from chaorec_tpu.models.mmssl import _batchnorm

    sd = dict(np.load("/tmp/mmssl_dstep_params.npz"))
    data = np.load("/tmp/mmssl_dstep_inputs.npz")
    inputf = jnp.asarray(data["f"])
    inputr = jnp.asarray(data["r"])
    # torch state_dict names: net.0/4/8 Linear, net.2/6 BatchNorm1d
    params = {
        "D_w1": jnp.asarray(sd["net.0.weight"]),
        "D_b1": jnp.asarray(sd["net.0.bias"]),
        "D_bn1_g": jnp.asarray(sd["net.2.weight"]),
        "D_bn1_b": jnp.asarray(sd["net.2.bias"]),
        "D_w2": jnp.asarray(sd["net.4.weight"]),
        "D_b2": jnp.asarray(sd["net.4.bias"]),
        "D_bn2_g": jnp.asarray(sd["net.6.weight"]),
        "D_bn2_b": jnp.asarray(sd["net.6.bias"]),
        "D_w3": jnp.asarray(sd["net.8.weight"]),
        "D_b3": jnp.asarray(sd["net.8.bias"]),
    }

    def discriminate(p, x):
        h = x @ p["D_w1"].T + p["D_b1"]
        h = _batchnorm(h) * p["D_bn1_g"] + p["D_bn1_b"]
        h = h @ p["D_w2"].T + p["D_b2"]
        h = _batchnorm(h) * p["D_bn2_g"] + p["D_bn2_b"]
        out = jax.nn.sigmoid(h @ p["D_w3"].T + p["D_b3"])
        return 100.0 * out[:, 0]

    def loss_d(p):
        lossf = jnp.mean(discriminate(p, inputf))
        lossr = -jnp.mean(discriminate(p, inputr))
        interp = ALPHA * inputr + (1 - ALPHA) * inputf
        g = jax.grad(lambda x: jnp.sum(discriminate(p, x)))(interp)
        gp = LAMBDA * jnp.mean(
            (jnp.sqrt(jnp.sum(g ** 2, 1) + 1e-12) - 1) ** 2)
        return lossr + lossf + gp, (lossr, lossf, gp)

    opt = optax.adam(3e-4, b1=0.5, b2=0.9)
    ostate = opt.init(params)
    step_fn = jax.jit(jax.value_and_grad(loss_d, has_aux=True))
    for step in range(K):
        (loss, (lossr, lossf, gp)), grads = step_fn(params)
        upd, ostate = opt.update(grads, ostate, params)
        params = optax.apply_updates(params, upd)
        print(f"OURS step {step}: loss_D={float(loss):+.6e} "
              f"lossr={float(lossr):+.6e} lossf={float(lossf):+.6e} "
              f"gp={float(gp):+.6e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours"], required=True)
    if ap.parse_args().side == "ref":
        run_ref()
    else:
        run_ours()
