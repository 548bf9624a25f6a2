"""Closed-form Adam zero-gradient tail.

Reference semantics being reproduced exactly: the reference pins
``pytorch==1.11.0`` (requirements.txt:39), where ``optimizer.zero_grad()``
default is ``set_to_none=False`` — after the first backward has populated
``.grad``, every later step re-zeroes the tensor instead of detaching it,
so torch Adam keeps updating the parameter with ``g = 0``. For the
first-batch graph-build models (LATTICE/MICRO,
train_and_evaluate.py:98-106) the feature/projection parameters therefore
receive one real gradient on batch 0 of each epoch and then a pure
momentum-decay tail for the remaining N-1 batches:

    mu_k = b1^k mu_0          nu_k = b2^k nu_0          t = t_0 + k
    p   -= lr * (mu_k / (1 - b1^t)) / (sqrt(nu_k / (1 - b2^t)) + eps)

Running that through the optimizer costs the full Adam HBM sweep of the
(I, 4096) feature tables on every batch (~2.3 GB/batch on microlens) for
updates that depend on nothing but (mu_0, nu_0, t_0, k). This op computes
the whole tail in one fused pass:

    p_N  = p_0 - lr * mu_0 * S(sqrt(nu_0)),
    S(s) = sum_k A_k / (C_k s + eps),
    A_k  = b1^k / (1 - b1^(t0+k)),   C_k = sqrt(b2^k / (1 - b2^(t0+k)))

S is a minor-axis broadcast-divide-reduce that XLA fuses into a single
read of ``nu_0`` (chunked with ``lax.map`` so no (E, K) intermediate can
ever materialize). Exactness is pinned against a literal optax
``adam.update`` loop in tests/test_adam_tail.py.

Requires the optimizer's ``eps_root == 0`` (optax adam default; asserted
by the caller) — a nonzero eps_root lands inside the sqrt and does not
factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Elements per lax.map chunk: bounds the worst-case (chunk, K)
# intermediate at ~ chunk * n_steps * 4 bytes even if XLA declines to
# fuse the reduce (1<<18 * 1024 steps * 4 B = 1 GiB absolute worst; the
# practical fused cost is one read of nu per chunk).
_CHUNK = 1 << 18


def zero_grad_adam_tail(p, mu, nu, count0, n_steps: int, lr, b1, b2, eps):
    """Apply ``n_steps`` zero-gradient Adam updates to one leaf at once.

    Args:
      p, mu, nu: parameter and its Adam first/second moments AFTER the
        last real-gradient update (any shape, same shape each).
      count0: Adam step count at that point (traced int scalar).
      n_steps: static number of zero-grad steps to apply (>= 0).
      lr, b1, b2, eps: Adam hyperparameters (traced scalars fine).

    Returns (p', mu', nu') exactly as if optax adam ran ``n_steps`` times
    with a zero gradient (same count trajectory t0+1 .. t0+n_steps).
    """
    if n_steps <= 0:
        return p, mu, nu
    b1 = jnp.asarray(b1, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)
    ks = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
    t = count0.astype(jnp.float32) + ks
    a = b1 ** ks / (1.0 - b1 ** t)  # (K,)
    c = jnp.sqrt(b2 ** ks / (1.0 - b2 ** t))  # (K,)

    flat_nu = nu.reshape(-1)
    n = flat_nu.shape[0]
    pad = (-n) % _CHUNK
    s = jnp.sqrt(jnp.pad(flat_nu, (0, pad))).reshape(-1, _CHUNK)

    def chunk_sum(sc):  # (CHUNK,) -> (CHUNK,)
        return jnp.sum(a[None, :] / (c[None, :] * sc[:, None] + eps), axis=1)

    coef = jax.lax.map(chunk_sum, s).reshape(-1)[:n].reshape(nu.shape)
    p = p - lr * mu * coef
    return p, mu * b1 ** n_steps, nu * b2 ** n_steps


def tree_zero_grad_adam_tail(params, mus, nus, count0, n_steps: int,
                             lr, b1, b2, eps):
    """Leaf-wise ``zero_grad_adam_tail`` over matching pytrees."""
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_mu = treedef.flatten_up_to(mus)
    flat_nu = treedef.flatten_up_to(nus)
    out = [zero_grad_adam_tail(p, m, v, count0, n_steps, lr, b1, b2, eps)
           for p, m, v in zip(flat_p, flat_mu, flat_nu)]
    unflat = treedef.unflatten
    return (unflat([o[0] for o in out]), unflat([o[1] for o in out]),
            unflat([o[2] for o in out]))
