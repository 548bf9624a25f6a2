"""Fixed-grid Euler ODE integration as a ``lax.scan``.

Replaces ``torchdiffeq.odeint(method='euler')`` as used by BSPM
(Model/BSPM.py:128-181, solver='euler' on linspace grids) and LightGODE
(Model/LightGODE.py ODE over t=[0, t]). torchdiffeq's fixed-grid euler
takes one step per grid interval.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def odeint_euler(func: Callable, y0: jnp.ndarray, t0: float, t1: float,
                 steps: int) -> jnp.ndarray:
    """y(t1) via `steps` Euler steps of f(t, y) from t0."""
    dt = (t1 - t0) / steps

    def body(carry, i):
        t, y = carry
        y = y + dt * func(t, y)
        return (t + dt, y), None

    (_, y), _ = jax.lax.scan(body, (jnp.asarray(t0, y0.dtype), y0),
                             jnp.arange(steps))
    return y
