"""Explicit time integrators for dY/dt = f(Y, theta(t)).

The reference's residual block ``y <- y + h * relu(conv(y) + b)``
(`models/tfkeras_resnets.py:69-92`) is the forward-Euler discretization of the
stable ODE; this module generalizes it to midpoint and RK4 and runs the depth
dimension as a single `lax.scan` over stacked per-layer parameters — the
compiler-friendly TPU formulation of "L identical residual blocks" (static
shapes, one traced body, optional rematerialization to trade FLOPs for HBM).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Field = Callable[..., jax.Array]  # f(y, params) -> dy/dt


def euler_step(f: Field, y: jax.Array, h: float, params: Any) -> jax.Array:
    """Forward Euler: y + h*f(y).  Matches the reference residual block."""
    return y + h * f(y, params)


def midpoint_step(f: Field, y: jax.Array, h: float, params: Any) -> jax.Array:
    """Explicit midpoint (RK2): y + h*f(y + (h/2)*f(y))."""
    return y + h * f(y + (0.5 * h) * f(y, params), params)


def rk4_step(f: Field, y: jax.Array, h: float, params: Any) -> jax.Array:
    """Classic fourth-order Runge-Kutta."""
    k1 = f(y, params)
    k2 = f(y + (0.5 * h) * k1, params)
    k3 = f(y + (0.5 * h) * k2, params)
    k4 = f(y + h * k3, params)
    return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_INTEGRATORS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "rk4": rk4_step,
}

# Number of field evaluations per step (for FLOP accounting / benchmarks).
INTEGRATOR_STAGES = {"euler": 1, "midpoint": 2, "rk4": 4}


def get_integrator(method: str):
    try:
        return _INTEGRATORS[method]
    except KeyError:
        raise ValueError(
            f"Unknown integrator {method!r}; expected one of {sorted(_INTEGRATORS)}."
        ) from None


def integrate(
    f: Field,
    y0: jax.Array,
    stacked_params: Any,
    h: float,
    method: str = "euler",
    remat: bool = False,
    unroll: int = 1,
) -> jax.Array:
    """Integrate y' = f(y, theta_l) over L steps of size h.

    ``stacked_params`` is a pytree whose leaves carry a leading layer axis
    (L, ...); step ``l`` uses slice ``l``.  With ``remat=True`` each step is
    rematerialized in the backward pass (activation memory O(1) in depth at
    the cost of one extra forward evaluation — the standard TPU trade of
    recompute for HBM).
    """
    step = get_integrator(method)

    def body(y, layer_params):
        return step(f, y, h, layer_params), None

    if remat:
        body = jax.checkpoint(body)
    y, _ = jax.lax.scan(body, y0, stacked_params, unroll=unroll)
    return y


def integrate_with_trajectory(
    f: Field,
    y0: jax.Array,
    stacked_params: Any,
    h: float,
    method: str = "euler",
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`integrate` but also returns the full trajectory (L, ...) of
    post-step states — used for stability diagnostics and tests."""
    step = get_integrator(method)

    def body(y, layer_params):
        y_next = step(f, y, h, layer_params)
        return y_next, y_next

    return jax.lax.scan(body, y0, stacked_params)
