"""Order-of-accuracy and semantics tests for the explicit integrators
(SURVEY.md section 4: Euler O(h), midpoint O(h^2), RK4 O(h^4) against an exact
linear-ODE solution)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.ops import (
    euler_step,
    get_integrator,
    integrate,
)
from differential_equations_resnet_tpu.ops.integrators import (
    integrate_with_trajectory,
)


def _global_error(method, num_steps):
    """Error at t=1 integrating y' = lambda*y, y(0)=1 (lambda packed as the
    per-step parameter to exercise the stacked-params path)."""
    lam = -1.5
    h = 1.0 / num_steps
    params = jnp.full((num_steps,), lam)
    y = integrate(lambda y, p: p * y, jnp.array(1.0), params, h, method=method)
    return abs(float(y) - float(np.exp(lam)))


@pytest.mark.parametrize(
    # Step counts chosen per order so the discretization error stays far
    # above float32 roundoff (RK4 at h=1/32 is already ~1e-8).
    "method,order,steps",
    [("euler", 1, 32), ("midpoint", 2, 16), ("rk4", 4, 4)],
)
def test_order_of_accuracy(method, order, steps):
    e1 = _global_error(method, steps)
    e2 = _global_error(method, 2 * steps)
    rate = np.log2(e1 / e2)
    assert abs(rate - order) < 0.35, (method, rate)


def test_euler_step_is_residual_block():
    """One Euler step with f = relu(w*y + b) is exactly the reference residual
    block y + h*relu(conv(y) + b) (models/tfkeras_resnets.py:69-92)."""
    y = jnp.array([1.0, -2.0, 3.0])
    w, b, h = 0.5, 0.1, 0.125
    f = lambda y, p: jax.nn.relu(p["w"] * y + p["b"])
    got = euler_step(f, y, h, {"w": w, "b": b})
    want = y + h * jax.nn.relu(w * y + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        get_integrator("leapfrog")


def test_remat_matches_plain():
    f = lambda y, p: jnp.tanh(p * y)
    y0 = jnp.ones((4,))
    params = jnp.linspace(0.1, 1.0, 8)

    def loss(params, remat):
        return jnp.sum(integrate(f, y0, params, 0.25, "midpoint", remat=remat))

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_remat), rtol=1e-6)


def test_trajectory_shape_and_final_state():
    f = lambda y, p: p * y
    y0 = jnp.ones((2, 3))
    params = jnp.arange(1.0, 6.0)
    y_final, traj = integrate_with_trajectory(f, y0, params, 0.01)
    assert traj.shape == (5, 2, 3)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(y_final))
    y_plain = integrate(f, y0, params, 0.01)
    np.testing.assert_allclose(np.asarray(y_final), np.asarray(y_plain))


def test_antisymmetric_field_norm_conservation():
    """With f(y) = A y, A antisymmetric (the gamma=0 linear regime), the exact
    flow conserves ||y||; RK4 over the materialized antisymmetric conv must
    conserve it to O(h^4) — the stability property the whole design exists
    for."""
    from differential_equations_resnet_tpu.ops import (
        conv2d_same,
        init_antisym_3x3,
        materialize_3x3,
    )

    channels, steps, h = 4, 50, 0.02
    params = init_antisym_3x3(jax.random.key(0), channels)
    kernel = materialize_3x3(params, gamma=0.0)
    y0 = jax.random.normal(jax.random.key(1), (1, 8, 8, channels))
    f = lambda y, _: conv2d_same(y, kernel)
    y_final = integrate(f, y0, jnp.zeros((steps,)), h, method="rk4")
    n0 = float(jnp.linalg.norm(y0))
    n1 = float(jnp.linalg.norm(y_final))
    assert abs(n1 - n0) / n0 < 1e-5
