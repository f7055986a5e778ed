"""Fused Pallas integrator kernel vs the XLA scan reference, in interpreter
mode on CPU (SURVEY.md section 4 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from differential_equations_resnet_tpu.ops import init_antisym_3x3, materialize_3x3
from differential_equations_resnet_tpu.ops.pallas.fused_integrator import (
    fused_euler_3x3,
    fused_euler_dense,
    fused_euler_eligible,
    reference_euler_dense,
)


def make_case(batch=4, height=8, width=8, channels=8, layers=3, seed=0):
    keys = jax.random.split(jax.random.key(seed), layers + 1)
    x = jax.random.normal(keys[0], (batch, height, width, channels), jnp.float32)
    blocks = jax.vmap(lambda k: init_antisym_3x3(k, channels))(keys[1:])
    # Nonzero biases so the bias path is exercised.
    blocks = blocks._replace(
        bias=0.05 * jax.random.normal(keys[0], (layers, channels))
    )
    return x, blocks


def dense_from_blocks(blocks, gamma=0.0):
    return jax.vmap(lambda p: materialize_3x3(p, gamma=gamma))(blocks)


def test_eligibility_gate():
    x, blocks = make_case()
    assert fused_euler_eligible(x, blocks)
    assert not fused_euler_eligible(x.astype(jnp.bfloat16), blocks)
    assert not fused_euler_eligible(x[0], blocks)
    assert not fused_euler_eligible(x, blocks._replace(bias=None))
    # Spatial extents past CIFAR scale must DECLINE (VMEM state tile), never
    # reach Mosaic and fail its scoped-VMEM allocation: a 224x224 ImageNet
    # shape is the regression case.
    big = jnp.zeros((1, 224, 224, x.shape[-1]), jnp.float32)
    assert not fused_euler_eligible(big, blocks)
    ok = jnp.zeros((1, 64, 64, x.shape[-1]), jnp.float32)
    assert fused_euler_eligible(ok, blocks)


def test_backward_grid_limit_falls_back_to_xla_gradient(monkeypatch):
    """The round-3 measured compile crash (docs/RESULTS.md section 6: the
    backward pallas_call stops compiling past grid=64) is handled INSIDE
    the custom VJP: shapes past the grid limit keep the Pallas forward
    (so large-batch inference loses nothing — review r5) and their
    backward silently computes XLA's gradient of the same math.  The gate
    therefore stays eligible at the formerly-declined B=128/C=64 shape,
    and a monkeypatched grid limit of 1 proves the fallback branch
    produces gradients matching the XLA reference."""
    from differential_equations_resnet_tpu.ops.pallas import fused_integrator as fi

    channels, layers = 64, 64
    keys = jax.random.split(jax.random.key(0), layers)
    blocks = jax.vmap(lambda k: init_antisym_3x3(k, channels))(keys)
    blocks = blocks._replace(bias=jnp.zeros((layers, channels)))
    crash = jnp.zeros((128, 32, 32, channels), jnp.float32)
    # Pin the regime: the trajectory scratch forces tile=1 here, so grid=B
    # exceeds the measured 64 limit — yet the shape stays ELIGIBLE (the
    # forward compiles fine; only the backward must avoid pallas_call).
    assert fi._bwd_tile(128, 32, 32, channels, layers) == 1
    assert fused_euler_eligible(crash, blocks)

    # Exercise the fallback branch at a cheap shape by forcing the limit
    # to 1: gradients must match the XLA reference exactly in structure
    # and closely in value (the fallback IS jax.vjp of the reference).
    x, small = make_case(batch=4, height=4, width=4, channels=4, layers=3)
    kernels = dense_from_blocks(small)
    h = 0.125
    cot = jax.random.normal(jax.random.key(5), x.shape)
    monkeypatch.setattr(fi, "_MAX_BWD_GRID", 1)
    assert fi._batch_tile(4, 4, 4, 4) > 1  # grid would be <= limit...
    monkeypatch.setattr(fi, "_bwd_tile", lambda *a: 1)  # ...force grid=4>1

    def loss(fn):
        return lambda a, k, b: jnp.vdot(fn(a, k, b), cot)

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(
            loss(lambda a, k, b: fi.fused_euler_dense(a, k, b, h)),
            argnums=(0, 1, 2),
        )(x, kernels, small.bias)
    want = jax.grad(
        loss(lambda a, k, b: reference_euler_dense(a, k, b, h)),
        argnums=(0, 1, 2),
    )(x, kernels, small.bias)
    for g_got, g_want in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=1e-5, atol=1e-5
        )


def test_forward_matches_xla_scan():
    x, blocks = make_case()
    kernels = dense_from_blocks(blocks)
    h = 0.125
    want = reference_euler_dense(x, kernels, blocks.bias, h)
    with pltpu.force_tpu_interpret_mode():
        got = fused_euler_dense(x, kernels, blocks.bias, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_uneven_batch_tile():
    # batch that does not divide the default tile evenly
    x, blocks = make_case(batch=6, height=4, width=4, channels=4, layers=2)
    kernels = dense_from_blocks(blocks)
    want = reference_euler_dense(x, kernels, blocks.bias, 0.5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_euler_dense(x, kernels, blocks.bias, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_backward_matches_xla_grads():
    """Full VJP parity: state cotangent and dense-kernel/bias grads."""
    x, blocks = make_case(batch=2, height=6, width=6, channels=4, layers=3)
    kernels = dense_from_blocks(blocks)
    h = 0.2

    def loss_ref(x, kernels, biases):
        y = reference_euler_dense(x, kernels, biases, h)
        return jnp.sum(y * jnp.cos(y))  # nontrivial cotangent

    def loss_pallas(x, kernels, biases):
        y = fused_euler_dense(x, kernels, biases, h)
        return jnp.sum(y * jnp.cos(y))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernels, blocks.bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, kernels, blocks.bias)
    for g_got, g_want, name in zip(got, want, ("x", "kernels", "bias")):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=1e-4, rtol=1e-4,
            err_msg=name,
        )


@pytest.mark.slow
def test_packed_param_grads_through_materialize():
    """Gradients must fold back onto the packed antisymmetric parameters
    identically to the XLA path (the mirror fold-back of the scatter VJP).

    Slow stage: the Pallas kernel is a documented negative result off the
    production path (docs/RESULTS.md section 6), and this is its single
    most compile-expensive parity test; the forward/backward parity tests
    stay in the default stage."""
    x, blocks = make_case(batch=2, height=4, width=4, channels=4, layers=2)
    h, gamma = 0.25, 0.1

    def loss_pallas(blocks):
        return jnp.sum(fused_euler_3x3(x, blocks, h, gamma) ** 2)

    def loss_ref(blocks):
        kernels = dense_from_blocks(blocks, gamma)
        return jnp.sum(reference_euler_dense(x, kernels, blocks.bias, h) ** 2)

    want = jax.grad(loss_ref)(blocks)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pallas)(blocks)
    for g_got, g_want, name in zip(got, want, blocks._fields):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=1e-4, rtol=1e-4,
            err_msg=name,
        )


def test_model_use_pallas_flag_matches_xla():
    """The model's use_pallas config must produce the same forward outputs."""
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )

    cfg_x = cifar10_single_block_config(num_layers=3, num_filters=8)
    cfg_p = cifar10_single_block_config(
        num_layers=3, num_filters=8, use_pallas=True
    )
    m_x = build_single_block_resnet(cfg_x)
    m_p = build_single_block_resnet(cfg_p)
    params, state = m_x.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3), maxval=255.0)
    y_x, _ = m_x.apply(params, state, x, return_logits=True)
    with pltpu.force_tpu_interpret_mode():
        y_p, _ = m_p.apply(params, state, x, return_logits=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-4)
