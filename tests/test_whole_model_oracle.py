"""Whole-model numerics parity against an independent fp64 NumPy oracle
(SURVEY.md section 4 item 2): the full reference forward — normalization ->
stem conv + relu -> L Euler blocks -> GAP -> dense -> softmax CE
(`models/tfkeras_resnets.py:28-94,547-602`, `training/training.py:295`) —
re-executed loop-for-loop in NumPy fp64, pinned against
`apply_single_block_resnet`, plus a finite-difference gradient cross-check
of the JAX backward pass (including the euler_relu_step custom VJP) against
the oracle loss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.models import (
    SingleBlockResNetConfig,
    build_single_block_resnet,
)
from differential_equations_resnet_tpu.train.train_step import (
    cross_entropy_from_logits,
)

from reference_numpy import (
    numpy_single_block_forward,
    numpy_softmax_ce,
)


def tiny_config(kernel_type="antisymmetric", gamma=0.0, **overrides):
    kwargs = dict(
        image_shape=(8, 8, 3),
        kernel_type=kernel_type,
        h=0.3,
        gamma=gamma,
        num_stages=2,
        blocks_per_stage=(3,),
        filters_per_block=(4,),
        strides=((1, 1),),
        num_classes=5,
        subtract_mean=127.5,
        divide_by_stddev=127.5,
    )
    kwargs.update(overrides)
    return SingleBlockResNetConfig(**kwargs)


def _setup(config, batch=4, seed=0):
    model = build_single_block_resnet(config)
    params, state = model.init(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 255, (batch, *config.image_shape)).astype(np.float32)
    y = rng.integers(0, config.num_classes, (batch,))
    return model, params, state, x, y


@pytest.mark.parametrize(
    "kernel_type,gamma",
    [("antisymmetric", 0.0), ("antisymmetric", 0.2), ("regular", 0.0),
     ("centrosymmetric", 0.0)],
)
def test_whole_model_forward_matches_numpy_oracle(kernel_type, gamma):
    config = tiny_config(kernel_type, gamma)
    model, params, state, x, y = _setup(config)

    logits, _ = model.apply(params, state, x, return_logits=True)
    probs, _ = model.apply(params, state, x)
    params_np = jax.tree.map(np.asarray, params)
    ref_probs, ref_logits = numpy_single_block_forward(params_np, x, config)

    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), ref_probs, rtol=2e-5, atol=2e-5)

    loss = float(cross_entropy_from_logits(jnp.asarray(logits), jnp.asarray(y)))
    ref_loss = numpy_softmax_ce(ref_logits, y)
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-5)


def test_whole_model_forward_oracle_deeper_antisymmetric():
    """A deeper (L=8) run accumulates integrator state through the scan —
    catches layer-axis ordering bugs a 3-layer test could miss."""
    config = tiny_config(blocks_per_stage=(8,), h=8.0 / 8)
    model, params, state, x, y = _setup(config, seed=3)
    logits, _ = model.apply(params, state, x, return_logits=True)
    params_np = jax.tree.map(np.asarray, params)
    _, ref_logits = numpy_single_block_forward(params_np, x, config)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize(
    "kernel_type", ["antisymmetric", "regular", "centrosymmetric"]
)
def test_gradient_matches_finite_difference_of_oracle(kernel_type):
    """Directional derivatives of the fp64 oracle loss (central differences)
    must match <grad, v> from the JAX backward pass — an independent check of
    the whole backward, including the euler_relu_step custom VJP."""
    config = tiny_config(kernel_type)
    model, params, state, x, y = _setup(config, batch=2, seed=1)
    y = jnp.asarray(y)

    def loss_fn(p):
        logits, _ = model.apply(p, state, x, return_logits=True)
        return cross_entropy_from_logits(logits, y)

    grads = jax.grad(loss_fn)(params)
    grad_leaves = [np.asarray(g, np.float64) for g in jax.tree.leaves(grads)]

    params_np = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    leaves, treedef = jax.tree.flatten(params_np)

    def oracle_loss(leaves64):
        p = jax.tree.unflatten(treedef, leaves64)
        _, logits = numpy_single_block_forward(p, x, config)
        return numpy_softmax_ce(logits, np.asarray(y))

    rng = np.random.default_rng(7)
    eps = 1e-5
    for _ in range(3):
        direction = [rng.standard_normal(l.shape) for l in leaves]
        norm = np.sqrt(sum((d * d).sum() for d in direction))
        direction = [d / norm for d in direction]
        plus = [l + eps * d for l, d in zip(leaves, direction)]
        minus = [l - eps * d for l, d in zip(leaves, direction)]
        fd = (oracle_loss(plus) - oracle_loss(minus)) / (2 * eps)
        analytic = sum((g * d).sum() for g, d in zip(grad_leaves, direction))
        # relu kinks make FD noisy only exactly at z=0 (measure-zero); the
        # fp32 backward is the dominant error term.
        np.testing.assert_allclose(analytic, fd, rtol=5e-3, atol=1e-7)


@pytest.mark.parametrize("integrator", ["midpoint", "rk4"])
def test_whole_model_oracle_multieval_forward_and_fd_gradient(integrator):
    """The multi-eval integrators against the fp64 oracle (round 4: they now
    run the bool-mask custom-VJP field + packed fast path,
    models/single_block_resnet.py::_apply_identity_blocks_multieval):
    forward logits parity, plus finite-difference directional derivatives of
    the oracle loss against the JAX backward — an independent check of the
    conv_relu_field custom VJP threaded through the Runge-Kutta stages."""
    config = tiny_config(integrator=integrator)
    model, params, state, x, y = _setup(config, batch=2, seed=2)
    y = jnp.asarray(y)

    logits, _ = model.apply(params, state, x, return_logits=True)
    params_np = jax.tree.map(np.asarray, params)
    _, ref_logits = numpy_single_block_forward(params_np, x, config)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, rtol=2e-5, atol=2e-5
    )

    def loss_fn(p):
        logits, _ = model.apply(p, state, x, return_logits=True)
        return cross_entropy_from_logits(logits, y)

    grads = jax.grad(loss_fn)(params)
    grad_leaves = [np.asarray(g, np.float64) for g in jax.tree.leaves(grads)]
    params64 = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    leaves, treedef = jax.tree.flatten(params64)

    def oracle_loss(leaves64):
        p = jax.tree.unflatten(treedef, leaves64)
        _, logits = numpy_single_block_forward(p, x, config)
        return numpy_softmax_ce(logits, np.asarray(y))

    rng = np.random.default_rng(11)
    eps = 1e-5
    for _ in range(2):
        direction = [rng.standard_normal(l.shape) for l in leaves]
        norm = np.sqrt(sum((d * d).sum() for d in direction))
        direction = [d / norm for d in direction]
        plus = [l + eps * d for l, d in zip(leaves, direction)]
        minus = [l - eps * d for l, d in zip(leaves, direction)]
        fd = (oracle_loss(plus) - oracle_loss(minus)) / (2 * eps)
        analytic = sum((g * d).sum() for g, d in zip(grad_leaves, direction))
        np.testing.assert_allclose(analytic, fd, rtol=5e-3, atol=1e-7)


def test_whole_model_forward_oracle_centrosymmetric_5x5():
    """The general k x k path at kernel_size=5: whole-model fp64 oracle
    parity (scalar-loop kernel assembly + 5x5 SAME conv, independent of the
    repo's vectorized scatter and lax.conv)."""
    config = tiny_config(kernel_type="centrosymmetric", kernel_size=5)
    model, params, state, x, y = _setup(config, seed=4)
    logits, _ = model.apply(params, state, x, return_logits=True)
    params_np = jax.tree.map(np.asarray, params)
    _, ref_logits = numpy_single_block_forward(params_np, x, config)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=5e-5, atol=5e-5)
