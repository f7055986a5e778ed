"""Pipeline parallelism over depth (parallel/pipeline.py): the GPipe-style
shard_map + ppermute schedule must match the single-device integrator scan
exactly — forward and gradients — on the virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from differential_equations_resnet_tpu.ops.pallas.fused_integrator import (
    reference_euler_dense,
)
from differential_equations_resnet_tpu.parallel import pipeline_blocks_apply

L, B, H, W, C = 8, 8, 4, 4, 8
h = 0.25


def _mesh(n, name="pipe"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)), jnp.float32)
    kernels = jnp.asarray(rng.normal(0, 0.2, (L, 3, 3, C, C)), jnp.float32)
    biases = jnp.asarray(rng.normal(0, 0.1, (L, C)), jnp.float32)
    return x, kernels, biases


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_forward_matches_scan(stages, microbatches):
    x, kernels, biases = _data()
    ref = reference_euler_dense(x, kernels, biases, h)
    mesh = _mesh(stages)
    out = pipeline_blocks_apply(
        kernels, biases, x, h, mesh, num_microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_scan():
    """jax.grad through the pipeline (ppermute transposes to the reverse
    schedule) must equal the single-device gradients."""
    x, kernels, biases = _data(1)
    mesh = _mesh(4)

    def loss_pipe(kernels, biases, x):
        y = pipeline_blocks_apply(kernels, biases, x, h, mesh, num_microbatches=4)
        return jnp.sum(y * y)

    def loss_ref(kernels, biases, x):
        return jnp.sum(reference_euler_dense(x, kernels, biases, h) ** 2)

    g_pipe = jax.grad(loss_pipe, argnums=(0, 1, 2))(kernels, biases, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(kernels, biases, x)
    for a, b in zip(g_pipe, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_pipeline_rejects_indivisible():
    x, kernels, biases = _data()
    mesh = _mesh(4)
    with pytest.raises(ValueError, match="divide evenly"):
        pipeline_blocks_apply(kernels[:6], biases[:6], x, h, mesh)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_blocks_apply(kernels, biases, x, h, mesh, num_microbatches=3)


@pytest.mark.parametrize("s2d_block", [0, 2])
def test_model_level_pipeline_matches_direct(s2d_block):
    """pp_mesh in the model config: the full model (stem -> pipelined
    identity stack -> head) must match the unpipelined model on the same
    params — forward logits and parameter gradients (incl. the packed s2d
    composition)."""
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )
    from differential_equations_resnet_tpu.train.train_step import (
        cross_entropy_from_logits,
    )

    mesh = _mesh(4)
    common = dict(num_layers=8, num_filters=8, s2d_block=s2d_block,
                  s2d_force=s2d_block > 1)  # CPU: gate declines by default
    model = build_single_block_resnet(cifar10_single_block_config(**common))
    model_pp = build_single_block_resnet(
        cifar10_single_block_config(**common, pp_mesh=mesh, pp_microbatches=4)
    )
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (8, 8, 8, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, (8,)))

    out, _ = model.apply(params, state, x, return_logits=True)
    out_pp, _ = model_pp.apply(params, state, x, return_logits=True)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out), rtol=1e-5, atol=1e-5)

    def loss(m):
        def fn(p):
            logits, _ = m.apply(p, state, x, return_logits=True)
            return cross_entropy_from_logits(logits, labels)

        return fn

    g = jax.grad(loss(model))(params)
    g_pp = jax.grad(loss(model_pp))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_model_pipeline_config_validation():
    from differential_equations_resnet_tpu.models import (
        cifar10_single_block_config,
    )

    mesh = _mesh(2)
    with pytest.raises(ValueError, match="pipeline parallelism"):
        cifar10_single_block_config(pp_mesh=mesh, integrator="rk4")


def test_pipeline_composes_with_dp():
    """dp x pp on a (2, 4) mesh: batch sharded over 'data', layers over
    'pipe' — each data-shard runs its own 4-stage pipeline."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    x, kernels, biases = _data(2)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    ref = reference_euler_dense(x, kernels, biases, h)

    out = pipeline_blocks_apply(
        kernels, biases,
        jax.device_put(x, NamedSharding(mesh, P("data"))),
        h, mesh, axis_name="pipe", num_microbatches=2,
        batch_spec=P("data"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("spec", [
    {"pipe": 4, "model": 2, "batch": None},   # tp x pp
    {"pipe": 2, "model": 2, "batch": "data"},  # dp x tp x pp (3-axis)
])
def test_pipeline_tensor_parallel_composition(spec):
    """tp x pp: channel TP inside each pipeline stage (per-layer all_gather
    over the tp axis, Megatron-style) must match the single-device scan —
    forward AND gradients — including the 3-axis dp x tp x pp composition
    with the batch sharded over a 'data' axis."""
    from jax.sharding import PartitionSpec as P

    x, kernels, biases = _data(seed=7)
    axes = [a for a in ("data", "pipe", "model")
            if a == "pipe" or a == "model" or spec["batch"] == a]
    sizes = {"pipe": spec["pipe"], "model": spec["model"], "data": 2}
    names = tuple(a for a in ("data", "pipe", "model")
                  if a in ("pipe", "model") or spec["batch"] == a)
    shape = tuple(sizes[a] for a in names)
    n = int(np.prod(shape))
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(shape), names)
    batch_spec = P(spec["batch"]) if spec["batch"] else P()

    ref_val = jnp.sum(reference_euler_dense(x, kernels, biases, h) ** 2)
    ref_grads = jax.grad(
        lambda k, b: jnp.sum(reference_euler_dense(x, k, b, h) ** 2),
        argnums=(0, 1),
    )(kernels, biases)

    def loss(k, b):
        y = pipeline_blocks_apply(
            k, b, x, h, mesh, num_microbatches=2,
            batch_spec=batch_spec, tp_axis="model",
        )
        return jnp.sum(y * y)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(kernels, biases)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-4)
    for g, rg in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(rg), rtol=1e-3, atol=1e-5
        )


def test_pipeline_tp_axis_validates_channel_divisibility():
    x, kernels, biases = _data()
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pipe", "model"))
    with pytest.raises(ValueError, match="divide evenly over"):
        # 3 channels over a 2-way TP axis.
        pipeline_blocks_apply(
            kernels[:, :, :, :3, :3], biases[:, :3], x[..., :3], h, mesh,
            tp_axis="model",
        )


@pytest.mark.parametrize("s2d_block", [0, 2])
def test_model_level_tp_pp_composition(s2d_block):
    """pp_mesh + tp_mesh on ONE two-axis mesh: the full model runs the
    identity stack pipelined over 'pipe' with channel TP over 'model' inside
    each stage — forward logits and parameter gradients must match the plain
    model on the same params (incl. the s2d packed composition)."""
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )
    from differential_equations_resnet_tpu.train.train_step import (
        cross_entropy_from_logits,
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("pipe", "model"))
    common = dict(num_layers=8, num_filters=8, s2d_block=s2d_block,
                  s2d_force=s2d_block > 1)  # CPU: gate declines by default
    model = build_single_block_resnet(cifar10_single_block_config(**common))
    model_tp_pp = build_single_block_resnet(
        cifar10_single_block_config(
            **common, pp_mesh=mesh, pp_microbatches=4,
            tp_mesh=mesh, tp_axis="model",
        )
    )
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (8, 8, 8, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, (8,)))

    out, _ = model.apply(params, state, x, return_logits=True)
    out_c, _ = model_tp_pp.apply(params, state, x, return_logits=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out),
                               rtol=1e-5, atol=1e-5)

    def loss(m):
        def fn(p):
            logits, _ = m.apply(p, state, x, return_logits=True)
            return cross_entropy_from_logits(logits, labels)

        return fn

    g = jax.grad(loss(model))(params)
    g_c = jax.grad(loss(model_tp_pp))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_model_config_rejects_mismatched_tp_pp_meshes():
    from differential_equations_resnet_tpu.models import (
        cifar10_single_block_config,
    )

    mesh_a = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    mesh_b = Mesh(np.array(jax.devices()[2:4]), ("model",))
    with pytest.raises(ValueError, match="ONE mesh"):
        cifar10_single_block_config(
            num_layers=4, pp_mesh=mesh_a, tp_mesh=mesh_b
        )
