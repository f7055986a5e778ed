"""Mesh/sharding tests on the 8-device virtual CPU platform (SURVEY.md
section 4 item 3): data-parallel train step must match single-device numerics
and actually shard the batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.models import (
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from differential_equations_resnet_tpu.train import (
    create_train_state,
    make_adam,
    make_eval_step,
    make_train_step,
)


def test_virtual_devices_present():
    assert jax.device_count() >= 8


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == jax.device_count()
    mesh2 = create_mesh((4, 2), ("data", "model"))
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh((128,), ("data",))


def test_shard_batch_places_shards():
    mesh = create_mesh((8,), ("data",))
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch(mesh, x)
    assert sharded.sharding == batch_sharding(mesh)
    # Each device holds 1/8 of the batch.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(1, 4)}
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_data_parallel_step_matches_single_device():
    """One DP step over an 8-device mesh must produce the same new params and
    metrics as the single-device step (XLA inserts the gradient psum)."""
    model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=2, num_filters=8)
    )
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    x = np.random.default_rng(0).uniform(0, 255, (16, 32, 32, 3)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 10, (16,))

    single_step = make_train_step(model, tx, donate=False)
    s1, m1, g1 = single_step(state, jnp.asarray(x), jnp.asarray(y), 1e-3)

    mesh = create_mesh((8,), ("data",))
    dp_step = make_train_step(model, tx, mesh=mesh, donate=False)
    state_r = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=shard_params(mesh, state.opt_state),
    )
    xs, ys = shard_batch(mesh, (x, y))
    s8, m8, g8 = dp_step(state_r, xs, ys, 1e-3)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["correct"]), float(m8["correct"]))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g8), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # Params stay replicated after the update.
    assert s8.params["stem"].kernel.sharding.is_fully_replicated


def test_data_parallel_eval_step():
    model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=2, num_filters=8)
    )
    state = create_train_state(model, jax.random.key(0))
    mesh = create_mesh((8,), ("data",))
    eval_step = make_eval_step(model, mesh=mesh)
    x = np.ones((8, 32, 32, 3), np.float32)
    y = np.zeros((8,), np.int64)
    xs, ys = shard_batch(mesh, (x, y))
    params = shard_params(mesh, state.params)
    metrics = eval_step(params, state.model_state, xs, ys)
    assert float(metrics["count"]) == 8.0


def test_two_axis_mesh_dp_tp_compiles():
    """A ('data','model') mesh: batch sharded over data; channel-sharded
    Dense head via explicit sharding constraint still compiles + runs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh((4, 2), ("data", "model"))
    model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=2, num_filters=8)
    )
    params, mstate = model.init(jax.random.key(0))
    # Shard the head kernel's output dim over 'model'.
    head = params["head"]
    params = dict(params)
    params["head"] = head._replace(
        kernel=jax.device_put(head.kernel, NamedSharding(mesh, P(None, "model"))),
        bias=jax.device_put(head.bias, NamedSharding(mesh, P("model"))),
    )
    for key in ("stem", "stages"):
        params[key] = shard_params(mesh, params[key])

    @jax.jit
    def forward(params, x):
        out, _ = model.apply(params, mstate, x, return_logits=True)
        return out

    x = jax.device_put(
        np.ones((8, 32, 32, 3), np.float32), NamedSharding(mesh, P("data"))
    )
    out = forward(params, x)
    assert out.shape == (8, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_shard_map_train_step_matches_jit_dp():
    """Explicit shard_map+psum DP step == declarative jit-sharded DP step
    == single-device step (SURVEY.md section 2.2 item 3)."""
    import jax.numpy as jnp
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )
    from differential_equations_resnet_tpu.parallel import (
        create_mesh,
        make_shard_map_train_step,
    )
    from differential_equations_resnet_tpu.train import (
        create_train_state,
        make_adam,
        make_train_step,
    )

    model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=3, num_filters=8)
    )
    tx = make_adam()
    key = jax.random.key(11)
    rng = np.random.default_rng(2)
    B = 16
    x = jnp.asarray(rng.uniform(0, 255, (B, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (B,)))

    s_ref = create_train_state(model, key, tx)
    ref_step = make_train_step(model, tx, donate=False)
    s_ref, m_ref, g_ref = ref_step(s_ref, x, y, 1e-3)

    mesh = create_mesh((8,), ("data",))
    s_sm = create_train_state(model, key, tx)
    sm_step = make_shard_map_train_step(model, tx, mesh, donate=False)
    s_sm, m_sm, g_sm = sm_step(s_sm, x, y, jnp.asarray(1e-3, jnp.float32))

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_sm["loss"]), rtol=1e-5
    )
    assert float(m_sm["correct"]) == float(m_ref["correct"])
    assert float(m_sm["count"]) == B
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_sm), rtol=1e-4, atol=1e-7
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        s_ref.params, s_sm.params,
    )


def test_shard_map_step_includes_l2_and_rejects_batch_norm():
    """The explicit-collective step shares build_loss_fn (L2 included) and
    refuses BatchNorm models (per-shard stats != global-batch stats)."""
    from differential_equations_resnet_tpu.parallel import (
        create_mesh,
        make_shard_map_train_step,
    )
    from differential_equations_resnet_tpu.train import (
        create_train_state,
        make_adam,
        make_train_step,
    )

    w = 1e-2
    model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=2, num_filters=8,
                                    l2_regularization=w)
    )
    tx = make_adam()
    key = jax.random.key(5)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 255, (16, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (16,)))

    s_ref = create_train_state(model, key, tx)
    _, m_ref, _ = make_train_step(model, tx, donate=False)(s_ref, x, y, 1e-3)

    mesh = create_mesh((8,), ("data",))
    s_sm = create_train_state(model, key, tx)
    sm_step = make_shard_map_train_step(model, tx, mesh, donate=False)
    _, m_sm, _ = sm_step(s_sm, x, y, jnp.asarray(1e-3, jnp.float32))
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_sm["loss"]), rtol=1e-5
    )

    from differential_equations_resnet_tpu.models import SingleBlockResNetConfig

    bn_model = build_single_block_resnet(
        SingleBlockResNetConfig(
            num_stages=2, blocks_per_stage=(2,), filters_per_block=(8,),
            strides=((1, 1),), use_max_pooling=(False,), num_classes=10,
            use_batch_norm=True,
        )
    )
    with pytest.raises(ValueError, match="BatchNorm"):
        make_shard_map_train_step(bn_model, tx, mesh)


@pytest.mark.parametrize("s2d_block", [0, 2])
def test_conv_trunk_tensor_parallel_matches_replicated(s2d_block):
    """Channel-TP on the conv trunk (dense kernels sharded on c_out after the
    skew mirror fold, activations channel-sharded between layers) must match
    the unsharded model's loss and gradients (SURVEY.md section 2.3 row 3)."""
    mesh = create_mesh((2, 4), ("data", "model"))
    base = dict(num_layers=4, num_filters=32, s2d_block=s2d_block,
                s2d_force=s2d_block > 1)  # CPU backend: gate declines by default
    config_tp = cifar10_single_block_config(tp_mesh=mesh, **base)
    config_ref = cifar10_single_block_config(**base)
    model_tp = build_single_block_resnet(config_tp)
    model_ref = build_single_block_resnet(config_ref)
    params, state = model_ref.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (8,)))

    from differential_equations_resnet_tpu.train.train_step import (
        cross_entropy_from_logits,
    )

    def make_loss(model):
        def loss(p, xx, yy):
            logits, _ = model.apply(p, state, xx, return_logits=True)
            return cross_entropy_from_logits(logits, yy)

        return loss

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    vag_tp = jax.jit(
        jax.value_and_grad(make_loss(model_tp)),
        in_shardings=(replicated, data, None),
    )
    l_tp, g_tp = vag_tp(
        jax.device_put(params, replicated), jax.device_put(x, data), y
    )
    l_ref, g_ref = jax.jit(jax.value_and_grad(make_loss(model_ref)))(params, x, y)

    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-6)
    # fp32 with cross-device reduction order differences: tolerate ~1e-5 abs.
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=3e-5
        )


def test_conv_trunk_tp_actually_shards_kernels():
    """The compiled TP step must carry channel shardings on the trunk (not
    silently replicate everything): the optimized HLO contains a c_out-dim
    tile of the (L, 3, 3, C, C) dense kernel stack."""
    mesh = create_mesh((2, 4), ("data", "model"))
    config = cifar10_single_block_config(
        num_layers=4, num_filters=32, s2d_block=0, tp_mesh=mesh
    )
    model = build_single_block_resnet(config)
    params, state = model.init(jax.random.key(0))

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def fwd(p, xx):
        logits, _ = model.apply(p, state, xx, return_logits=True)
        return logits.sum()

    lowered = jax.jit(fwd, in_shardings=(replicated, data)).lower(
        jax.device_put(params, replicated),
        jax.device_put(jnp.zeros((8, 32, 32, 3)), data),
    )
    hlo = lowered.compile().as_text()
    # The dense kernel stack is (4, 3, 3, 32, 32); sharded on c_out over 4
    # devices each shard is (4, 3, 3, 32, 8).
    assert "f32[4,3,3,32,8]" in hlo, "trunk kernel not channel-sharded"


def test_sharded_checkpoint_roundtrip(tmp_path):
    """preserve_shardings=True: a TP/DP-sharded TrainState checkpoints
    WITHOUT a host gather and restores directly onto each leaf's devices
    with its sharding intact (the scale path for states beyond host
    memory)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from differential_equations_resnet_tpu.train import Checkpointer

    model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=4, num_filters=8)
    )
    tx = make_adam()
    mesh = create_mesh((4, 2), ("data", "model"))
    state = create_train_state(model, jax.random.key(0), tx)
    # Mixed placement: head sharded over 'model', the rest replicated —
    # the dryrun's TP layout.
    head_sharded = state.params["head"]._replace(
        kernel=jax.device_put(
            state.params["head"].kernel, NamedSharding(mesh, P(None, "model"))
        ),
        bias=jax.device_put(
            state.params["head"].bias, NamedSharding(mesh, P("model"))
        ),
    )
    replicated = NamedSharding(mesh, P())
    state = jax.tree.map(lambda a: jax.device_put(a, replicated), state)
    state = state._replace(params=dict(state.params, head=head_sharded))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, step=7, metrics={"loss": 1.0}, preserve_shardings=True)

    # Restore into a freshly placed target of the same shardings.
    target = create_train_state(model, jax.random.key(1), tx)
    target = jax.tree.map(lambda a: jax.device_put(a, replicated), target)
    target = target._replace(
        params=dict(
            target.params,
            head=target.params["head"]._replace(
                kernel=jax.device_put(
                    target.params["head"].kernel,
                    NamedSharding(mesh, P(None, "model")),
                ),
                bias=jax.device_put(
                    target.params["head"].bias, NamedSharding(mesh, P("model"))
                ),
            ),
        )
    )
    restored = ckpt.restore(target, preserve_shardings=True)

    assert restored.params["head"].kernel.sharding.is_equivalent_to(
        target.params["head"].kernel.sharding,
        target.params["head"].kernel.ndim,
    )
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"].kernel),
        np.asarray(state.params["head"].kernel),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.params["stem"].kernel),
        np.asarray(state.params["stem"].kernel),
    )
    assert int(restored.step) == int(state.step)

    # The pickle backend covers the same surface via device_put placement.
    pk = Checkpointer(str(tmp_path / "pk"), backend="pickle")
    with pytest.raises(ValueError, match="orbax"):
        pk.save(state, step=1, preserve_shardings=True)
    pk.save(state, step=1)
    restored_pk = pk.restore(target, preserve_shardings=True)
    assert restored_pk.params["head"].bias.sharding.is_equivalent_to(
        target.params["head"].bias.sharding,
        target.params["head"].bias.ndim,
    )
    np.testing.assert_array_equal(
        np.asarray(restored_pk.params["head"].bias),
        np.asarray(state.params["head"].bias),
    )
