"""Model assembly tests: shapes, parameter counts (exact reference parity),
residual semantics, jit-ability, and the bottleneck family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.models import (
    SingleBlockResNetConfig,
    build_resnet,
    build_single_block_resnet,
    cifar10_single_block_config,
    resnet_preset,
)
from differential_equations_resnet_tpu.models.bottleneck_resnet import (
    BottleneckResNetConfig,
)
from differential_equations_resnet_tpu.models.single_block_resnet import stage_plans


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def make_cifar_model(num_layers=4, kernel_type="antisymmetric", **kw):
    return build_single_block_resnet(
        cifar10_single_block_config(
            num_layers=num_layers, num_filters=16, kernel_type=kernel_type, **kw
        )
    )


def test_cifar_config_matches_notebook():
    cfg = cifar10_single_block_config()
    assert cfg.h == 8.0 / 64
    assert cfg.blocks_per_stage == (64,)
    assert cfg.num_stages == 2
    plans = stage_plans(cfg)
    assert len(plans) == 1 and not plans[0].has_conv_block
    assert plans[0].num_identity == 64


@pytest.mark.parametrize("kernel_type", ["antisymmetric", "regular"])
def test_single_block_forward_shapes(kernel_type):
    model = make_cifar_model(kernel_type=kernel_type)
    params, state = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), maxval=255.0)
    probs, _ = model.apply(params, state, x)
    assert probs.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0, rtol=1e-5)
    logits, _ = model.apply(params, state, x, return_logits=True)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits)), np.asarray(probs), rtol=2e-5, atol=1e-6
    )


def test_single_block_param_count_parity():
    """Trainable parameter counts must equal the reference models exactly:
    antisymmetric block = 4C + 9*C(C-1)/2 + C; regular block = 9C^2 + C."""
    channels, layers = 16, 64
    anti = make_cifar_model(layers, "antisymmetric")
    regular = make_cifar_model(layers, "regular")
    p_anti, _ = anti.init(jax.random.key(0))
    p_reg, _ = regular.init(jax.random.key(0))
    stem = 3 * 3 * 3 * channels + channels
    head = channels * 10 + 10
    block_anti = 4 * channels + 9 * channels * (channels - 1) // 2 + channels
    block_reg = 9 * channels * channels + channels
    assert n_params(p_anti) == stem + layers * block_anti + head
    assert n_params(p_reg) == stem + layers * block_reg + head


def test_euler_residual_semantics():
    """With h=0 the identity blocks must be exact no-ops: output equals the
    stem+head applied alone (residual y + h*f(y) with h=0)."""
    cfg = cifar10_single_block_config(num_layers=6, num_filters=8)
    cfg0 = SingleBlockResNetConfig(
        **{
            **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
            "h": 0.0,
        }
    )
    model = build_single_block_resnet(cfg0)
    params, state = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), maxval=255.0)
    y0, _ = model.apply(params, state, x, return_logits=True)

    # A 1-layer model with the same stem/head weights gives the same output.
    cfg1 = SingleBlockResNetConfig(
        **{
            **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
            "h": 0.0,
            "blocks_per_stage": (1,),
        }
    )
    model1 = build_single_block_resnet(cfg1)
    params1, state1 = model1.init(jax.random.key(0))
    params1["stem"], params1["head"] = params["stem"], params["head"]
    params1["stages"][0]["blocks"] = jax.tree.map(
        lambda a: a[:1], params["stages"][0]["blocks"]
    )
    y1, _ = model1.apply(params1, state1, x, return_logits=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


@pytest.mark.parametrize("integrator", ["euler", "midpoint", "rk4"])
def test_integrator_variants_run_and_differ(integrator):
    model = make_cifar_model(4, integrator=integrator)
    params, state = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), maxval=255.0)
    y, _ = jax.jit(lambda p, s, x: model.apply(p, s, x, return_logits=True))(
        params, state, x
    )
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_gradients_flow_to_all_params():
    model = make_cifar_model(3)
    params, state = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), maxval=255.0)
    labels = jnp.array([1, 3])

    def loss_fn(p):
        logits, _ = model.apply(p, state, x, return_logits=True)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(2), labels]
        )

    grads = jax.grad(loss_fn)(params)
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        assert np.isfinite(np.asarray(g)).all(), path
        assert float(jnp.sum(jnp.abs(g))) > 0.0, path


def test_multi_stage_with_pooling_and_conv_blocks():
    cfg = SingleBlockResNetConfig(
        image_shape=(8, 8, 3),
        kernel_type="antisymmetric",
        num_stages=4,
        blocks_per_stage=(2, 2, 2),
        filters_per_block=(8, 16, 32),
        strides=((1, 1), (2, 2), (2, 2)),
        use_max_pooling=(False, False, False, False),
        num_classes=10,
        h=0.5,
    )
    plans = stage_plans(cfg)
    assert [p.has_conv_block for p in plans] == [False, True, True]
    x = jnp.ones((1, 8, 8, 3))

    # One block per stage: the structural claims (pooling plumbing, BN
    # stats moving) don't need depth, and this is the only BN+pooling model
    # the suite compiles — keep it minimal.
    cfg_pool = SingleBlockResNetConfig(
        image_shape=(8, 8, 3),
        kernel_type="regular",
        num_stages=3,
        blocks_per_stage=(1, 1),
        filters_per_block=(8, 8),
        strides=((1, 1), (1, 1)),
        use_max_pooling=(True, True, False, False),
        num_classes=10,
        use_batch_norm=True,
    )
    model = build_single_block_resnet(cfg_pool)
    params, state = model.init(jax.random.key(0))
    y, new_state = model.apply(params, state, x, train=True)
    assert y.shape == (1, 10)
    # BN running stats must move in train mode.
    before = np.asarray(state["stem_bn"].mean)
    after = np.asarray(new_state["stem_bn"].mean)
    assert not np.allclose(before, after)


# ---------------------------------------------------------------------------
# Bottleneck family
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("version", [1, 1.5])
def test_bottleneck_resnet50_shapes(version):
    cfg = resnet_preset(
        "resnet50", num_classes=10, image_shape=(32, 32, 3), version=version
    )
    model = build_resnet(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.ones((1, 32, 32, 3))
    y, _ = model.apply(params, state, x)
    assert y.shape == (1, 10)


@pytest.mark.slow
def test_bottleneck_antisymmetric_mid():
    cfg = resnet_preset(
        "resnet50", num_classes=10, image_shape=(32, 32, 3), antisymmetric_mid=True
    )
    # Antisymmetric mid conv keeps channels: mid filter entry must be None.
    assert cfg.filters_per_block[0][1] is None
    model = build_resnet(cfg)
    params, state = model.init(jax.random.key(0))
    y, _ = model.apply(params, state, jnp.ones((1, 32, 32, 3)), train=True)
    assert y.shape == (1, 10)


@pytest.mark.slow
def test_bottleneck_block_counts():
    cfg = resnet_preset("resnet101", num_classes=5, image_shape=(32, 32, 3))
    assert cfg.blocks_per_stage == (3, 4, 23, 3)
    model = build_resnet(cfg)
    params, _ = model.init(jax.random.key(0))
    # Stage 3 has 22 stacked identity blocks.
    stacked = params["stages"][2]["identity_blocks"]
    assert jax.tree.leaves(stacked)[0].shape[0] == 22


def test_bottleneck_tiny_forward_all_variants():
    """Fast default-stage bottleneck coverage: one block per stage exercises
    the conv-block/identity-block structure, v1 vs v1.5 striding, and the
    antisymmetric mid-conv — the full ResNet-50/101 presets (same code, more
    blocks) run in the slow stage."""
    # Two stages suffice for the structural coverage (stage 1 = stride-1
    # conv block + identity, stage 2 = the strided conv block where v1 and
    # v1.5 differ); the 4-stage presets run in the slow stage.  Halving the
    # stages halves this test's six whole-model compile costs (it was the
    # suite's single slowest test at 4 stages).
    for version, antisym in ((1, False), (1.5, False), (1, True)):
        filters = tuple(
            (f0 // 8, None if antisym else f1 // 8, f2 // 8)
            for (f0, f1, f2) in ((64, 64, 256), (128, 128, 512))
        )
        cfg = BottleneckResNetConfig(
            num_classes=7,
            image_shape=(32, 32, 3),
            blocks_per_stage=(1, 1),
            filters_per_block=filters,
            version=version,
            kernel_type="antisymmetric" if antisym else "regular",
        )
        model = build_resnet(cfg)
        params, state = model.init(jax.random.key(0))
        y, _ = jax.jit(lambda p, s, x: model.apply(p, s, x, train=True))(
            params, state, jnp.ones((1, 32, 32, 3))
        )
        assert y.shape == (1, 7)


def test_bottleneck_preset_validation():
    with pytest.raises(ValueError):
        resnet_preset("resnet18", num_classes=10)
    with pytest.raises(ValueError):
        BottleneckResNetConfig(num_classes=10, version=2)


def test_euler_relu_step_custom_vjp_matches_autodiff():
    """The mask-residual custom VJP must be grad-identical to plain autodiff
    of y + h*relu(conv(y,K)+b), for y, kernel, and bias."""
    from differential_equations_resnet_tpu.ops.conv import (
        conv2d_same,
        euler_relu_step,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(4, 8, 8, 6)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 6)), jnp.float32) * 0.2
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32) * 0.1
    g = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
    h = 0.37

    def reference(y, k, b):
        return y + h * jax.nn.relu(conv2d_same(y, k, bias=b))

    out_ref, vjp_ref = jax.vjp(reference, y, k, b)
    out_new, vjp_new = jax.vjp(lambda y, k, b: euler_relu_step(y, k, b, h), y, k, b)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_new))
    for a, bb in zip(vjp_ref(g), vjp_new(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6)


def test_fp32_large_batch_cliff_warning():
    """The trace-time fp32 conv-cliff advisory (docs/RESULTS.md section 6c)
    fires at 64F/b256/fp32 on a TPU platform, and NOT at b128, bf16, CPU, or
    narrow trunks; under DP it keys on PER-DEVICE batch (VERDICT r3 item 3)."""
    import warnings as _warnings

    from differential_equations_resnet_tpu.experiments import imagenet32_config

    def warned(batch, needle, **overrides):
        config = imagenet32_config(num_layers=2, **overrides)
        model = build_single_block_resnet(config)
        # Abstract init too: the advisory fires at TRACE time, so the whole
        # check runs under eval_shape with zero compiles (this test was a
        # 22 s suite hot spot when init compiled per config).
        params, state = jax.eval_shape(model.init, jax.random.key(0))
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            jax.eval_shape(
                lambda p, s, x: model.apply(p, s, x, return_logits=True),
                params, state, jnp.zeros((batch, 32, 32, 3), jnp.float32),
            )
        return any(needle in str(w.message) for w in rec)

    def fired(batch, **overrides):
        return warned(batch, "fp32 conv-lowering cliff", **overrides)

    fp32 = dict(compute_dtype=jnp.float32, device_platform="tpu")
    assert fired(256, num_filters=64, **fp32)
    assert not fired(128, num_filters=64, **fp32)
    assert not fired(
        256, num_filters=64, compute_dtype=jnp.bfloat16, device_platform="tpu"
    )
    # The measurement is a TPU conv-emitter property: no warning on CPU.
    assert not fired(256, num_filters=64, compute_dtype=jnp.float32)
    # Narrow trunks (the headline C=16) are NOT in the cliff regime.
    assert not fired(256, num_filters=16, **fp32)
    # DP mesh context: global b=2048 over 8 devices = 256/device -> fires;
    # global b=256 over 8 devices = 32/device -> silent.
    assert fired(2048, num_filters=64, data_axis_size=8, **fp32)
    assert not fired(256, num_filters=64, data_axis_size=8, **fp32)


def test_b512_conv_degradation_warning():
    """The dtype-agnostic per-device-batch>=512 advisory (docs/RESULTS.md
    section 6e finding 3) fires for BOTH dtypes at wide trunks, keys on
    per-device rows under DP, stays silent on CPU / narrow trunks / b<=384,
    and supersedes (not duplicates) the fp32-b256 advisory at b512."""
    import warnings as _warnings

    from differential_equations_resnet_tpu.experiments import imagenet32_config

    def messages(batch, **overrides):
        config = imagenet32_config(num_layers=2, **overrides)
        model = build_single_block_resnet(config)
        # Abstract init too: the advisory fires at TRACE time, so the whole
        # check runs under eval_shape with zero compiles (this test was a
        # 22 s suite hot spot when init compiled per config).
        params, state = jax.eval_shape(model.init, jax.random.key(0))
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            jax.eval_shape(
                lambda p, s, x: model.apply(p, s, x, return_logits=True),
                params, state, jnp.zeros((batch, 32, 32, 3), jnp.float32),
            )
        return [str(w.message) for w in rec]

    def b512_fired(batch, **overrides):
        return any("512 at trunk width" in m for m in messages(batch, **overrides))

    tpu = dict(device_platform="tpu")
    assert b512_fired(512, num_filters=64, compute_dtype=jnp.bfloat16, **tpu)
    assert b512_fired(512, num_filters=128, compute_dtype=jnp.float32, **tpu)
    assert not b512_fired(384, num_filters=128, compute_dtype=jnp.bfloat16, **tpu)
    assert not b512_fired(512, num_filters=16, compute_dtype=jnp.bfloat16, **tpu)
    # CPU platform: silent (TPU conv-emitter property).
    assert not b512_fired(512, num_filters=64, compute_dtype=jnp.bfloat16)
    # DP: global 4096 over 8 devices = 512/device fires; 2048/8 = 256 doesn't.
    assert b512_fired(4096, num_filters=64, data_axis_size=8,
                      compute_dtype=jnp.bfloat16, **tpu)
    assert not b512_fired(2048, num_filters=64, data_axis_size=8,
                          compute_dtype=jnp.bfloat16, **tpu)
    # At fp32 b512 exactly ONE advisory fires (the b512 one, not both).
    msgs = messages(512, num_filters=64, compute_dtype=jnp.float32, **tpu)
    assert sum("conv lowering" in m or "conv-lowering" in m for m in msgs) == 1


def test_int8_multi_eval_integrator_warning():
    """int8_forward + midpoint/rk4 fires the euler-specific-win advisory
    (docs/RESULTS.md 6f round 5: midpoint 1.03x, rk4 0.99x) on TPU only;
    euler and CPU stay silent."""
    import warnings as _warnings

    def fired(**overrides):
        config = SingleBlockResNetConfig(
            image_shape=(8, 8, 3), num_stages=2, blocks_per_stage=(2,),
            filters_per_block=(8,), strides=((1, 1),), num_classes=4,
            use_batch_norm=False, int8_forward=True, **overrides,
        )
        model = build_single_block_resnet(config)
        params, state = jax.eval_shape(model.init, jax.random.key(0))
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            jax.eval_shape(
                lambda p, s, x: model.apply(p, s, x, return_logits=True),
                params, state, jnp.zeros((2, 8, 8, 3), jnp.float32),
            )
        return any("euler-specific" in str(w.message) for w in rec)

    assert fired(integrator="midpoint", device_platform="tpu")
    assert fired(integrator="rk4", device_platform="tpu")
    assert not fired(integrator="euler", device_platform="tpu")
    assert not fired(integrator="midpoint")  # CPU: silent


def test_int8_divergent_backward_warning():
    """'dgrad'/'full' at trunk width >= 64 fire the measured-divergence
    advisory on ANY platform (architectural mechanism, RESULTS 6g r5);
    'wgrad'/'ste' and narrow widths stay silent."""
    import warnings as _warnings

    def fired(num_filters, backward):
        config = SingleBlockResNetConfig(
            image_shape=(8, 8, 3), num_stages=2, blocks_per_stage=(2,),
            filters_per_block=(num_filters,), strides=((1, 1),),
            num_classes=4, use_batch_norm=False,
            int8_forward=True, int8_backward=backward,
        )
        model = build_single_block_resnet(config)
        params, state = jax.eval_shape(model.init, jax.random.key(0))
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            jax.eval_shape(
                lambda p, s, x: model.apply(p, s, x, return_logits=True),
                params, state, jnp.zeros((2, 8, 8, 3), jnp.float32),
            )
        return any("measurably DIVERGES" in str(w.message) for w in rec)

    assert fired(64, "dgrad")
    assert fired(128, "full")
    assert not fired(128, "wgrad")
    assert not fired(128, "ste")
    assert not fired(8, "dgrad")  # narrow test/research configs: silent


def test_int8_full_nan_regime_warning():
    """The int8-'full' no-remat near-HBM advisory (docs/RESULTS.md section
    6g: >~11 GB of saved int8 residuals per device measured as NaN-from-
    step-2) fires at 176Lx128F b256 and NOT at the validated 160L boundary,
    under remat, on CPU, or for 'dgrad' (fp residuals, different capacity)."""
    import warnings as _warnings

    from differential_equations_resnet_tpu.experiments import imagenet32_config

    import dataclasses

    def fired(num_layers, batch=256, **overrides):
        config = imagenet32_config(
            num_layers=num_layers, num_filters=128,
            compute_dtype=jnp.bfloat16, **overrides,
        )
        model = build_single_block_resnet(config)
        params, state = jax.eval_shape(model.init, jax.random.key(0))
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            jax.eval_shape(
                lambda p, s, x: model.apply(p, s, x, return_logits=True),
                params, state, jnp.zeros((batch, 32, 32, 3), jnp.float32),
            )
        return any("measured-clean boundary" in str(w.message) for w in rec)

    full_tpu = dict(
        int8_forward=True, int8_backward="full", device_platform="tpu"
    )
    assert fired(176, **full_tpu)
    assert not fired(160, **full_tpu)  # validated clean at 10.7 GB
    assert not fired(176, remat=True, **full_tpu)  # the documented fix
    assert not fired(176, int8_forward=True, int8_backward="dgrad",
                     device_platform="tpu")
    # TP channel-shards the trunk activations and hence the saved int8
    # residuals: 176L at tp=2 is ~6 GB/device -> silent (review r5).
    from differential_equations_resnet_tpu.parallel.mesh import create_mesh

    assert not fired(176, tp_mesh=create_mesh((2,), ("model",)), **full_tpu)
    # 'wgrad' shares 'full''s int8 residual layout but was measured CLEAN
    # at 192L/12.9 GB no-remat (round 5) -> the advisory must NOT fire:
    # the defect needs the int8 data-gradient conv, not the stack alone.
    assert not fired(176, int8_forward=True, int8_backward="wgrad",
                     device_platform="tpu")
    assert not fired(192, int8_forward=True, int8_backward="wgrad",
                     device_platform="tpu")
    assert not fired(176, int8_forward=True, int8_backward="full")  # CPU
    # DP divides the residual footprint by the data axis: 176L at global
    # b=256 over 8 devices is 32/device (1.5 GB) -> silent; the same mesh
    # at global b=2048 is 256/device (12 GB) -> fires.
    assert not fired(176, data_axis_size=8, **full_tpu)
    assert fired(176, batch=2048, data_axis_size=8, **full_tpu)

    # Multi-stage accumulation (ADVICE r4): two 88L stages are 5.9 GB each
    # (neither crosses alone) but 11.8 GB together -> the whole-trunk sum
    # fires, where a per-stage check stayed silent.
    def fired_cfg(config, batch=256):
        model = build_single_block_resnet(config)
        params, state = jax.eval_shape(model.init, jax.random.key(0))
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            jax.eval_shape(
                lambda p, s, x: model.apply(p, s, x, return_logits=True),
                params, state, jnp.zeros((batch, 32, 32, 3), jnp.float32),
            )
        return any("measured-clean boundary" in str(w.message) for w in rec)

    two_stage = SingleBlockResNetConfig(
        image_shape=(32, 32, 3), num_stages=3, blocks_per_stage=(88, 88),
        filters_per_block=(128, 128), strides=((1, 1), (1, 1)),
        num_classes=1000, compute_dtype=jnp.bfloat16, **full_tpu,
    )
    assert fired_cfg(two_stage)
    one_half = dataclasses.replace(two_stage, blocks_per_stage=(88,),
                                   filters_per_block=(128,),
                                   strides=((1, 1),), num_stages=2)
    assert not fired_cfg(one_half)


def test_conv_relu_field_custom_vjp_matches_autodiff():
    """The bool-mask custom VJP of the ODE field relu(conv(y,K)+b) — the
    per-stage evaluation of the midpoint/rk4 fast path — must be
    grad-identical to plain autodiff, for y, kernel, and bias."""
    from differential_equations_resnet_tpu.ops.conv import (
        conv2d_same,
        conv_relu_field,
    )

    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=(4, 8, 8, 6)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 6)), jnp.float32) * 0.2
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32) * 0.1
    g = jnp.asarray(rng.normal(size=y.shape), jnp.float32)

    def reference(y, k, b):
        return jax.nn.relu(conv2d_same(y, k, bias=b))

    out_ref, vjp_ref = jax.vjp(reference, y, k, b)
    out_new, vjp_new = jax.vjp(conv_relu_field, y, k, b)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_new))
    for a, bb in zip(vjp_ref(g), vjp_new(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6
        )
    with pytest.raises(ValueError):
        conv_relu_field(y, k, None)


def test_single_block_euler_fast_path_grad_parity():
    """The model's euler fast path (custom-VJP scan) produces the same loss
    and gradients as the generic integrate() path (midpoint machinery
    unchanged) — checked by comparing against a manual generic re-execution."""
    from differential_equations_resnet_tpu.models.single_block_resnet import (
        _dense_blocks,
        _dense_field,
    )
    from differential_equations_resnet_tpu.ops.integrators import integrate

    # s2d_block=0: this test isolates the euler custom-VJP fast path against
    # integrate(); the s2d packed layout has its own parity suite (test_s2d).
    config = cifar10_single_block_config(num_layers=3, num_filters=8, s2d_block=0)
    model = build_single_block_resnet(config)
    params, state = model.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (8,)))

    def loss_fast(params):
        logits, _ = model.apply(params, state, x, train=True, return_logits=True)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(8), y]
        )

    # Generic path: recompute the stage through integrate() manually.
    def loss_generic(params):
        from differential_equations_resnet_tpu.models.blocks import (
            dense as dense_fc,
            global_average_pool,
        )
        from differential_equations_resnet_tpu.ops.conv import conv2d_same

        z = (x.astype(jnp.float32) - 127.5) / 127.5
        z = jax.nn.relu(
            conv2d_same(z, params["stem"].kernel, bias=params["stem"].bias)
        )
        blocks = _dense_blocks(params["stages"][0]["blocks"], config)
        z = integrate(_dense_field, z, blocks, config.h, method="euler")
        z = global_average_pool(z)
        logits = dense_fc(z, params["head"])
        return jnp.mean(-jax.nn.log_softmax(logits)[jnp.arange(8), y])

    l1, g1 = jax.value_and_grad(loss_fast)(params)
    l2, g2 = jax.value_and_grad(loss_generic)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        ),
        g1, g2,
    )


def test_reference_kwargs_builders():
    """build_single_block_resnet / build_resnet accept the reference's exact
    keyword surface (models/tfkeras_resnets.py:427-444,606-621), and the
    get_*_build_function factory forms exist."""
    from differential_equations_resnet_tpu.models import (
        build_resnet,
        build_single_block_resnet,
        get_resnet_build_function,
        get_single_block_resnet_build_function,
    )

    model = build_single_block_resnet(
        image_shape=(32, 32, 3),
        kernel_type="antisymmetric",
        kernel_size=3,
        h=0.5,
        gamma=0.1,
        num_stages=2,
        blocks_per_stage=[4],
        filters_per_block=[8],
        strides=[(1, 1)],
        include_top=True,
        fc_activation="softmax",
        num_classes=10,
        use_batch_norm=False,
        use_max_pooling=[False],
        l2_regularization=0.0,
        subtract_mean=127.5,
        divide_by_stddev=127.5,
        verbose=False,
    )
    params, state = model.init(jax.random.key(0))
    out, _ = model.apply(params, state, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 10)

    rn = build_resnet(
        image_shape=(64, 64, 3), preset="resnet50", num_classes=7,
        kernel_type="regular", version=1.5,
    )
    assert rn.config.blocks_per_stage == (3, 4, 6, 3)
    assert rn.config.version == 1.5

    factory = get_single_block_resnet_build_function(
        image_shape=(32, 32, 3), num_stages=2, blocks_per_stage=[2],
        filters_per_block=[8], strides=[(1, 1)], use_max_pooling=[False],
        num_classes=10,
    )
    assert factory().config.blocks_per_stage == (2,)
    assert get_resnet_build_function(
        image_shape=(64, 64, 3), num_classes=3
    )().config.num_classes == 3

    with pytest.raises(TypeError, match="not both"):
        build_single_block_resnet(
            cifar10_single_block_config(num_layers=2, num_filters=8), h=1.0
        )


def test_euler_relu_step_rejects_none_bias():
    """bias=None must fail fast with a clear message, not an opaque
    custom_vjp pytree-structure error under grad."""
    from differential_equations_resnet_tpu.ops.conv import euler_relu_step

    y = jnp.ones((1, 4, 4, 2))
    k = jnp.ones((3, 3, 2, 2))
    with pytest.raises(ValueError, match="bias"):
        euler_relu_step(y, k, None, 0.1)


def test_centrosymmetric_model_matches_regular_on_materialized_kernels():
    """kernel_type='centrosymmetric' (the reference general layer's
    antisymmetric=False mode, layers/tfkeras_layer_Conv2DAntisymmetric.py:67)
    must produce the same forward as a 'regular' model loaded with the
    materialized dense kernels — proving both the dense path and the
    reference-format export/import for the k x k family."""
    import dataclasses

    from differential_equations_resnet_tpu.utils.weight_utils import (
        export_reference_weights,
        import_reference_weights,
    )

    cfg_c = SingleBlockResNetConfig(
        image_shape=(8, 8, 3),
        kernel_type="centrosymmetric",
        kernel_size=3,
        h=0.25,
        num_stages=2,
        blocks_per_stage=(3,),
        filters_per_block=(6,),
        strides=((1, 1),),
        num_classes=5,
    )
    model_c = build_single_block_resnet(cfg_c)
    params, state = model_c.init(jax.random.key(0))
    weights = export_reference_weights(params, cfg_c)

    cfg_r = dataclasses.replace(cfg_c, kernel_type="regular")
    model_r = build_single_block_resnet(cfg_r)
    params_r, state_r = model_r.init(jax.random.key(1))
    params_r = import_reference_weights(weights, params_r, cfg_r)

    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 255, (2, 8, 8, 3)), jnp.float32
    )
    out_c, _ = model_c.apply(params, state, x, return_logits=True)
    out_r, _ = model_r.apply(params_r, state_r, x, return_logits=True)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_r), rtol=1e-5, atol=1e-6
    )

    # Round-trip: importing the exported dense kernels back into the
    # centrosymmetric model reproduces the packed params exactly.
    params_back = import_reference_weights(weights, params, cfg_c)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_centrosymmetric_k5_init_and_interop_roundtrip():
    """kernel_size=5 config surface: init + reference-format export/import
    round trip (the k=5 materialization math itself is oracle-tested at the
    ops level in tests/test_antisymmetric.py; the forward path differs from
    k=3 only in the conv window)."""
    from differential_equations_resnet_tpu.utils.weight_utils import (
        export_reference_weights,
        import_reference_weights,
    )

    cfg = SingleBlockResNetConfig(
        image_shape=(8, 8, 3),
        kernel_type="centrosymmetric",
        kernel_size=5,
        h=0.25,
        num_stages=2,
        blocks_per_stage=(2,),
        filters_per_block=(5,),
        strides=((1, 1),),
        num_classes=4,
    )
    model = build_single_block_resnet(cfg)
    params, _ = model.init(jax.random.key(0))
    blocks = params["stages"][0]["blocks"]
    assert blocks.cross.shape == (2, 5, 5, 10)   # C*(C-1)/2 = 10 pairs
    assert blocks.diag.shape == (2, 13, 5)       # k(k-1)/2 + k//2 + center
    weights = export_reference_weights(params, cfg)
    assert weights[1]["kernel"].shape == (5, 5, 5, 5)
    params_back = import_reference_weights(weights, params, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_centrosymmetric_kernel_properties_through_model():
    """The materialized kernels of a centrosymmetric model satisfy the
    reference constraints: diagonal blocks are centrosymmetric
    (K = rot180(K), trainable center), cross pairs are the negated
    180-degree rotations of each other."""
    from differential_equations_resnet_tpu.ops.antisymmetric import (
        materialize_kxk,
    )

    cfg = SingleBlockResNetConfig(
        image_shape=(8, 8, 3),
        kernel_type="centrosymmetric",
        kernel_size=3,
        h=0.25,
        num_stages=2,
        blocks_per_stage=(2,),
        filters_per_block=(5,),
        strides=((1, 1),),
        num_classes=4,
    )
    model = build_single_block_resnet(cfg)
    params, _ = model.init(jax.random.key(3))
    blocks = params["stages"][0]["blocks"]
    kernels = np.asarray(materialize_kxk(blocks, 3, antisymmetric=False))
    for layer in range(kernels.shape[0]):
        k = kernels[layer]
        for i in range(5):
            np.testing.assert_array_equal(k[:, :, i, i],
                                          k[::-1, ::-1, i, i])
            for j in range(i + 1, 5):
                np.testing.assert_array_equal(k[:, :, j, i],
                                              -k[::-1, ::-1, i, j])


def test_centrosymmetric_train_step_and_telemetry():
    """Full train step on the centrosymmetric model: finite loss/grads and
    gradient-norm telemetry width matching gradient_metric_names."""
    from differential_equations_resnet_tpu.train import (
        create_train_state,
        gradient_metric_names,
        make_adam,
        make_train_step,
    )

    model = build_single_block_resnet(
        cifar10_single_block_config(
            num_layers=3, num_filters=8, kernel_type="centrosymmetric"
        )
    )
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (4,)))
    new_state, metrics, grad_norms = step(state, x, y, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    names = gradient_metric_names(model.config)
    assert grad_norms.shape == (len(names),)
    assert np.all(np.isfinite(np.asarray(grad_norms)))
    assert np.all(np.asarray(grad_norms)[1:] > 0)
