"""Weight-surgery tests: pickling, depth-doubling continuation (the ODE
refinement transform), and reference-format interop."""

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.models import (
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.utils import (
    double_load_weights,
    double_model_depth,
    export_reference_weights,
    import_reference_weights,
    load_pickled_weights,
    pickle_model_weights,
)


def make_model(num_layers=4, **kw):
    return build_single_block_resnet(
        cifar10_single_block_config(num_layers=num_layers, num_filters=8, **kw)
    )


def test_pickle_roundtrip(tmp_path):
    model = make_model()
    params, _ = model.init(jax.random.key(0))
    path = str(tmp_path / "w.pkl")
    pickle_model_weights(params, path)
    loaded = load_pickled_weights(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_double_model_depth_duplicates_layers_and_halves_h():
    model = make_model(num_layers=3)
    params, state = model.init(jax.random.key(0))
    new_params, new_config = double_model_depth(params, model.config)
    assert new_config.blocks_per_stage == (6,)
    assert new_config.h == model.config.h / 2
    old = params["stages"][0]["blocks"]
    new = new_params["stages"][0]["blocks"]
    for leaf_old, leaf_new in zip(jax.tree.leaves(old), jax.tree.leaves(new)):
        assert leaf_new.shape[0] == 2 * leaf_old.shape[0]
        # Layer l duplicated into 2l and 2l+1.
        np.testing.assert_array_equal(np.asarray(leaf_new[0]), np.asarray(leaf_old[0]))
        np.testing.assert_array_equal(np.asarray(leaf_new[1]), np.asarray(leaf_old[0]))
        np.testing.assert_array_equal(np.asarray(leaf_new[4]), np.asarray(leaf_old[2]))

    # The doubled model is a valid warm start: outputs stay close to the
    # coarse model (halved h, doubled steps approximates the same flow).
    doubled = build_single_block_resnet(new_config)
    _, dstate = doubled.init(jax.random.key(1))
    x = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3), maxval=255.0)
    y_coarse, _ = model.apply(params, state, x, return_logits=True)
    y_fine, _ = doubled.apply(new_params, dstate, x, return_logits=True)
    assert float(jnp.abs(y_coarse - y_fine).max()) < 0.5 * float(
        jnp.abs(y_coarse).max()
    )


def test_double_load_weights_from_pickle(tmp_path):
    model = make_model(num_layers=2)
    params, _ = model.init(jax.random.key(0))
    path = str(tmp_path / "w.pkl")
    pickle_model_weights(params, path)
    doubled = double_load_weights(None, path)
    assert jax.tree.leaves(doubled["stages"][0]["blocks"])[0].shape[0] == 4


def test_reference_format_roundtrip():
    """Packed -> dense reference list -> packed must be the identity, and the
    dense kernels must be the materialized antisymmetric kernels."""
    model = make_model(num_layers=3)
    params, state = model.init(jax.random.key(0))
    ref = export_reference_weights(params, model.config)
    # stem + 3 blocks + head
    assert len(ref) == 5
    assert ref[0]["kernel"].shape == (3, 3, 3, 8)
    assert ref[1]["kernel"].shape == (3, 3, 8, 8)
    # Dense kernel is channel-antisymmetric: K[:,:,i,j] == -rot180(K[:,:,j,i]).
    k = ref[1]["kernel"]
    np.testing.assert_allclose(
        k[:, :, 0, 1], -k[::-1, ::-1, 1, 0], atol=1e-6
    )
    params2 = import_reference_weights(ref, params, model.config)
    x = jnp.ones((1, 32, 32, 3))
    y1, _ = model.apply(params, state, x, return_logits=True)
    y2, _ = model.apply(params2, state, x, return_logits=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_convert_antisym_layout_roundtrip():
    """Packed<->dense layout migration is bit-exact over a full bottleneck
    params pytree (checkpoints saved before the dense switch restore via
    convert_antisym_layout)."""
    from differential_equations_resnet_tpu.models import build_resnet, resnet_preset
    from differential_equations_resnet_tpu.ops import (
        Antisym3x3DenseParams,
        Antisym3x3Params,
    )
    from differential_equations_resnet_tpu.utils.weight_utils import (
        convert_antisym_layout,
    )

    from differential_equations_resnet_tpu.models.bottleneck_resnet import (
        BottleneckResNetConfig,
    )

    base = resnet_preset(
        "resnet50", num_classes=10, image_shape=(32, 32, 3),
        antisymmetric_mid=True,
    )
    # Shrink widths 8x: the conversion logic is width-independent and the
    # full preset's init dominates the test's wall time.
    filters = tuple(
        (f0 // 8, None, f2 // 8) for (f0, _, f2) in base.filters_per_block
    )
    cfg = BottleneckResNetConfig(
        **{**base.__dict__, "blocks_per_stage": (2, 1, 1, 1),
           "filters_per_block": filters}
    )
    model = build_resnet(cfg)
    params, _ = model.init(jax.random.key(0))

    packed = convert_antisym_layout(params, to="packed")
    leaves = [n for n in jax.tree.leaves(
        packed, is_leaf=lambda n: isinstance(n, Antisym3x3Params))
        if isinstance(n, Antisym3x3Params)]
    assert leaves, "expected packed antisym leaves after conversion"

    dense = convert_antisym_layout(packed, to="dense")
    assert jax.tree.structure(dense) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(dense), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
