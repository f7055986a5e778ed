"""Weight surgery: pickling and depth-doubling continuation.

Rebuild of `model_utils/weight_utils.py:23-79`.  The reference's
depth-doubling ("load an (l+2)-layer net's weights into a (2l+2)-layer net,
each middle layer duplicated into two consecutive layers") is the ODE
refinement step: halve h, double the number of integrator steps, warm-start
from the coarse solution.  On stacked (L, ...) parameters this is a single
``repeat`` along the layer axis — a pytree transform instead of per-layer
Keras `set_weights` calls.

`export_reference_weights` / `import_reference_weights` translate between the
packed parameterization and the reference's list-of-{kernel, bias} pickles
(dense (3,3,C,C) kernels), so weights can round-trip with the original repo.
"""

from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.models.blocks import ConvParams
from differential_equations_resnet_tpu.models.single_block_resnet import (
    SingleBlockResNetConfig,
    stage_plans,
)
from differential_equations_resnet_tpu.ops.antisymmetric import (
    Antisym3x3Params,
    AntisymKxKParams,
    materialize_3x3,
    materialize_kxk,
    pack_3x3,
    pack_kxk,
)


def convert_antisym_layout(params, to: str):
    """Convert every antisymmetric-conv parameter leaf in a pytree between
    the packed ``(…, 3, 3, P)`` and dense-lower ``(…, 3, 3, C, C)`` layouts
    (``to`` = 'dense' | 'packed'); all other leaves pass through.

    Migration shim for checkpoints/pickles saved before the bottleneck
    family switched its mid-convs to the dense layout: `Checkpointer.restore`
    raises a clear treedef mismatch on a layout change (it never silently
    mis-assigns leaves); run the loaded pytree through this converter to
    restore across the change.  Conversions are bit-exact
    (`dense_from_packed` / `packed_from_dense`)."""
    from differential_equations_resnet_tpu.ops.antisymmetric import (
        Antisym3x3DenseParams,
        dense_from_packed,
        packed_from_dense,
    )

    if to not in ("dense", "packed"):
        raise ValueError(f"`to` must be 'dense' or 'packed', got {to!r}.")

    def convert(node):
        if isinstance(node, Antisym3x3Params) and to == "dense":
            return dense_from_packed(node)
        if isinstance(node, Antisym3x3DenseParams) and to == "packed":
            return packed_from_dense(node)
        return node

    both = (Antisym3x3Params, Antisym3x3DenseParams)
    return jax.tree.map(
        convert, params, is_leaf=lambda n: isinstance(n, both)
    )


def pickle_model_weights(params, save_filename: str) -> None:
    """Pickle a params pytree (NumPy-ified).  Generic replacement for the
    reference `pickle_model_weights` (model_utils/weight_utils.py:23-39)."""
    numpy_tree = jax.tree.map(lambda x: np.asarray(x), params)
    with open(save_filename, "wb") as f:
        pickle.dump(numpy_tree, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_pickled_weights(load_filename: str):
    with open(load_filename, "rb") as f:
        return pickle.load(f)


def double_model_depth(params, config: SingleBlockResNetConfig):
    """Depth-doubling continuation: (new_params, new_config) with every
    stacked residual layer duplicated into two consecutive layers
    (repeat-interleave along the layer axis) and h halved so the ODE final
    time T = h * L is preserved (the reference's key config invariant).

    Functional equivalent of `double_load_weights`
    (model_utils/weight_utils.py:41-79): stem and head are shared, each
    middle layer's weights appear twice."""
    new_stages = []
    for sp in params["stages"]:
        new_sp = dict(sp)
        for key in ("blocks", "blocks_bn"):
            if key in sp and sp[key] is not None:
                new_sp[key] = jax.tree.map(
                    lambda x: jnp.repeat(x, 2, axis=0), sp[key]
                )
        new_stages.append(new_sp)
    new_params = dict(params, stages=new_stages)
    new_config = SingleBlockResNetConfig(
        **{
            **{f: getattr(config, f) for f in config.__dataclass_fields__},
            "blocks_per_stage": tuple(2 * b for b in config.blocks_per_stage),
            "h": config.h / 2.0,
        }
    )
    return new_params, new_config


def double_load_weights(model_params, weights_pickle_file: str, config=None):
    """API-parity name: load pickled (l+2)-layer params and return the
    doubled (2l+2)-layer params (+ config if given)."""
    saved = load_pickled_weights(weights_pickle_file)
    if config is None:
        new_stages = []
        for sp in saved["stages"]:
            new_sp = dict(sp)
            for key in ("blocks", "blocks_bn"):
                if key in sp and sp[key] is not None:
                    new_sp[key] = jax.tree.map(
                        lambda x: jnp.repeat(jnp.asarray(x), 2, axis=0), sp[key]
                    )
            new_stages.append(new_sp)
        return dict(saved, stages=new_stages)
    return double_model_depth(saved, config)


# ---------------------------------------------------------------------------
# Reference-format interop (list of {'kernel', 'bias'} per trainable layer)
# ---------------------------------------------------------------------------


def export_reference_weights(
    params, config: SingleBlockResNetConfig
) -> List[dict]:
    """Produce the reference's pickle payload: one {'kernel','bias'} dict per
    trainable layer in graph order (stem, residual layers, head), with
    antisymmetric layers materialized to dense (3,3,C,C) kernels."""
    out = [
        {"kernel": np.asarray(params["stem"].kernel),
         "bias": np.asarray(params["stem"].bias)}
    ]
    for plan, sp in zip(stage_plans(config), params["stages"]):
        if plan.has_conv_block:
            out.append(
                {"kernel": np.asarray(sp["conv_main"].kernel),
                 "bias": np.asarray(sp["conv_main"].bias)}
            )
            out.append(
                {"kernel": np.asarray(sp["conv_shortcut"].kernel),
                 "bias": np.asarray(sp["conv_shortcut"].bias)}
            )
        blocks = sp["blocks"]
        if blocks is None:
            continue
        num = jax.tree.leaves(blocks)[0].shape[0]
        for layer in range(num):
            block = jax.tree.map(lambda x: x[layer], blocks)
            if isinstance(block, Antisym3x3Params):
                kernel = materialize_3x3(block, gamma=config.gamma)
                out.append(
                    {"kernel": np.asarray(kernel), "bias": np.asarray(block.bias)}
                )
            elif isinstance(block, AntisymKxKParams):
                kernel = materialize_kxk(
                    block, config.kernel_size, gamma=config.gamma,
                    antisymmetric=config.kernel_type == "antisymmetric",
                )
                out.append(
                    {"kernel": np.asarray(kernel), "bias": np.asarray(block.bias)}
                )
            else:
                out.append(
                    {"kernel": np.asarray(block.kernel),
                     "bias": np.asarray(block.bias)}
                )
    if config.include_top:
        out.append(
            {"kernel": np.asarray(params["head"].kernel),
             "bias": np.asarray(params["head"].bias)}
        )
    return out


def import_reference_weights(
    weights: List[dict], params, config: SingleBlockResNetConfig
):
    """Load a reference-format weights list into a params pytree of the same
    architecture (dense antisymmetric kernels are re-packed via `pack_3x3`).
    Returns new params."""
    weights = list(weights)
    new_params = dict(params)
    it = iter(weights)

    def take():
        w = next(it)
        return jnp.asarray(w["kernel"]), jnp.asarray(w["bias"])

    kernel, bias = take()
    new_params["stem"] = ConvParams(kernel=kernel, bias=bias)
    new_stages = []
    for plan, sp in zip(stage_plans(config), params["stages"]):
        new_sp = dict(sp)
        if plan.has_conv_block:
            kernel, bias = take()
            new_sp["conv_main"] = ConvParams(kernel=kernel, bias=bias)
            kernel, bias = take()
            new_sp["conv_shortcut"] = ConvParams(kernel=kernel, bias=bias)
        blocks = sp["blocks"]
        if blocks is not None:
            num = jax.tree.leaves(blocks)[0].shape[0]
            layers = []
            for _ in range(num):
                kernel, bias = take()
                if isinstance(blocks, Antisym3x3Params):
                    layers.append(pack_3x3(kernel, bias))
                elif isinstance(blocks, AntisymKxKParams):
                    layers.append(pack_kxk(
                        kernel, bias,
                        antisymmetric=config.kernel_type == "antisymmetric",
                    ))
                else:
                    layers.append(ConvParams(kernel=kernel, bias=bias))
            new_sp["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        new_stages.append(new_sp)
    new_params["stages"] = new_stages
    if config.include_top:
        kernel, bias = take()
        from differential_equations_resnet_tpu.models.blocks import DenseParams

        new_params["head"] = DenseParams(kernel=kernel, bias=bias)
    return new_params
