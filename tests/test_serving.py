"""Serving export/load tests (the tf.saved_model-analogue surface,
reference training/training.py:781-858 second backend)."""

import json
import os

import numpy as np
import jax
import pytest

from differential_equations_resnet_tpu.models import (
    SingleBlockResNetConfig,
    build_single_block_resnet,
)
from differential_equations_resnet_tpu.utils.serving import (
    export_model,
    load_exported,
)


def tiny_model():
    return build_single_block_resnet(
        SingleBlockResNetConfig(
            image_shape=(8, 8, 3),
            num_stages=2,
            blocks_per_stage=(2,),
            filters_per_block=(4,),
            strides=((1, 1),),
            num_classes=5,
            h=0.5,
            subtract_mean=127.5,
            divide_by_stddev=127.5,
        )
    )


def test_export_and_load_stablehlo_roundtrip(tmp_path):
    model = tiny_model()
    params, state = model.init(jax.random.key(0))
    out = export_model(
        model, str(tmp_path / "export"), params=params, model_state=state,
        batch_size=3,
    )
    assert os.path.isfile(os.path.join(out, "config.json"))
    assert os.path.isfile(os.path.join(out, "params.pkl"))
    assert os.path.isfile(os.path.join(out, "forward.hlo"))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (3, 8, 8, 3)).astype(np.float32)
    expected, _ = model.apply(params, state, x)

    predict, manifest = load_exported(out)
    assert manifest["batch_size"] == 3
    np.testing.assert_allclose(predict(x), np.asarray(expected), rtol=1e-6)

    # Fallback path: rebuild from config + params (no StableHLO).
    predict2, _ = load_exported(out, prefer_stablehlo=False)
    np.testing.assert_allclose(predict2(x), np.asarray(expected), rtol=1e-6)


def test_export_from_checkpoint(tmp_path):
    from differential_equations_resnet_tpu.train import Checkpointer
    from differential_equations_resnet_tpu.train.train_step import (
        create_train_state,
    )

    model = tiny_model()
    state = create_train_state(model, jax.random.key(1))
    ckpt = Checkpointer(str(tmp_path / "ckpt"), backend="pickle")
    path = ckpt.save(state, 7)

    out = export_model(
        model, str(tmp_path / "export"), checkpoint=path, batch_size=2,
        stablehlo=False, seed=1,
    )
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
    expected, _ = model.apply(state.params, state.model_state, x)
    predict, _ = load_exported(out)
    np.testing.assert_allclose(predict(x), np.asarray(expected), rtol=1e-6)


def test_cli_export_smoke(tmp_path, capsys):
    from differential_equations_resnet_tpu.cli import main

    out_dir = str(tmp_path / "served")
    assert main([
        "export", out_dir, "--num-layers", "2", "--num-filters", "8",
        "--batch-size", "1",
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    predict, manifest = load_exported(res["export_dir"])
    probs = predict(np.zeros((1, 32, 32, 3), np.float32))
    assert probs.shape == (1, 10)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
