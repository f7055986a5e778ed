"""Throughput sweep harness tests (tiny shapes, CPU)."""

import jax.numpy as jnp
import numpy as np

from differential_equations_resnet_tpu.experiments.sweeps import (
    imagenet32_config,
    measure_train_throughput,
    width_depth_sweep,
)
from differential_equations_resnet_tpu.parallel import create_mesh


def test_imagenet32_config():
    cfg = imagenet32_config(num_layers=4, num_filters=8)
    assert cfg.num_classes == 1000
    assert cfg.compute_dtype == jnp.bfloat16
    assert cfg.h == 2.0


def test_measure_train_throughput_single_device():
    cfg = imagenet32_config(num_layers=2, num_filters=8, compute_dtype=jnp.float32)
    out = measure_train_throughput(cfg, batch_size=8, steps=2, warmup=1)
    assert out["steps_per_sec"] > 0
    assert out["images_per_sec"] == out["steps_per_sec"] * 8


def test_width_depth_sweep_dp_mesh():
    mesh = create_mesh((8,), ("data",))
    results = width_depth_sweep(
        widths=(8,),
        depths=(2,),
        batch_size=16,
        mesh=mesh,
        num_classes=10,
        compute_dtype=jnp.float32,
        steps=2,
    )
    assert (8, 2) in results
    assert np.isfinite(results[(8, 2)]["step_ms"])
