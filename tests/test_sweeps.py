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


def test_width_depth_sweep_remat_derived_from_capacity(monkeypatch):
    """remat=None enables remat ONLY past the measured no-remat capacity
    (~5e9 saved elements/device), never by a bare depth heuristic — a silent
    depth>=64 rule contaminated round-4 measurements (docs/RESULTS.md
    section 6e retraction).  Explicit True/False always wins."""
    from differential_equations_resnet_tpu.experiments import sweeps

    seen = {}

    def stub(config, batch_size, mesh=None, steps=30):
        key = (config.filters_per_block[0], config.blocks_per_stage[0])
        seen[key] = config.remat
        return {"steps_per_sec": 1.0}

    monkeypatch.setattr(sweeps, "measure_train_throughput", stub)

    # 128Lx128F b256 = 4.29e9 elements (the measured peak): no remat.
    # 160Lx128F b256 = 5.37e9 (> capacity): remat, loudly.
    # 64Lx16F (the headline family): far under capacity, no remat even
    # though depth >= 64 (the retired heuristic would have remat'd it).
    width_depth_sweep(widths=(128,), depths=(128, 160), batch_size=256)
    width_depth_sweep(widths=(16,), depths=(64,), batch_size=256)
    assert seen[(128, 128)] is False
    assert seen[(128, 160)] is True
    assert seen[(16, 64)] is False

    # Per-device accounting: 160Lx128F global b2048 over 8 devices is the
    # same 5.37e9 per device -> remat; forcing remat=False wins over auto.
    mesh = create_mesh((8,), ("data",))
    width_depth_sweep(widths=(128,), depths=(160,), batch_size=2048, mesh=mesh)
    assert seen[(128, 160)] is True
    width_depth_sweep(widths=(128,), depths=(160,), batch_size=256, remat=False)
    assert seen[(128, 160)] is False
    width_depth_sweep(widths=(16,), depths=(2,), batch_size=16, remat=True)
    assert seen[(16, 2)] is True

    # The capacity is BYTES, not elements: the 5e9-element boundary was
    # measured in bf16 (2 B activation + 1 B mask = 3 B/element).  fp32
    # saves 5 B/element, so the same 128Lx128F b256 cell (4.29e9 elements,
    # 21.5 GB fp32 vs 12.9 GB bf16) must auto-remat in fp32 — the CLI sweep
    # default without --bf16 — while 64Lx128F fp32 (10.7 GB) must not.
    width_depth_sweep(widths=(128,), depths=(64, 128), batch_size=256,
                      compute_dtype=jnp.float32)
    assert seen[(128, 128)] is True
    assert seen[(128, 64)] is False
