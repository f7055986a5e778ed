"""Width x depth throughput sweeps (the BASELINE 'v5e-8 data-parallel
width x depth sweep, bf16, ImageNet-32 scale workload' configuration).

Each cell of the sweep builds a single-block ODE-ResNet at (width, depth),
jits the full data-parallel train step over the given mesh (or single chip),
and measures sustained steps/sec and images/sec on synthetic data — the
machinery behind BENCH results and capacity planning."""

from __future__ import annotations

import sys
import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.models import (
    SingleBlockResNetConfig,
    build_single_block_resnet,
)
from differential_equations_resnet_tpu.parallel.mesh import shard_batch, shard_params
from differential_equations_resnet_tpu.train import (
    create_train_state,
    make_adam,
    make_train_step,
)
from differential_equations_resnet_tpu.utils.flops import (
    mfu,
    single_block_train_flops,
)


def imagenet32_config(
    num_layers: int = 28,
    num_filters: int = 64,
    final_time: float = 8.0,
    kernel_type: str = "antisymmetric",
    compute_dtype=jnp.bfloat16,
    **overrides,
) -> SingleBlockResNetConfig:
    """ImageNet-32-scale workload: 32x32 inputs, 1000 classes, wider trunk,
    bf16 compute.

    Throughput note (docs/RESULTS.md sections 6c/6e): the bf16 MXU win at
    these lane-filling widths engages at per-device batch >= 256 (1.56x
    over fp32); at b <= 128 both dtypes run at the same rate, and fp32 at
    b >= 256 loses ~35% to its conv lowering — benchmark wide trunks at
    b=256-384 bf16.  The measured single-chip utilization peak is C=128
    (exact MXU lane width) at maximum HBM-fitting depth: 128Lx128F b256
    bf16 = 66.2% MFU / 130 model TFLOPS."""
    return SingleBlockResNetConfig(
        image_shape=(32, 32, 3),
        kernel_type=kernel_type,
        kernel_size=3,
        h=final_time / num_layers,
        num_stages=2,
        blocks_per_stage=(num_layers,),
        filters_per_block=(num_filters,),
        strides=((1, 1),),
        num_classes=1000,
        subtract_mean=127.5,
        divide_by_stddev=127.5,
        compute_dtype=compute_dtype,
        **overrides,
    )


def measure_train_throughput(
    config: SingleBlockResNetConfig,
    batch_size: int,
    mesh=None,
    steps: int = 50,
    warmup: int = 5,
    seed: int = 0,
) -> Dict[str, float]:
    """Sustained full-train-step throughput for one configuration."""
    model = build_single_block_resnet(config)
    tx = make_adam()
    state = create_train_state(model, jax.random.key(seed), tx)
    step_fn = make_train_step(model, tx, mesh=mesh)

    rng = np.random.default_rng(seed)
    hw = config.image_shape
    x = rng.uniform(0, 255, (batch_size,) + hw).astype(np.float32)
    y = rng.integers(0, config.num_classes, (batch_size,)).astype(np.int64)
    if mesh is not None:
        state = state._replace(
            params=shard_params(mesh, state.params),
            opt_state=shard_params(mesh, state.opt_state),
            model_state=shard_params(mesh, state.model_state),
        )
        x, y = shard_batch(mesh, (x, y))
    else:
        x, y = jnp.asarray(x), jnp.asarray(y)

    for _ in range(warmup):
        state, metrics, _ = step_fn(state, x, y, 1e-3)
    # Value fetch, not block_until_ready: on tunneled TPU backends readiness
    # can be acknowledged before device-side completion.
    _ = float(metrics["loss"])

    start = time.perf_counter()
    for _ in range(steps):
        state, metrics, _ = step_fn(state, x, y, 1e-3)
    _ = float(metrics["loss"])  # device-completion sync
    elapsed = time.perf_counter() - start

    steps_per_sec = steps / elapsed
    flops_step = single_block_train_flops(config, batch_size)
    n_devices = mesh.size if mesh is not None else 1
    return {
        "steps_per_sec": steps_per_sec,
        "images_per_sec": steps_per_sec * batch_size,
        "step_ms": 1e3 * elapsed / steps,
        # Absolute-utilization accounting (same convention as bench.py:
        # nominal model FLOPs over the v5e bf16 peak).  model_tflops is the
        # AGGREGATE model FLOP rate of the run; MFU is per chip (the global
        # batch's FLOPs are spread over the mesh).
        "model_tflops": flops_step * steps_per_sec / 1e12,
        "mfu_vs_bf16_peak": mfu(flops_step, steps_per_sec) / n_devices,
    }


# Measured single-chip capacity for the no-remat scan (v5e, bf16, round 4):
# 4.8e9 saved residual elements per device compiles and runs (144Lx128F b256
# = 64.8% MFU; 96Lx128F b384 = 66.4%), 5.4e9+ fails to compile (160Lxb256,
# 128Lxb384).  Threshold between the two.  docs/RESULTS.md section 6e.
# The measurement was taken in bf16, where each saved element costs
# 2 B (pre-step activation) + 1 B (bool relu mask) = 3 B, so the capacity
# is really ~1.5e10 BYTES/device; wider dtypes hit it at fewer elements
# (fp32: 5 B/element -> ~3.0e9).  Expressing the gate in bytes keeps the
# fp32 sweep (the CLI default without --bf16) from being auto-assigned
# remat=False in the 3e9-5e9-element band where it cannot compile.
_NO_REMAT_MAX_BYTES = 5.0e9 * 3.0


def _auto_cell_remat(width, depth, per_device_batch, compute_dtype,
                     image_hw=(32, 32)):
    """(needs_remat, est_saved_bytes_per_device) for one sweep cell.

    Per saved element: one pre-step activation at the compute dtype plus
    the 1-byte bool relu mask the custom-VJP step stores."""
    elems = depth * per_device_batch * image_hw[0] * image_hw[1] * width
    elem_bytes = jnp.dtype(compute_dtype).itemsize + 1
    est_bytes = elems * elem_bytes
    return est_bytes > _NO_REMAT_MAX_BYTES, est_bytes


def width_depth_sweep(
    widths: Sequence[int] = (16, 32, 64),
    depths: Sequence[int] = (16, 32, 64),
    batch_size: int = 128,
    mesh=None,
    num_classes: int = 1000,
    compute_dtype=jnp.bfloat16,
    steps: int = 30,
    kernel_type: str = "antisymmetric",
    remat: Optional[bool] = None,
) -> Dict[Tuple[int, int], Dict[str, float]]:
    """Throughput at every (width, depth) grid point.

    ``remat=None`` (default) enables rematerialization only where the
    no-remat scan cannot compile — estimated per-device saved-residual
    bytes (L x per-device batch x H x W x C x (dtype + mask bytes)) above
    the measured ``_NO_REMAT_MAX_BYTES`` capacity — and reports which
    cells got it on stderr:
    remat costs a measured ~13 MFU points at these shapes (144Lx128F b256
    bf16: 64.8% plain vs 51.9% remat — docs/RESULTS.md section 6e), so a
    silent heuristic contaminates sweep results (an earlier depth>=64 rule
    did exactly that, round 4).  Pass True/False to force."""
    n_devices = mesh.size if mesh is not None else 1
    results: Dict[Tuple[int, int], Dict[str, float]] = {}
    for width in widths:
        for depth in depths:
            if remat is None:
                cell_remat, est_bytes = _auto_cell_remat(
                    width, depth, batch_size // n_devices, compute_dtype
                )
                if cell_remat:
                    # stderr: cmd_sweep's stdout contract is ONE JSON line.
                    print(
                        f"# {width}x{depth}: remat enabled (est. "
                        f"{est_bytes / 1e9:.1f} GB saved residuals/device "
                        f"> {_NO_REMAT_MAX_BYTES / 1e9:.1f} GB no-remat "
                        "capacity); expect ~13 MFU points below the "
                        "no-remat rate at these shapes",
                        file=sys.stderr,
                        flush=True,
                    )
            else:
                cell_remat = remat
            config = imagenet32_config(
                num_layers=depth,
                num_filters=width,
                kernel_type=kernel_type,
                compute_dtype=compute_dtype,
                remat=cell_remat,
            )
            if num_classes != 1000:
                config = SingleBlockResNetConfig(
                    **{
                        **{f: getattr(config, f) for f in config.__dataclass_fields__},
                        "num_classes": num_classes,
                    }
                )
            results[(width, depth)] = measure_train_throughput(
                config, batch_size, mesh=mesh, steps=steps
            )
    return results
