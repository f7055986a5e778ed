"""Benchmark: train throughput on the reference's headline configuration.

Measures steps/sec of the full train step (forward + backward + Adam +
metrics + per-layer gradient-norm telemetry) on the antisymmetric
single-block ResNet, 64 layers x 16 filters, batch 32, CIFAR-10-shaped data —
the exact setup of the reference's slowest row (BASELINE.md: 1.46 steps/s on
GPU, TF 1.12).  `vs_baseline` = measured steps/s / 1.46.

Methodology (remote/tunneled TPU backends dispatch asynchronously and
`block_until_ready` can acknowledge before device-side completion, so naive
timing overstates throughput):
  - the dataset is DEVICE-RESIDENT (uint8) and each timed dispatch is one
    `make_device_epoch` program covering the per-epoch shuffle, every batch
    gather, all K train steps, and stacked telemetry — true end-to-end
    per-step cost with zero host work between dispatch and fetch;
  - the timed region ends by FETCHING the final step's loss, which
    transitively depends on every step, proving all K*M steps executed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 1.46  # v6 notebook cell 9: antisymmetric 64Lx16F, batch 32.


def main() -> None:
    import jax
    import jax.numpy as jnp

    from differential_equations_resnet_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from differential_equations_resnet_tpu.data.cifar10 import (
        find_cifar10_directory,
        build_cifar10_dataset,
        synthetic_cifar10,
    )
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )
    from differential_equations_resnet_tpu.train import (
        create_train_state,
        make_adam,
    )
    from differential_equations_resnet_tpu.train.train_step import (
        make_device_epoch,
    )

    batch_size = 32
    scan_k = 500          # steps per timed dispatch (device-resident epoch)
    measure_chunks = 2    # timed dispatches -> 1000 measured steps

    model = build_single_block_resnet(cifar10_single_block_config())
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    # Device-resident epoch trainer: the dataset lives on device (uint8) and
    # each dispatch covers the per-epoch shuffle, every batch gather, all
    # scan_k train steps, and the stacked telemetry — true end-to-end
    # per-step cost with zero host involvement (make_device_epoch docstring).
    epoch_step = make_device_epoch(model, tx, batch_size, donate=True)

    cifar_dir = find_cifar10_directory()
    if cifar_dir:
        images, labels, *_ = build_cifar10_dataset(cifar_dir)
    else:
        images, labels, *_ = synthetic_cifar10(scan_k * batch_size, 8, seed=0)

    xs = jax.device_put(np.ascontiguousarray(images[: scan_k * batch_size]))
    ys = jax.device_put(np.ascontiguousarray(labels[: scan_k * batch_size]))
    lrs = jax.device_put(jnp.full((scan_k,), 1e-3, jnp.float32))

    # Warmup: compile + one full epoch, synced by a value fetch.
    state, metrics, _ = epoch_step(state, xs, ys, jax.random.key(0), lrs)
    _ = float(metrics["loss"][-1])

    start = time.perf_counter()
    for i in range(measure_chunks):
        state, metrics, _ = epoch_step(state, xs, ys, jax.random.key(i + 1), lrs)
    final_loss = float(metrics["loss"][-1])  # true device-completion sync
    elapsed = time.perf_counter() - start

    assert np.isfinite(final_loss)
    steps_per_sec = measure_chunks * scan_k / elapsed
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_antisym_64L16F_b32",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
