"""Benchmark: train throughput on the reference's headline configuration.

Measures steps/sec of the full jitted train step (forward + backward + Adam +
metrics + per-layer gradient-norm telemetry) on the antisymmetric
single-block ResNet, 64 layers x 16 filters, batch 32, CIFAR-10-shaped data —
the exact setup of the reference's slowest row (BASELINE.md: 1.46 steps/s on
GPU, TF 1.12).  `vs_baseline` = measured steps/s / 1.46.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 1.46  # v6 notebook cell 9: antisymmetric 64Lx16F, batch 32.


def main() -> None:
    import jax
    import jax.numpy as jnp

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
        make_train_step,
    )

    batch_size = 32
    model = build_single_block_resnet(cifar10_single_block_config())
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    train_step = make_train_step(model, tx, donate=True)

    cifar_dir = find_cifar10_directory()
    if cifar_dir:
        images, labels, *_ = build_cifar10_dataset(cifar_dir)
    else:
        images, labels, *_ = synthetic_cifar10(4096, 8, seed=0)

    # Pre-stage a rotating set of device-resident batches so the measurement
    # is the training step itself, not host staging.
    num_batches = 16
    device_batches = []
    for i in range(num_batches):
        sl = slice(i * batch_size, (i + 1) * batch_size)
        device_batches.append(
            (
                jax.device_put(jnp.asarray(images[sl], jnp.float32)),
                jax.device_put(jnp.asarray(labels[sl])),
            )
        )

    lr = 1e-3
    # Warmup: compile + a few steps.
    for i in range(5):
        x, y = device_batches[i % num_batches]
        state, metrics, _ = train_step(state, x, y, lr)
    jax.block_until_ready(state)

    measure_steps = 100
    start = time.perf_counter()
    for i in range(measure_steps):
        x, y = device_batches[i % num_batches]
        state, metrics, _ = train_step(state, x, y, lr)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start

    steps_per_sec = measure_steps / elapsed
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
