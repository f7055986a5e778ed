"""Benchmark: train throughput on the reference's headline configuration.

Measures steps/sec of the full train step (forward + backward + Adam +
metrics + per-layer gradient-norm telemetry) on the antisymmetric
single-block ResNet, 64 layers x 16 filters, batch 32, CIFAR-10-shaped data —
the exact setup of the reference's slowest row (BASELINE.md: 1.46 steps/s on
GPU, TF 1.12).  `vs_baseline` = measured steps/s / 1.46.

Methodology (remote/tunneled TPU backends dispatch asynchronously and
`block_until_ready` can acknowledge before device-side completion, so naive
timing overstates throughput):
  - K steps run inside ONE compiled `lax.scan` (`make_multi_step`) over
    device-resident batches — no host dispatch gaps between steps;
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
        make_multi_step,
    )

    batch_size = 32
    scan_k = 100          # steps per dispatch
    measure_chunks = 5    # timed dispatches -> 500 measured steps

    model = build_single_block_resnet(cifar10_single_block_config())
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    multi_step = make_multi_step(model, tx, donate=True)

    cifar_dir = find_cifar10_directory()
    if cifar_dir:
        images, labels, *_ = build_cifar10_dataset(cifar_dir)
    else:
        images, labels, *_ = synthetic_cifar10(scan_k * batch_size, 8, seed=0)

    # Pre-stage (K, B, ...) device-resident batches; the measurement is the
    # training computation itself, not host staging.
    n = scan_k * batch_size
    xs = jax.device_put(
        jnp.asarray(images[:n], jnp.float32).reshape(scan_k, batch_size, 32, 32, 3)
    )
    ys = jax.device_put(jnp.asarray(labels[:n]).reshape(scan_k, batch_size))
    lrs = jax.device_put(jnp.full((scan_k,), 1e-3, jnp.float32))

    # Warmup: compile + one full chunk, synced by a value fetch.
    state, metrics, _ = multi_step(state, xs, ys, lrs)
    _ = float(metrics["loss"][-1])

    start = time.perf_counter()
    for _ in range(measure_chunks):
        state, metrics, _ = multi_step(state, xs, ys, lrs)
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
