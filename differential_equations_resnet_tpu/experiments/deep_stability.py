"""Deep-stability diagnostics: eigenvalue spectra, trajectory amplification,
and gamma sweeps.

The reference validates stability indirectly, by eyeballing per-layer
gradient norms over a 64-layer run (its gradient_history CSVs) and by
printing kernel slices after training (antisymmetric_conv_kernel.ipynb cells
13-15).  This module makes the underlying theory executable:

- the convolution *matrix* M of an antisymmetric kernel satisfies
  M = A + gamma*I with A^T = -A, so spec(M) lies on the vertical line
  Re(z) = gamma (`conv_matrix_spectrum` materializes M and checks);
- the forward flow's amplification ||y_L|| / ||y_0|| stays bounded for
  gamma <= 0 and small h (`forward_stability_report`);
- `gamma_sweep` runs short trainings across gamma values on the deep
  (100-step) configuration and reports the gradient-flow diagnostics
  (relative deviation, std over layers, last/first ratio) per gamma.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.ops.antisymmetric import (
    Antisym3x3Params,
    init_antisym_3x3,
    materialize_3x3,
)
from differential_equations_resnet_tpu.ops.conv import conv2d_same
from differential_equations_resnet_tpu.ops.integrators import (
    integrate_with_trajectory,
)


def conv_matrix_spectrum(
    params: Antisym3x3Params,
    gamma: float,
    height: int,
    width: int,
) -> Dict[str, np.ndarray]:
    """Materialize the doubly-blocked Toeplitz conv matrix M (stride 1, SAME)
    and return its eigenvalues plus the antisymmetry defect.

    For an exactly antisymmetric kernel, `real_part_error` is ~0 and
    `antisymmetry_defect` (max |M + M^T - 2*gamma*I|) is ~0."""
    channels = params.a.shape[-1]
    kernel = materialize_3x3(params, gamma=gamma)
    n = height * width * channels
    eye = jnp.eye(n, dtype=jnp.float32).reshape(n, height, width, channels)
    m = np.asarray(conv2d_same(eye, kernel).reshape(n, n)).T
    eigenvalues = np.linalg.eigvals(m.astype(np.float64))
    defect = np.abs(m + m.T - 2.0 * gamma * np.eye(n)).max()
    return {
        "eigenvalues": eigenvalues,
        "real_part_error": np.abs(np.real(eigenvalues) - gamma).max(),
        "antisymmetry_defect": defect,
    }


def forward_stability_report(
    blocks: Antisym3x3Params,
    gamma: float,
    h: float,
    x: jax.Array,
    activation: str = "relu",
) -> Dict[str, np.ndarray]:
    """Integrate the stacked blocks over the input and report per-step state
    norms and the total amplification ||y_L|| / ||y_0||."""
    act = getattr(jax.nn, activation)

    def field(y, p):
        return act(
            conv2d_same(y, materialize_3x3(p, gamma=gamma), bias=p.bias)
        )

    _, trajectory = integrate_with_trajectory(field, x, blocks, h)
    norms = np.asarray(
        jnp.linalg.norm(trajectory.reshape(trajectory.shape[0], -1), axis=-1)
    )
    n0 = float(jnp.linalg.norm(x))
    return {
        "state_norms": np.concatenate([[n0], norms]),
        "amplification": norms[-1] / n0,
        "max_step_growth": float(
            np.max(np.diff(np.concatenate([[n0], norms])) / norms.clip(min=1e-30))
        ),
    }


def gamma_sweep(
    gammas: Sequence[float],
    num_layers: int = 100,
    num_filters: int = 8,
    final_time: float = 8.0,
    train_steps: int = 50,
    batch_size: int = 32,
    num_train: int = 2048,
    seed: int = 0,
    learning_rate: float = 1e-3,
    data: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Dict[float, Dict[str, float]]:
    """Short-training sweep over gamma on the deep (default 100-Euler-step)
    configuration.  For each gamma, returns the final loss/accuracy and the
    gradient-flow diagnostics over the collected per-layer norms — the
    BASELINE.md 'deep stability' configuration as a library call."""
    from differential_equations_resnet_tpu.data.cifar10 import synthetic_cifar10
    from differential_equations_resnet_tpu.models import (
        build_single_block_resnet,
        cifar10_single_block_config,
    )
    from differential_equations_resnet_tpu.train import (
        create_train_state,
        make_adam,
        make_train_step,
    )

    if data is None:
        images, labels, *_ = synthetic_cifar10(num_train, 1, seed=seed)
    else:
        images, labels = data

    results: Dict[float, Dict[str, float]] = {}
    rng = np.random.default_rng(seed)
    for gamma in gammas:
        config = cifar10_single_block_config(
            num_layers=num_layers,
            final_time=final_time,
            num_filters=num_filters,
            gamma=float(gamma),
            remat=True,
        )
        model = build_single_block_resnet(config)
        tx = make_adam(learning_rate)
        state = create_train_state(model, jax.random.key(seed), tx)
        step_fn = make_train_step(model, tx)

        norms_history = []
        for _ in range(train_steps):
            idx = rng.integers(0, len(images), size=batch_size)
            state, metrics, norms = step_fn(
                state,
                jnp.asarray(images[idx], jnp.float32),
                jnp.asarray(labels[idx]),
                learning_rate,
            )
            # Keep per-step results on device; one fetch after the loop
            # (each mid-loop device->host read is a tunnel round trip).
            norms_history.append(norms)

        g = np.asarray(jnp.stack(norms_history))  # (steps, 1 + L)
        loss = float(metrics["loss"])
        acc = float(metrics["correct"] / metrics["count"])
        layer_norms = g[:, 1:]  # exclude the stem, as the notebook does
        means = layer_norms.mean(axis=1, keepdims=True)
        rel_dev = float(np.sqrt(np.mean((layer_norms / means) ** 2)))
        results[float(gamma)] = {
            "final_loss": loss,
            "final_accuracy": acc,
            "grad_norm_relative_deviation": rel_dev,
            "grad_norm_std_over_layers": float(np.std(layer_norms, axis=1).mean()),
            "grad_norm_last_first_ratio": float(
                (layer_norms[:, -1] / layer_norms[:, 0]).mean()
            ),
        }
    return results
