"""Deep-stability experiment tests: spectrum on the imaginary axis (+gamma),
bounded forward amplification, and a minimal gamma sweep."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.experiments import (
    conv_matrix_spectrum,
    forward_stability_report,
    gamma_sweep,
)
from differential_equations_resnet_tpu.ops import init_antisym_3x3


def test_spectrum_real_parts_equal_gamma():
    params = init_antisym_3x3(jax.random.key(0), 3)
    for gamma in (0.0, -0.1):
        report = conv_matrix_spectrum(params, gamma=gamma, height=4, width=4)
        assert report["real_part_error"] < 1e-5
        assert report["antisymmetry_defect"] < 1e-5
        assert report["eigenvalues"].shape == (4 * 4 * 3,)


def test_forward_amplification_bounded():
    """gamma=0 antisymmetric flow with tanh: ||y|| grows at most modestly
    over 100 Euler steps at small h (vs exponential blowup for an
    unconstrained kernel of the same scale)."""
    layers, channels = 100, 4
    keys = jax.random.split(jax.random.key(1), layers)
    blocks = jax.vmap(lambda k: init_antisym_3x3(k, channels))(keys)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, channels))
    report = forward_stability_report(blocks, gamma=0.0, h=0.05, x=x,
                                      activation="tanh")
    assert report["state_norms"].shape == (layers + 1,)
    assert report["amplification"] < 3.0
    # Negative gamma contracts: amplification must not exceed gamma=0.
    contracted = forward_stability_report(blocks, gamma=-0.5, h=0.05, x=x,
                                          activation="tanh")
    assert contracted["amplification"] <= report["amplification"] + 1e-3


def test_gamma_sweep_smoke():
    results = gamma_sweep(
        gammas=[0.0, -0.1],
        num_layers=10,
        num_filters=4,
        train_steps=3,
        batch_size=8,
        num_train=64,
    )
    assert set(results) == {0.0, -0.1}
    for metrics in results.values():
        assert np.isfinite(metrics["final_loss"])
        assert metrics["grad_norm_relative_deviation"] >= 1.0
        assert np.isfinite(metrics["grad_norm_last_first_ratio"])
