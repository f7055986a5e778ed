"""Antisymmetric-kernel prototype + post-training property spot-checks — the
workflow of the reference's `antisymmetric_conv_kernel.ipynb` (layer
prototype, 1-epoch smoke fit, then printing kernel slices to confirm
skew-centrosymmetry survives optimization, cells 9-15) and the v6 notebook's
channel-antisymmetry check (cell 26: kernel[:,:,i,j] vs kernel[:,:,j,i]).

Here the checks are numeric assertions, not visual inspection:

  1. spatial skew-centrosymmetry of every diagonal block,
  2. kernel[:, :, i, j] == -rot180(kernel[:, :, j, i]) for off-diagonal pairs,
  3. the center element of every diagonal block == gamma,
  4. the materialized Toeplitz conv matrix M satisfies M + M^T = 2*gamma*I
     (every eigenvalue's real part == gamma) — the Haber-Ruthotto stability
     condition the whole construction exists for,

and they are re-verified AFTER a short training run (the structure is
parametric, so it cannot be violated by optimization — unlike the reference,
where it held only because dependent TF variables were re-derived).

    python examples/antisymmetric_kernel_properties.py
"""

import _bootstrap  # noqa: F401  (repo-root import shim for source checkouts)
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.data.cifar10 import synthetic_cifar10
from differential_equations_resnet_tpu.models import (
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.ops.antisymmetric import (
    materialize_3x3_stacked,
)
from differential_equations_resnet_tpu.train import Training


def conv_toeplitz_matrix(kernel: np.ndarray, height: int, width: int) -> np.ndarray:
    """Materialize the doubly-blocked Toeplitz matrix of a stride-1 SAME conv
    with the given HWIO kernel on a (height, width) grid — the object whose
    antisymmetry the reference's math is stated in (SURVEY.md section 4)."""
    k, _, c_in, c_out = kernel.shape
    pad = k // 2
    n = height * width
    m = np.zeros((n * c_out, n * c_in))
    for oy in range(height):
        for ox in range(width):
            for dy in range(k):
                for dx in range(k):
                    iy, ix = oy + dy - pad, ox + dx - pad
                    if 0 <= iy < height and 0 <= ix < width:
                        out_base = (oy * width + ox) * c_out
                        in_base = (iy * width + ix) * c_in
                        m[out_base : out_base + c_out, in_base : in_base + c_in] += (
                            kernel[dy, dx].T
                        )
    return m


def check_kernel_properties(kernel: np.ndarray, gamma: float, label: str) -> None:
    c = kernel.shape[-1]
    # 1+3. Diagonal blocks: skew-centrosymmetric with gamma center.
    for i in range(c):
        block = kernel[:, :, i, i]
        np.testing.assert_allclose(
            block + block[::-1, ::-1], 2 * gamma * _center_only(), atol=1e-6
        )
        assert abs(block[1, 1] - gamma) < 1e-6
    # 2. Channel pairs (v6 notebook cell 26's i=10, j=31 check, all pairs).
    for i in range(c):
        for j in range(i + 1, c):
            np.testing.assert_allclose(
                kernel[:, :, i, j], -kernel[::-1, ::-1, j, i], atol=1e-6
            )
    # 4. Toeplitz conv-matrix antisymmetry on a small grid.
    m = conv_toeplitz_matrix(kernel, 6, 6)
    np.testing.assert_allclose(
        m + m.T, 2 * gamma * np.eye(m.shape[0]), atol=1e-5
    )
    eig_real = np.linalg.eigvals(m).real
    print(
        f"  [{label}] all {c}x{c} channel pairs skew-consistent; "
        f"Re(eig(M)) in [{eig_real.min():+.2e}, {eig_real.max():+.2e}] "
        f"(gamma={gamma})"
    )


def _center_only() -> np.ndarray:
    z = np.zeros((3, 3))
    z[1, 1] = 1.0
    return z


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-layers", type=int, default=4)
    parser.add_argument("--num-filters", type=int, default=8)
    parser.add_argument("--gamma", type=float, default=0.02)
    parser.add_argument("--steps", type=int, default=30)
    args = parser.parse_args()

    model = build_single_block_resnet(
        cifar10_single_block_config(
            num_layers=args.num_layers,
            num_filters=args.num_filters,
            gamma=args.gamma,
        )
    )
    train_x, train_y, test_x, test_y, _ = synthetic_cifar10(1024, 256, seed=0)
    trainer = Training(
        model,
        train_features=train_x, train_labels=train_y,
        val_features=test_x, val_labels=test_y,
        batch_size=32, record_summaries=False,
    )

    def kernels_of(state):
        blocks = state.params["stages"][0]["blocks"]
        return np.asarray(materialize_3x3_stacked(blocks, args.gamma))

    print("before training:")
    check_kernel_properties(kernels_of(trainer.state)[0], args.gamma, "layer 0, init")

    trainer.train(
        epochs=1, steps_per_epoch=args.steps,
        learning_rate_schedule=lambda s: 1e-3, eval_steps=4,
    )

    print("after training (structure is parametric — preserved exactly):")
    dense = kernels_of(trainer.state)
    for layer in (0, len(dense) - 1):
        check_kernel_properties(dense[layer], args.gamma, f"layer {layer}, trained")
    # The reference's visual check: print a diagonal block's slice.
    print("kernel[:, :, 1, 1] =\n", dense[0][:, :, 1, 1])
    if dense.shape[-1] > 3:
        print("kernel[:, :, 1, 3] =\n", dense[0][:, :, 1, 3])
        print("-rot180(kernel[:, :, 3, 1]) =\n", -dense[0][::-1, ::-1, 3, 1])


if __name__ == "__main__":
    main()
