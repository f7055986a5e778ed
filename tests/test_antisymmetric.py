"""Property and parity tests for the packed antisymmetric kernels
(test strategy per SURVEY.md section 4: skew-centrosymmetry, channel
antisymmetry, gamma center, Toeplitz conv-matrix antisymmetry, and parity
with a loop-level NumPy re-execution of the reference algorithm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.ops import (
    Antisym3x3Params,
    cross_pair_indices,
    init_antisym_3x3,
    init_antisym_kxk,
    materialize_3x3,
    materialize_kxk,
    num_cross_pairs,
    num_diag_free,
    pack_3x3,
)
from tests.reference_numpy import (
    conv_matrix,
    reference_antisym_3x3_kernel,
    reference_centrosym_matrix,
    rot180,
)


def rot180_hwio(k):
    return k[::-1, ::-1]


@pytest.mark.parametrize("channels", [1, 2, 3, 8, 16])
def test_materialize_3x3_shapes_and_param_count(channels):
    params = init_antisym_3x3(jax.random.key(0), channels)
    kernel = materialize_3x3(params)
    assert kernel.shape == (3, 3, channels, channels)
    # Trainable DOF must match the reference layer exactly:
    # a, b, c, d (C each) + 9 * C(C-1)/2 cross + C bias.
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n == 4 * channels + 9 * num_cross_pairs(channels) + channels


@pytest.mark.parametrize("gamma", [0.0, 0.3])
def test_channel_antisymmetry(gamma):
    channels = 16
    params = init_antisym_3x3(jax.random.key(1), channels)
    kernel = np.asarray(materialize_3x3(params, gamma=gamma))
    center = np.zeros((3, 3))
    center[1, 1] = 1.0
    for i in range(channels):
        for j in range(channels):
            expected = -rot180(kernel[:, :, j, i])
            if i == j:
                expected = expected + 2.0 * gamma * center
            np.testing.assert_allclose(kernel[:, :, i, j], expected, atol=1e-6)


def test_center_element_is_gamma_and_nontrainable():
    channels = 4
    params = init_antisym_3x3(jax.random.key(2), channels)
    gamma = 0.7
    kernel = materialize_3x3(params, gamma=gamma)
    np.testing.assert_allclose(
        np.asarray(kernel[1, 1, np.arange(channels), np.arange(channels)]),
        gamma,
    )
    # gamma enters as a constant: the gradient of the center w.r.t. the packed
    # params must be zero (reference keeps `e` non-trainable, layer :247-259).
    grads = jax.grad(
        lambda p: jnp.sum(materialize_3x3(p, gamma=gamma)[1, 1, 0, 0])
    )(params)
    assert all(np.allclose(np.asarray(g), 0.0) for g in jax.tree.leaves(grads))


def test_parity_with_reference_numpy_assembly():
    """The vectorized scatter must reproduce the reference's per-channel
    assembly loop bit-for-bit."""
    channels, gamma = 8, 0.1
    params = init_antisym_3x3(jax.random.key(3), channels)
    c_in, c_out = cross_pair_indices(channels)
    cross_np = np.asarray(params.cross)
    blocks = {
        (int(i), int(j)): cross_np[:, :, p]
        for p, (i, j) in enumerate(zip(c_in, c_out))
    }
    expected = reference_antisym_3x3_kernel(
        np.asarray(params.a),
        np.asarray(params.b),
        np.asarray(params.c),
        np.asarray(params.d),
        blocks,
        gamma,
    )
    np.testing.assert_allclose(
        np.asarray(materialize_3x3(params, gamma=gamma)), expected, atol=0
    )


@pytest.mark.parametrize("channels,gamma", [(2, 0.0), (3, 0.25)])
def test_conv_matrix_antisymmetry(channels, gamma):
    """M + M^T == 2*gamma*I for the materialized Toeplitz conv matrix — the
    defining stability property (arXiv:1705.03341; reference layer docstring).
    Also pins the real part of every eigenvalue of M to gamma."""
    height = width = 4
    params = init_antisym_3x3(jax.random.key(4), channels)
    kernel = materialize_3x3(params, gamma=gamma)
    m = conv_matrix(kernel, height, width, channels)
    np.testing.assert_allclose(
        m + m.T, 2.0 * gamma * np.eye(m.shape[0]), atol=1e-5
    )
    eig_real = np.real(np.linalg.eigvals(m.astype(np.float64)))
    np.testing.assert_allclose(eig_real, gamma, atol=1e-5)


def test_pack_materialize_roundtrip():
    channels = 6
    params = init_antisym_3x3(jax.random.key(5), channels)
    kernel = materialize_3x3(params, gamma=0.0)
    packed = pack_3x3(kernel, params.bias)
    for got, want in zip(jax.tree.leaves(packed), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_he_init_statistics():
    channels = 256
    params = init_antisym_3x3(jax.random.key(6), channels)
    stddev = np.sqrt(2.0 / (9 * channels))
    cross = np.asarray(params.cross)
    assert abs(cross.std() - 0.88 * stddev) < 0.05 * stddev  # truncated at 2 sigma
    assert np.abs(cross).max() <= 2.0 * stddev + 1e-6
    assert np.allclose(np.asarray(params.bias), 0.0)


# ---------------------------------------------------------------------------
# General k x k
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel_size", [2, 3, 5])
@pytest.mark.parametrize("antisymmetric", [True, False])
def test_kxk_diag_block_centrosymmetry(kernel_size, antisymmetric):
    channels, gamma = 3, 0.2
    params = init_antisym_kxk(
        jax.random.key(7), kernel_size, channels, antisymmetric=antisymmetric
    )
    kernel = np.asarray(
        materialize_kxk(params, kernel_size, gamma=gamma, antisymmetric=antisymmetric)
    )
    for ch in range(channels):
        block = kernel[:, :, ch, ch]
        mirrored = rot180(block)
        if antisymmetric:
            # Anti-centrosymmetric up to the gamma center (odd k).
            expected = -block.copy()
            if kernel_size % 2 == 1:
                mid = kernel_size // 2
                expected[mid, mid] = gamma
            np.testing.assert_allclose(mirrored, expected, atol=1e-6)
        else:
            np.testing.assert_allclose(mirrored, block, atol=1e-6)


@pytest.mark.parametrize("kernel_size", [3, 4, 5])
@pytest.mark.parametrize("antisymmetric", [True, False])
def test_kxk_diag_parity_with_reference_loop(kernel_size, antisymmetric):
    """Diagonal blocks must match the reference's scalar-by-scalar
    construction consumed in the same iteration order."""
    channels, gamma = 2, 0.15
    params = init_antisym_kxk(
        jax.random.key(8), kernel_size, channels, antisymmetric=antisymmetric
    )
    kernel = np.asarray(
        materialize_kxk(params, kernel_size, gamma=gamma, antisymmetric=antisymmetric)
    )
    diag_np = np.asarray(params.diag)  # (n_free, C)
    for ch in range(channels):
        expected = reference_centrosym_matrix(
            list(diag_np[:, ch]), kernel_size, gamma, antisymmetric
        )
        np.testing.assert_allclose(kernel[:, :, ch, ch], expected, atol=1e-6)


def test_kxk_matches_3x3_specialization():
    """For k=3 the general layer and the specialization parameterize the same
    family: map (a, b, c, d) -> general free order (a, b, c, f=-d)."""
    channels, gamma = 4, 0.05
    p3 = init_antisym_3x3(jax.random.key(9), channels)
    diag = jnp.stack([p3.a, p3.b, p3.c, -p3.d])  # free order (0,0),(0,1),(0,2),(1,2)
    pk = init_antisym_kxk(jax.random.key(10), 3, channels)._replace(
        diag=diag, cross=p3.cross
    )
    np.testing.assert_allclose(
        np.asarray(materialize_kxk(pk, 3, gamma=gamma)),
        np.asarray(materialize_3x3(p3, gamma=gamma)),
        atol=1e-6,
    )


def test_kxk_conv_matrix_antisymmetry():
    channels = 2
    params = init_antisym_kxk(jax.random.key(11), 5, channels)
    kernel = materialize_kxk(params, 5, gamma=0.0)
    m = conv_matrix(kernel, 6, 6, channels)
    np.testing.assert_allclose(m + m.T, 0.0, atol=1e-5)


def test_num_diag_free_counts():
    # k(k-1)/2 + k//2 (+1 for trainable center when centrosymmetric and odd).
    assert num_diag_free(3, True) == 4
    assert num_diag_free(3, False) == 5
    assert num_diag_free(5, True) == 12
    assert num_diag_free(4, True) == 8
    assert num_diag_free(4, False) == 8


def test_stacked_layers_vmap():
    """Stacked (L, ...) params materialize under vmap — the scan/stacked-layer
    representation used by the integrator."""
    layers, channels = 5, 8
    keys = jax.random.split(jax.random.key(12), layers)
    stacked = jax.vmap(lambda k: init_antisym_3x3(k, channels))(keys)
    kernels = jax.vmap(lambda p: materialize_3x3(p, gamma=0.1))(stacked)
    assert kernels.shape == (layers, 3, 3, channels, channels)
    single = materialize_3x3(
        Antisym3x3Params(*[leaf[2] for leaf in stacked]), gamma=0.1
    )
    np.testing.assert_allclose(np.asarray(kernels[2]), np.asarray(single), atol=0)


def test_materialize_3x3_stacked_matches_per_layer():
    """materialize_3x3_stacked == vmap of the single-layer materialize (the
    pre-scan bulk materialization must be bit-identical)."""
    from differential_equations_resnet_tpu.ops.antisymmetric import (
        init_antisym_3x3,
        materialize_3x3,
        materialize_3x3_stacked,
    )

    L, C, gamma = 5, 12, 0.37
    keys = jax.random.split(jax.random.key(3), L)
    per_layer = [init_antisym_3x3(k, C) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    dense_stacked = materialize_3x3_stacked(stacked, gamma)
    assert dense_stacked.shape == (L, 3, 3, C, C)
    for l in range(L):
        np.testing.assert_array_equal(
            np.asarray(dense_stacked[l]),
            np.asarray(materialize_3x3(per_layer[l], gamma)),
        )


# ---------------------------------------------------------------------------
# Dense-lower-triangular layout (the bottleneck family's storage at large C)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 5, 16])
@pytest.mark.parametrize("gamma", [0.0, 0.3])
def test_dense_materialize_matches_packed(channels, gamma):
    """materialize_3x3_from_dense must be bit-identical to the packed
    scatter materialization — same math, scatter-free construction."""
    from differential_equations_resnet_tpu.ops import (
        dense_from_packed,
        materialize_3x3_from_dense,
    )

    p = init_antisym_3x3(jax.random.key(0), channels)
    np.testing.assert_array_equal(
        np.asarray(materialize_3x3_from_dense(dense_from_packed(p), gamma)),
        np.asarray(materialize_3x3(p, gamma)),
    )


def test_dense_packed_roundtrip_and_init():
    from differential_equations_resnet_tpu.ops import (
        dense_from_packed,
        init_antisym_3x3_dense,
        packed_from_dense,
    )

    p = init_antisym_3x3(jax.random.key(7), 9)
    rt = packed_from_dense(dense_from_packed(p))
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Same-key init draws are bit-identical across layouts.
    d = init_antisym_3x3_dense(jax.random.key(7), 9)
    rt2 = packed_from_dense(d)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(rt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_gradients_stay_in_lower_triangle():
    """The lower-triangle mask inside materialization must zero gradients to
    every structural-zero position (mirror/diagonal/upper), so the redundant
    storage cannot drift under optimization."""
    from differential_equations_resnet_tpu.ops import (
        init_antisym_3x3_dense,
        materialize_3x3_from_dense,
    )

    C = 6
    d = init_antisym_3x3_dense(jax.random.key(1), C)
    # Random weighting: a symmetric loss (e.g. sum(K**3)) would cancel the
    # free and mirror contributions and zero every gradient.
    r = jax.random.normal(jax.random.key(9), (3, 3, C, C))
    g = jax.grad(
        lambda p: jnp.sum(materialize_3x3_from_dense(p, 0.2) * r)
    )(d)
    lower = np.tri(C, k=-1, dtype=bool)
    gc = np.asarray(g.cross)
    assert np.all(gc[:, :, ~lower] == 0.0)
    assert np.any(gc[:, :, lower] != 0.0)


def test_dense_conv_and_penalty_match_packed():
    """antisym_conv2d_3x3 and l2_kernel_penalty agree across layouts."""
    from differential_equations_resnet_tpu.models.blocks import l2_kernel_penalty
    from differential_equations_resnet_tpu.ops import (
        antisym_conv2d_3x3,
        dense_from_packed,
    )

    C = 8
    p = init_antisym_3x3(jax.random.key(2), C)
    d = dense_from_packed(p)
    x = jax.random.normal(jax.random.key(3), (2, 10, 10, C))
    np.testing.assert_array_equal(
        np.asarray(antisym_conv2d_3x3(x, d, gamma=0.1)),
        np.asarray(antisym_conv2d_3x3(x, p, gamma=0.1)),
    )
    np.testing.assert_allclose(
        float(l2_kernel_penalty({"k": d}, 0.01)),
        float(l2_kernel_penalty({"k": p}, 0.01)),
        rtol=1e-6,  # summation order differs (dense reduces the zeros too)
    )


def test_dense_telemetry_free_size_matches_packed():
    from differential_equations_resnet_tpu.ops import dense_from_packed
    from differential_equations_resnet_tpu.train.telemetry import (
        _per_layer_free_size,
    )

    p = init_antisym_3x3(jax.random.key(4), 12)
    d = dense_from_packed(p)
    assert _per_layer_free_size(d, stacked=False) == _per_layer_free_size(
        p, stacked=False
    )
    assert _per_layer_free_size({"conv2": d}, stacked=False) == 4 * 12 + 9 * (
        12 * 11 // 2
    )


def test_kxk_stacked_materialization_matches_per_layer():
    """materialize_kxk passes leading stacked-layer dims through: one bulk
    scatter over (L, ...) must equal the per-layer materialization."""
    for kernel_size, antisymmetric in ((3, True), (5, False)):
        keys = jax.random.split(jax.random.key(20), 4)
        per_layer = [
            init_antisym_kxk(k, kernel_size, 6, antisymmetric=antisymmetric)
            for k in keys
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
        bulk = materialize_kxk(
            stacked, kernel_size, gamma=0.37, antisymmetric=antisymmetric
        )
        assert bulk.shape == (4, kernel_size, kernel_size, 6, 6)
        for layer in range(4):
            np.testing.assert_array_equal(
                np.asarray(bulk[layer]),
                np.asarray(
                    materialize_kxk(
                        per_layer[layer], kernel_size, gamma=0.37,
                        antisymmetric=antisymmetric,
                    )
                ),
            )


def test_pack_kxk_roundtrip():
    """pack_kxk inverts materialize_kxk (exactly, including the trainable
    center in centrosymmetric mode)."""
    from differential_equations_resnet_tpu.ops.antisymmetric import pack_kxk

    for kernel_size, antisymmetric in ((3, True), (3, False), (5, False)):
        params = init_antisym_kxk(
            jax.random.key(21), kernel_size, 5, antisymmetric=antisymmetric
        )
        kernel = materialize_kxk(
            params, kernel_size, gamma=0.11, antisymmetric=antisymmetric
        )
        packed = pack_kxk(kernel, params.bias, antisymmetric=antisymmetric)
        np.testing.assert_array_equal(np.asarray(packed.diag),
                                      np.asarray(params.diag))
        np.testing.assert_array_equal(np.asarray(packed.cross),
                                      np.asarray(params.cross))
