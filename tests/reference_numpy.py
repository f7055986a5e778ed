"""Independent NumPy re-execution of the reference's kernel-assembly
algorithms, used as the parity oracle for the vectorized JAX implementation.

These follow the *published formulas* of
`layers/tfkeras_layer_Conv2DAntisymmetric3By3.py` and
`layers/tfkeras_layer_Conv2DAntisymmetric.py` loop-for-loop (on NumPy arrays,
no TF), so a test failure localizes to the packed/vectorized implementation.
"""

import numpy as np


def rot180(m):
    return m[::-1, ::-1]


def reference_antisym_3x3_kernel(a, b, c, d, cross_blocks, gamma):
    """Assemble the dense (3, 3, C, C) kernel the way the reference layer does.

    a, b, c, d: (C,) per-channel diagonal-block entries.
    cross_blocks: dict mapping (c_in, c_out) with c_in > c_out to (3, 3) blocks
        (the reference's per-output-channel "independent kernels").
    """
    channels = a.shape[0]
    kernel = np.zeros((3, 3, channels, channels), dtype=a.dtype)
    for ch in range(channels):
        kernel[:, :, ch, ch] = np.array(
            [
                [a[ch], b[ch], c[ch]],
                [d[ch], gamma, -d[ch]],
                [-c[ch], -b[ch], -a[ch]],
            ]
        )
    for (c_in, c_out), block in cross_blocks.items():
        assert c_in > c_out
        kernel[:, :, c_in, c_out] = block
        # Dependent mirror: reference `_get_anti_centrosymmetric_transpose`
        # (element-wise negation + 180-degree rotation).
        kernel[:, :, c_out, c_in] = -rot180(block)
    return kernel


def reference_centrosym_matrix(free_values, kernel_size, gamma, antisymmetric):
    """Scalar-by-scalar (anti-)centrosymmetric k x k matrix, following the
    predicate of `layers/tfkeras_layer_Conv2DAntisymmetric.py:231-243` /
    `layers/antisymmetric_conv2d_utils.py:39-60`.

    free_values: flat list consumed in the reference's iteration order
        (i ascending, then j in range(i, k)), plus the trainable center for
        the centrosymmetric odd case.
    """
    k = kernel_size
    m = np.zeros((k, k), dtype=np.float64)
    it = iter(free_values)
    for i in range(k):
        for j in range(i, k):
            if j > i or (j == i and i <= k // 2 - 1):
                v = next(it)
                m[i, j] = v
                m[k - 1 - i, k - 1 - j] = -v if antisymmetric else v
            elif j == i and i == k // 2 and k % 2 == 1:
                m[i, j] = gamma if antisymmetric else next(it)
    return m


def conv_matrix(kernel, height, width, channels):
    """Materialize the doubly-blocked Toeplitz matrix M of a stride-1 SAME
    conv with the given (k, k, C, C) kernel, acting on flattened (H*W*C,)
    inputs, by applying the conv to every basis vector."""
    import jax.numpy as jnp
    from differential_equations_resnet_tpu.ops.conv import conv2d_same

    n = height * width * channels
    eye = np.eye(n, dtype=np.float32).reshape(n, height, width, channels)
    out = conv2d_same(jnp.asarray(eye), jnp.asarray(kernel))
    return np.asarray(out).reshape(n, n).T  # column i = conv(basis_i)
