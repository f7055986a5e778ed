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


# ---------------------------------------------------------------------------
# Whole-model forward oracle (SURVEY.md section 4 item 2)
# ---------------------------------------------------------------------------


def numpy_conv2d_same(x, kernel, strides=(1, 1), bias=None):
    """Pure-NumPy stride-s zero-padded ("SAME") convolution, fp64.

    NHWC input, HWIO kernel, TF SAME padding semantics (out = ceil(in/s),
    total pad = max((out-1)*s + k - in, 0), split low-before-high) — the exact
    semantics of the reference's `tf.nn.conv2d(..., padding='SAME')`
    (`layers/tfkeras_layer_Conv2DAntisymmetric3By3.py:157-171`)."""
    x = np.asarray(x, np.float64)
    kernel = np.asarray(kernel, np.float64)
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    sh, sw = strides
    out_h = -(-h // sh)
    out_w = -(-w // sw)
    pad_h = max((out_h - 1) * sh + kh - h, 0)
    pad_w = max((out_w - 1) * sw + kw - w, 0)
    xp = np.pad(
        x,
        ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
         (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
    )
    out = np.zeros((n, out_h, out_w, cout), np.float64)
    for di in range(kh):
        for dj in range(kw):
            patch = xp[:, di : di + out_h * sh : sh, dj : dj + out_w * sw : sw, :]
            out += patch @ kernel[di, dj]
    if bias is not None:
        out += np.asarray(bias, np.float64)
    return out


def numpy_dense_kernels_from_packed(blocks, gamma):
    """Stacked packed antisymmetric params -> list of dense fp64 (3,3,C,C)
    kernels, assembled through the reference's per-pair loop (NOT through the
    repo's vectorized scatter).  The cross-pair flattening order (c_out
    ascending, then c_in ascending) is part of the packed-representation
    contract; it is re-derived here with a plain double loop."""
    a = np.asarray(blocks.a, np.float64)
    num_layers, channels = a.shape
    pairs = [(i, j) for j in range(channels) for i in range(j + 1, channels)]
    kernels = []
    for layer in range(num_layers):
        cross_blocks = {
            pair: np.asarray(blocks.cross[layer, :, :, p], np.float64)
            for p, pair in enumerate(pairs)
        }
        kernels.append(
            reference_antisym_3x3_kernel(
                a[layer],
                np.asarray(blocks.b[layer], np.float64),
                np.asarray(blocks.c[layer], np.float64),
                np.asarray(blocks.d[layer], np.float64),
                cross_blocks,
                gamma,
            )
        )
    return kernels


def numpy_dense_kernels_from_kxk(blocks, kernel_size, gamma, antisymmetric):
    """Stacked packed k x k (anti-)centrosymmetric params -> list of dense
    fp64 (k, k, C, C) kernels, assembled through the reference's scalar
    per-channel loop (`reference_centrosym_matrix`) and per-pair mirror
    assignment — NOT through the repo's vectorized scatter.  The free-value
    consumption order (i ascending, then j in range(i, k), trainable center
    at its natural position in the centrosymmetric odd case) and the
    cross-pair flattening (c_out ascending, then c_in ascending) are part of
    the packed-representation contract, re-derived here independently."""
    diag = np.asarray(blocks.diag, np.float64)    # (L, n_free, C)
    cross = np.asarray(blocks.cross, np.float64)  # (L, k, k, P)
    num_layers, _, channels = diag.shape
    k = kernel_size
    pairs = [(i, j) for j in range(channels) for i in range(j + 1, channels)]
    kernels = []
    for layer in range(num_layers):
        kernel = np.zeros((k, k, channels, channels), np.float64)
        for ch in range(channels):
            kernel[:, :, ch, ch] = reference_centrosym_matrix(
                diag[layer, :, ch], k, gamma, antisymmetric
            )
        for p, (c_in, c_out) in enumerate(pairs):
            block = cross[layer, :, :, p]
            kernel[:, :, c_in, c_out] = block
            kernel[:, :, c_out, c_in] = -rot180(block)
        kernels.append(kernel)
    return kernels


def _numpy_integrator_step(x, kernel, bias, h, method):
    """One fp64 integrator step of dY/dt = relu(conv(Y) + b) — euler is the
    reference residual block (`models/tfkeras_resnets.py:69-92`); midpoint
    and rk4 are the multi-eval generalizations (ops/integrators.py)."""

    def f(y):
        return np.maximum(numpy_conv2d_same(y, kernel, bias=bias), 0.0)

    if method == "euler":
        return x + h * f(x)
    if method == "midpoint":
        return x + h * f(x + 0.5 * h * f(x))
    if method == "rk4":
        k1 = f(x)
        k2 = f(x + 0.5 * h * k1)
        k3 = f(x + 0.5 * h * k2)
        k4 = f(x + h * k3)
        return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    raise ValueError(method)


def numpy_single_block_forward(params, x, config):
    """Independent fp64 re-execution of the reference single-block forward:
    normalization -> stem conv + relu -> L x (y + h*relu(conv(y) + b)) ->
    GAP -> dense -> softmax (`models/tfkeras_resnets.py:28-94,547-602`),
    generalized over the integrator (euler/midpoint/rk4 — the multi-eval
    variants are the repo's TPU-native extension, ops/integrators.py).

    Scoped to the reference experiment family: identity-only stages, no
    BatchNorm, no pooling.  Returns (probs, logits)."""
    assert not config.use_batch_norm
    x = np.asarray(x, np.float64)
    if config.subtract_mean is not None:
        x = x - np.float64(config.subtract_mean)
    if config.divide_by_stddev is not None:
        x = x / np.float64(config.divide_by_stddev)

    stem = params["stem"]
    x = numpy_conv2d_same(
        x, stem.kernel, strides=tuple(config.strides[0]), bias=stem.bias
    )
    x = np.maximum(x, 0.0)

    for sp in params["stages"]:
        assert "conv_main" not in sp, "oracle covers identity-only stages"
        blocks = sp["blocks"]
        if hasattr(blocks, "diag"):  # general k x k packed (centrosymmetric)
            kernels = numpy_dense_kernels_from_kxk(
                blocks, config.kernel_size, config.gamma,
                antisymmetric=config.kernel_type == "antisymmetric",
            )
            biases = np.asarray(blocks.bias, np.float64)
        elif hasattr(blocks, "cross"):  # packed antisymmetric 3x3
            kernels = numpy_dense_kernels_from_packed(blocks, config.gamma)
            biases = np.asarray(blocks.bias, np.float64)
        else:  # regular stacked ConvParams
            kernels = [np.asarray(k, np.float64) for k in blocks.kernel]
            biases = np.asarray(blocks.bias, np.float64)
        for layer, kernel in enumerate(kernels):
            x = _numpy_integrator_step(
                x, kernel, biases[layer], config.h, config.integrator
            )

    x = x.mean(axis=(1, 2))  # global average pool
    head = params["head"]
    logits = x @ np.asarray(head.kernel, np.float64) + np.asarray(
        head.bias, np.float64
    )
    shifted = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(shifted) / np.exp(shifted).sum(axis=-1, keepdims=True)
    return probs, logits


def numpy_forward_from_reference_weights(weights, x, config):
    """fp64 forward directly from a REFERENCE-FORMAT weights payload (the
    list of {'kernel','bias'} dicts of `model_utils/weight_utils.py:23-39`:
    stem, one dense (3,3,C,C) kernel per residual layer, head) — without
    ever touching the repo's packed parameterization or import path.  This
    is the independent side of the golden-fixture interop proof
    (tests/test_golden_fixture.py): reference weights -> this oracle vs
    reference weights -> `import_reference_weights` -> `model.apply`.

    Scoped like `numpy_single_block_forward`: identity-only stages, Euler
    blocks, no BatchNorm.  Returns (probs, logits)."""
    assert not config.use_batch_norm and config.integrator == "euler"
    x = np.asarray(x, np.float64)
    if config.subtract_mean is not None:
        x = x - np.float64(config.subtract_mean)
    if config.divide_by_stddev is not None:
        x = x / np.float64(config.divide_by_stddev)

    it = iter(weights)
    stem = next(it)
    x = numpy_conv2d_same(
        x, stem["kernel"], strides=tuple(config.strides[0]), bias=stem["bias"]
    )
    x = np.maximum(x, 0.0)
    num_layers = sum(config.blocks_per_stage[: config.num_stages - 1])
    for _ in range(num_layers):
        layer = next(it)
        z = numpy_conv2d_same(x, layer["kernel"], bias=layer["bias"])
        x = x + config.h * np.maximum(z, 0.0)
    x = x.mean(axis=(1, 2))
    head = next(it)
    logits = x @ np.asarray(head["kernel"], np.float64) + np.asarray(
        head["bias"], np.float64
    )
    shifted = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(shifted) / np.exp(shifted).sum(axis=-1, keepdims=True)
    return probs, logits


def numpy_softmax_ce(logits, labels):
    """Mean categorical cross-entropy from logits, integer labels, fp64."""
    logits = np.asarray(logits, np.float64)
    shifted = logits - logits.max(axis=-1, keepdims=True)
    log_probs = shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    return -log_probs[np.arange(len(labels)), labels].mean()


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
