"""Space-to-depth packed convolution: an exact reshaping of a stride-1 3x3
SAME conv on (H, W, C) into a stride-1 3x3 SAME conv on (H/b, W/b, b*b*C).

Why (TPU): the headline experiment runs C=16 channels, so every conv matmul
has N=16 output columns against the MXU's 128 lanes — 8x lane padding waste.
Packing 2x2 spatial blocks into channels quadruples both channel dims
((32,32,16) -> (16,16,64)): measured on v5e, the packed im2col matmul shape
runs at ~135 TFLOP/s where the unpacked C=16 shape reaches ~22 TFLOP/s
(docs/RESULTS.md section 6).  The packed kernel carries 4x the nominal FLOPs
(3/4 of its cross-phase taps are structural zeros), but in padded-MXU-work
terms the packed conv does ~1.6x LESS work, and every elementwise op in the
integrator runs at 4x better lane utilization.

Exactness: space_to_depth is a permutation of pixels, so it commutes with
elementwise ops (relu, +bias broadcast per channel via the tiled packed
bias) and with the residual add.  The kernel transform below reproduces the
original SAME zero-padding exactly: packed tap (u, v) at phase (p, q)
reaches original tap (2u + r - p, 2v + s - q), which is a valid 3x3 offset
for exactly the in-range combinations; out-of-range combinations get a zero
weight, and packed-space zero padding supplies the same zeros the original
padding did (the reference conv semantics being reshaped:
`layers/tfkeras_layer_Conv2DAntisymmetric3By3.py:157-171`).

Layout convention: packed channel index c' = (p * b + q) * C + c for output
phase (p, q) — phase-major, original-channel-minor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), phase-major channel layout."""
    n, h, w, c = x.shape
    b = block
    assert h % b == 0 and w % b == 0, (h, w, b)
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/b, W/b, p, q, C)
    return x.reshape(n, h // b, w // b, b * b * c)


def depth_to_space(x: jax.Array, block: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    n, hb, wb, cb = x.shape
    b = block
    c = cb // (b * b)
    x = x.reshape(n, hb, wb, b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hb * b, wb * b, c)


@functools.lru_cache(maxsize=None)
def _pack_kernel_indices(block: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static gather map for the packed-kernel transform (3x3, stride 1).

    Returns (tap_index, valid) of shape (3, 3, b, b, b, b):
    tap_index[u, v, r, s, p, q] = flat 3*3 index of the original tap
    (di, dj) = (b*u + r - p, b*v + s - q) shifted by -1 (u, v, di, dj are
    stored 0-based), and valid marks in-range combinations."""
    b = block
    u = np.arange(3)[:, None, None, None, None, None] - 1
    v = np.arange(3)[None, :, None, None, None, None] - 1
    r = np.arange(b)[None, None, :, None, None, None]
    s = np.arange(b)[None, None, None, :, None, None]
    p = np.arange(b)[None, None, None, None, :, None]
    q = np.arange(b)[None, None, None, None, None, :]
    di = b * u + r - p
    dj = b * v + s - q
    shape = np.broadcast_shapes(di.shape, dj.shape)
    di, dj = np.broadcast_to(di, shape), np.broadcast_to(dj, shape)
    valid = (np.abs(di) <= 1) & (np.abs(dj) <= 1)
    tap = np.where(valid, (di + 1) * 3 + (dj + 1), 0).astype(np.int32)
    return tap, valid


def pack_kernel_s2d(kernel: jax.Array, block: int = 2) -> jax.Array:
    """(..., 3, 3, C, C) HWIO kernel -> (..., 3, 3, b²C, b²C) packed kernel.

    Works on a single kernel or a stacked (L, 3, 3, C, C) kernel (leading
    axes are preserved), as one vectorized gather + mask — cheap enough to
    run per train step on the materialized antisymmetric kernels."""
    b = block
    *lead, kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "s2d packing is specialized to 3x3 stride-1"
    tap, valid = _pack_kernel_indices(b)
    flat = kernel.reshape(*lead, 9, cin, cout)
    # gathered[..., u, v, r, s, p, q, ci, co]
    gathered = jnp.take(flat, jnp.asarray(tap.reshape(-1)), axis=len(lead))
    gathered = gathered.reshape(*lead, 3, 3, b, b, b, b, cin, cout)
    gathered = jnp.where(
        jnp.asarray(valid)[..., None, None], gathered, 0.0
    )
    # -> (..., u, v, (r s ci), (p q co))
    perm_lead = tuple(range(len(lead)))
    n = len(lead)
    gathered = gathered.transpose(
        *perm_lead, n, n + 1, n + 2, n + 3, n + 6, n + 4, n + 5, n + 7
    )
    return gathered.reshape(*lead, 3, 3, b * b * cin, b * b * cout)


def pack_bias_s2d(bias: jax.Array, block: int = 2) -> jax.Array:
    """(..., C) bias -> (..., b²C): every phase sees the original bias."""
    reps = (1,) * (bias.ndim - 1) + (block * block,)
    return jnp.tile(bias, reps)
