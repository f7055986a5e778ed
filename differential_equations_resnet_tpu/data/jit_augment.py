"""In-jit, batch-vectorized random augmentations.

Device-side equivalents of the host preprocessors' random transforms
(`data/preprocessors.py`; reference semantics at
`dataset_utils/tf_dataset_preprocessors_image_classification.py:83-181`),
written as pure functions of a `jax.random` key so they can run INSIDE the
jitted train step / device-resident epoch (`train/train_step.py::
make_device_epoch`).  On TPU they fuse into the input cast — augmented
training costs the same as unaugmented, where the host pipeline's ~9k img/s
demand would otherwise serialize against the single-core host.

All functions take float images on the 0-255 scale, shape (N, H, W, C), and
draw independent parameters per image (matching the per-image draws of the
host/reference versions; only the RNG stream differs).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def random_flip_left_right(key: jax.Array, images: jax.Array) -> jax.Array:
    """Per-image 50% horizontal flip (reference RandomFlipLeftRight)."""
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1], images)


def random_brightness(
    key: jax.Array, images: jax.Array, max_delta: float = 0.5
) -> jax.Array:
    """Add a per-image uniform delta in [-max_delta, max_delta] on the
    unit-float scale, then round+clip back to 0-255 — bit-parity with the
    host RandomBrightness's integer-input path (preprocessors.py)."""
    deltas = jax.random.uniform(
        key, (images.shape[0],), minval=-max_delta, maxval=max_delta
    )
    out = images / 255.0 + deltas[:, None, None, None]
    return jnp.clip(jnp.round(out * 255.0), 0.0, 255.0)


def random_crop(
    key: jax.Array, images: jax.Array, scale: float = 0.9
) -> jax.Array:
    """Per-image square crop with side = int(min(H, W) * scale) at a uniform
    offset (reference RandomCrop semantics; the output shape is static)."""
    n, h, w = images.shape[:3]
    side = int(min(h, w) * scale)
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (n,), 0, h - side + 1)
    lefts = jax.random.randint(kl, (n,), 0, w - side + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(
            img, (top, left, 0), (side, side, img.shape[-1])
        )

    return jax.vmap(crop_one)(images, tops, lefts)


def pad_random_crop(
    key: jax.Array, images: jax.Array, padding: int = 4
) -> jax.Array:
    """Standard CIFAR augmentation: reflect-free zero-pad by `padding` then
    crop back to the original size at a per-image uniform offset.  (Not in
    the reference's preprocessor set, but the de-facto CIFAR recipe; kept
    shape-preserving so it composes with any model config.)"""
    n, h, w = images.shape[:3]
    padded = jnp.pad(
        images, ((0, 0), (padding, padding), (padding, padding), (0, 0))
    )
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (n,), 0, 2 * padding + 1)
    lefts = jax.random.randint(kl, (n,), 0, 2 * padding + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left, 0), (h, w, img.shape[-1]))

    return jax.vmap(crop_one)(padded, tops, lefts)


def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """tf.image-convention RGB->HSV on unit floats (port of the host
    `preprocessors.rgb_to_hsv`)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def random_saturation(
    key: jax.Array, images: jax.Array, lower: float = 0.5, upper: float = 1.5
) -> jax.Array:
    """Scale HSV saturation by a per-image uniform factor in [lower, upper]
    (tf.image.random_saturation parity), rounded back to the 0-255 grid like
    the host RandomSaturation's integer-input path."""
    factors = jax.random.uniform(
        key, (images.shape[0],), minval=lower, maxval=upper
    )
    hsv = _rgb_to_hsv(images / 255.0)
    s = jnp.clip(hsv[..., 1] * factors[:, None, None], 0.0, 1.0)
    rgb = _hsv_to_rgb(jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1))
    return jnp.clip(jnp.round(rgb * 255.0), 0.0, 255.0)


def compose(*fns: Callable[[jax.Array, jax.Array], jax.Array]):
    """Chain augmentations; each gets an independent key split."""

    def apply(key: jax.Array, images: jax.Array) -> jax.Array:
        keys = jax.random.split(key, len(fns))
        for fn, k in zip(fns, keys):
            images = fn(k, images)
        return images

    return apply


def standard_cifar_augment(
    flip: bool = True, crop_padding: int = 4, brightness_delta: float = 0.0
):
    """The usual CIFAR recipe as one composable callable for
    `make_device_epoch(augment=...)` / `Training(jit_augment=...)`."""
    fns: list = []
    if crop_padding:
        fns.append(lambda k, x: pad_random_crop(k, x, crop_padding))
    if flip:
        fns.append(random_flip_left_right)
    if brightness_delta:
        fns.append(lambda k, x: random_brightness(k, x, brightness_delta))
    return compose(*fns)
