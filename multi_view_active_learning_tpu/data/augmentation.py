"""RandAugment on device.

The reference augments per sample with PIL on dataloader CPU workers
(dataset/augmentation.py:15-116).  Here the op set runs as batched jnp on
float images in [0, 255] (layout [N, H, W, 3]) alongside the GT heatmaps
[N, h, w, K].  Per-sample op choice is a one-hot blend over the (static) op
list under vmap — each branch is cheap elementwise work, and augmentation is
off by default (DATA.NUM_AUG = 0, dataset/config.py:43).

Two reference bugs fixed (SURVEY.md §"known quirks"):
  * Rotate now actually rotates the heatmaps with the image
    (augmentation.py:22 discarded the rotated heatmap);
  * magnitudes follow the documented [minval, maxval] ranges.

PIL-semantics notes: Equalize implements PIL's exact integer LUT; Posterize
masks bits; Solarize thresholds at >= like ImageOps; the Enhance ops
(Color/Contrast/Brightness/Sharpness) are float blends `base + v * (img -
base)` matching ImageEnhance, with Contrast using the rounded grayscale mean
and Sharpness PIL's SMOOTH kernel with edge-preserving borders.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Plain tuple, not jnp.array: a module-level device array would initialize
# the jax backend (on TPU: connect the device client) as an import side
# effect — which crashes e.g. a forkserver preload of this module.  jnp ops
# broadcast the tuple at trace time.
_GRAY = np.asarray((0.299, 0.587, 0.114), dtype=np.float32)


def _rotate_bilinear(img: jnp.ndarray, degrees: jnp.ndarray) -> jnp.ndarray:
    """Rotate [H, W, C] about the center by `degrees`, bilinear, zero fill
    (PIL Image.rotate semantics, BICUBIC approximated by bilinear)."""
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = -degrees * jnp.pi / 180.0  # inverse map
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    src_x = cos * xs + sin * ys + cx
    src_y = -sin * xs + cos * ys + cy
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]  # [H, W, C]
        return vals * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx[..., None]) + v01 * fx[..., None]
    bot = v10 * (1 - fx[..., None]) + v11 * fx[..., None]
    return top * (1 - fy[..., None]) + bot * fy[..., None]


def _autocontrast(img: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min/max stretch (ImageOps.autocontrast, cutoff=0)."""
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _equalize(img: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageOps.equalize integer-LUT semantics, per channel."""
    x = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)  # [H, W, C]

    def chan(c):
        histo = jnp.zeros((256,), jnp.int32).at[c.reshape(-1)].add(1)
        nonzero = histo > 0
        # last nonzero bin value
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        last = histo[last_idx]
        step = (jnp.sum(histo) - last) // 255
        cumsum = jnp.cumsum(histo)
        lut_shifted = (jnp.concatenate([jnp.zeros(1, jnp.int32), cumsum[:-1]])
                       + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(lut_shifted, 0, 255)
        out = lut[c]
        return jnp.where(step == 0, c, out)

    return jax.vmap(chan, in_axes=2, out_axes=2)(x).astype(jnp.float32)


def _invert(img):
    return 255.0 - img


def _posterize(img: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Keep the top `bits` bits (ImageOps.posterize); bits is traced."""
    b = jnp.clip(bits.astype(jnp.int32), 1, 8)
    mask = (255 >> (8 - b)) << (8 - b)
    x = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)
    return (x & mask).astype(jnp.float32)


def _solarize(img: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(img >= threshold, 255.0 - img, img)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' conversion (integer rounding), broadcast back to 3 channels."""
    l = jnp.round(jnp.tensordot(img, _GRAY, axes=([-1], [0])))
    return jnp.repeat(l[..., None], 3, axis=-1)


def _blend(base: jnp.ndarray, img: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(base + v * (img - base), 0.0, 255.0)


def _color(img, v):
    return _blend(_grayscale(img), img, v)


def _contrast(img, v):
    mean = jnp.round(jnp.mean(_grayscale(img)[..., 0]) + 0.5)
    return _blend(jnp.full_like(img, mean), img, v)


def _brightness(img, v):
    return _blend(jnp.zeros_like(img), img, v)


def _sharpness(img, v):
    """ImageEnhance.Sharpness: blend with PIL SMOOTH-filtered image; PIL
    leaves a 1-pixel border unfiltered."""
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    # depthwise: apply the same kernel to each channel independently
    smoothed = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.tile(kernel[None, None], (3, 1, 1, 1)),
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0].transpose(1, 2, 0)
    h, w = img.shape[0], img.shape[1]
    border = jnp.zeros((h, w, 1), bool).at[1:-1, 1:-1].set(True)
    smoothed = jnp.where(border, smoothed, img)
    return _blend(smoothed, img, v)


# Op table: (fn(img, heatmap, value) -> (img, heatmap), minval, maxval).
def _op_rotate(img, heat, v, flip_sign):
    v = jnp.where(flip_sign, -v, v)
    return _rotate_bilinear(img, v), _rotate_bilinear(heat, v)


_IMAGE_OPS = [
    (lambda img, v: _autocontrast(img), 0.0, 1.0),
    (lambda img, v: _equalize(img), 0.0, 1.0),
    (lambda img, v: _invert(img), 0.0, 1.0),
    (_posterize, 0.0, 4.0),
    (_solarize, 0.0, 256.0),
    (_color, 0.1, 1.9),
    (_contrast, 0.1, 1.9),
    (_brightness, 0.1, 1.9),
    (_sharpness, 0.1, 1.9),
]


@partial(
    jax.jit,
    static_argnames=("num_aug", "magnitude", "use_rotation", "use_image_aug",
                     "const_magnitude"),
)
def rand_augment(
    rng_key: jax.Array,
    images: jnp.ndarray,  # [N, H, W, 3] float in [0, 255]
    heatmaps: jnp.ndarray,  # [N, h, w, K]
    num_aug: int,
    magnitude: int,
    use_rotation: bool = True,
    use_image_aug: bool = True,
    const_magnitude: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply `num_aug` randomly chosen ops per sample
    (reference: dataset/augmentation.py:99-116)."""
    n_rot = 1 if use_rotation else 0
    n_img = len(_IMAGE_OPS) if use_image_aug else 0
    n_ops = n_rot + n_img
    if n_ops == 0 or num_aug == 0:
        return images, heatmaps

    def one_sample(key, img, heat):
        def body(carry, key_i):
            img, heat = carry
            k_op, k_mag, k_sign = jax.random.split(key_i, 3)
            op_idx = jax.random.randint(k_op, (), 0, n_ops)
            if const_magnitude:
                frac = jnp.float32(magnitude) / 30.0
            else:
                frac = jax.random.uniform(k_mag) * jnp.float32(magnitude) / 30.0
            flip = jax.random.uniform(k_sign) > 0.5
            branch = 0
            outs_img, outs_heat = [], []
            if use_rotation:
                v = frac * 30.0
                ri, rh = _op_rotate(img, heat, v, flip)
                outs_img.append(jnp.where(op_idx == branch, ri, img))
                outs_heat.append(jnp.where(op_idx == branch, rh, heat))
                branch += 1
            if use_image_aug:
                for fn, lo, hi in _IMAGE_OPS:
                    v = frac * (hi - lo) + lo
                    oi = fn(img, v)
                    outs_img.append(jnp.where(op_idx == branch, oi, img))
                    outs_heat.append(heat)
                    branch += 1
            # Exactly one branch differs from img; sum of deltas applies it.
            new_img = img + sum(o - img for o in outs_img)
            new_heat = heat + sum(o - heat for o in outs_heat)
            return (new_img, new_heat), None

        keys = jax.random.split(key, num_aug)
        (img, heat), _ = jax.lax.scan(body, (img, heat), keys)
        return img, heat

    keys = jax.random.split(rng_key, images.shape[0])
    return jax.vmap(one_sample)(keys, images, heatmaps)
