"""On-device image ops: batched bilinear crop+resize.

Completes the device-side image path (normalization, Gaussian GT synthesis
and RandAugment live in data/pipeline.py + data/augmentation.py): when the
source frames are already device-resident — shared full frames feeding many
person crops, synthetic pipelines, or re-cropping under augmentation — the
crop+resize that the reference does per view with PIL on the host
(dataset/dataset.py:180, 208-211) runs as one gather-based XLA op over the
whole batch.

Out-of-bounds regions are zero-filled, matching the host crop semantics
(reference: utils/triangulation.py:77-93).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_and_resize_bilinear(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """images: [N, H, W, C] (any float/uint dtype); boxes: [N, 4]
    (left, top, right, bottom) in pixel coordinates, may exceed the image.
    Returns [N, out_h, out_w, C] float32.

    Sampling uses the same pixel-grid convention as the host path: output
    pixel (i, j) samples the source at
    left + (j + 0.5) * box_w / out_w - 0.5 (area-consistent, so a same-size
    crop is an identity up to interpolation).
    """
    images = images.astype(jnp.float32)
    N, H, W, C = images.shape

    def one(img, box):
        left, top, right, bottom = box[0], box[1], box[2], box[3]
        bw = right - left
        bh = bottom - top
        xs = left + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * bw / out_w - 0.5
        ys = top + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * bh / out_h - 0.5
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = (xs - x0)[None, :, None]  # [1, out_w, 1]
        fy = (ys - y0)[:, None, None]  # [out_h, 1, 1]

        def gather(yi, xi):
            inb = ((yi >= 0) & (yi < H))[:, None] & ((xi >= 0) & (xi < W))[None, :]
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            vals = img[yc][:, xc]  # [out_h, out_w, C]
            return vals * inb[..., None]

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        top_row = v00 * (1 - fx) + v01 * fx
        bot_row = v10 * (1 - fx) + v11 * fx
        return top_row * (1 - fy) + bot_row * fy

    return jax.vmap(one)(images, boxes.astype(jnp.float32))


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_resize_uint8(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Batched view crop for the DATA.DEVICE_CROP pipeline mode.

    images: [B, V, H, W, 3] uint8 full frames; boxes: [B, V, 4] square
    bboxes (left, top, right, bottom).  Returns [B, V, out_h, out_w, 3]
    uint8 crops — same dtype contract as the host crop path
    (data/pipeline.py::prepare_views_host), so every downstream consumer
    (device_prepare, Engine.forward's fused uint8 normalization) is
    unchanged.  Rounding to uint8 costs at most the same quantization the
    host path's PIL resize already pays.
    """
    B, V = images.shape[0], images.shape[1]
    flat = images.reshape((B * V,) + images.shape[2:])
    out = crop_and_resize_bilinear(
        flat, boxes.reshape(B * V, 4), out_h, out_w
    )
    out = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    return out.reshape((B, V, out_h, out_w, 3))
