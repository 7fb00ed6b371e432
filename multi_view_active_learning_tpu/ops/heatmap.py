"""Heatmap synthesis and decoding, batched on device.

Replaces three reference hot paths:
  * GT Gaussian heatmap synthesis in the data loader
    (reference: dataset/dataset.py:198-207) — here a single vectorized op
    over [..., K] keypoints, run on device for whole batches.
  * Hard-argmax 2D decode (reference: utils/evaluation.py:13-30) — the
    per-sample/per-joint Python loop becomes one reshape+argmax.
  * kornia.spatial_soft_argmax2d (reference: utils/triangulation.py:192-199)
    — softmax-expectation over the spatial grid.

All functions treat the trailing two axes as (h, w) and broadcast over any
leading batch axes, so they compose with vmap/shard_map without reshaping.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def render_gaussian_heatmaps(
    keypoints: jnp.ndarray,
    height: int,
    width: int,
    sigma: float,
) -> jnp.ndarray:
    """Render unnormalized Gaussians exp(-||p - kp||^2 / (2 sigma^2)).

    keypoints: [..., 2] in heatmap-grid coordinates (x, y).
    Returns [..., height, width] float32.

    Matches the reference's GT formula exactly
    (dataset/dataset.py:201-207): grid[..., 0] = x index, grid[..., 1] = y.
    """
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    kx = keypoints[..., 0:1]  # [..., 1]
    ky = keypoints[..., 1:2]
    dx2 = jnp.square(xs - kx)  # [..., width]
    dy2 = jnp.square(ys - ky)  # [..., height]
    exponent = dy2[..., :, None] + dx2[..., None, :]  # [..., h, w]
    return jnp.exp(-exponent / (2.0 * (sigma**2)))


def decode_argmax(
    heatmaps: jnp.ndarray, stride: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard-argmax decode: [..., h, w] -> (coords [..., 2], peak value [...]).

    coords are (x, y) * stride, matching the reference decode
    (utils/evaluation.py:24-27): x = idx % w, y = idx // w.
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    idx = jnp.argmax(flat, axis=-1)
    peak = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    x = (idx % w).astype(jnp.float32) * stride
    y = (idx // w).astype(jnp.float32) * stride
    return jnp.stack([x, y], axis=-1), peak


def soft_argmax(
    heatmaps: jnp.ndarray,
    stride: float = 1.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Spatial soft-argmax: softmax-weighted expected (x, y) coordinates.

    Equivalent to kornia.spatial_soft_argmax2d(normalized_coordinates=False)
    as used at reference utils/triangulation.py:192-199, scaled by `stride`.
    heatmaps: [..., h, w] -> coords [..., 2].
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    probs = jax.nn.softmax(temperature * flat, axis=-1)
    probs = probs.reshape(heatmaps.shape[:-2] + (h, w))
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    x = jnp.sum(probs, axis=-2) @ xs  # marginalize rows, expect over x
    y = jnp.sum(probs, axis=-1) @ ys
    return jnp.stack([x, y], axis=-1) * stride


def decode_keypoints(
    heatmaps: jnp.ndarray,
    stride: float,
    valid: jnp.ndarray,
    use_soft_argmax: bool = False,
) -> jnp.ndarray:
    """Decode [..., K, h, w] heatmaps to image-space keypoints [..., K, 2].

    Invalid joints decode to (0, 0), matching reference
    utils/evaluation.py:21-23.  `valid`: [..., K] bool.
    """
    if use_soft_argmax:
        coords = soft_argmax(heatmaps, stride=stride)
    else:
        coords, _ = decode_argmax(heatmaps, stride=stride)
    return jnp.where(valid[..., None], coords, jnp.zeros_like(coords))


def decode_keypoints_bbox(
    heatmaps: jnp.ndarray,
    bbox: jnp.ndarray,
    use_soft_argmax: bool = False,
) -> jnp.ndarray:
    """Decode heatmap coordinates scaled by the (square) bounding box.

    heatmaps: [..., K, h, w]; bbox: [..., 4] (left, top, right, bottom) ->
    coords [..., K, 2] in bbox-relative pixels.

    Reference contract: utils/evaluation.py:33-58 `get_pred_coordinates`
    (with its x/y bbox-dimension mix-up fixed — the reference acknowledges
    it only works for square boxes, evaluation.py:40; we scale x by width
    and y by height so non-square boxes also decode correctly).
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    if use_soft_argmax:
        coords = soft_argmax(heatmaps, stride=1.0)
    else:
        coords, _ = decode_argmax(heatmaps, stride=1.0)
    width = (bbox[..., 2] - bbox[..., 0])[..., None, None]
    height = (bbox[..., 3] - bbox[..., 1])[..., None, None]
    scale = jnp.concatenate(
        [width / float(w), height / float(h)], axis=-1
    )  # [..., 1, 2]
    return coords * scale


def integral_regression_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    joint_valid: jnp.ndarray | None = None,
    beta: float = 10.0,
    peak_threshold: float = 0.1,
) -> jnp.ndarray:
    """Soft-argmax (integral) coordinate-regression loss, NHWC.

    Beyond-reference training objective (the reference trains heatmap MSE
    only, pose_estimators/loss.py:10-24): the predicted keypoint is the
    softmax(beta * heatmap) spatial expectation — fully differentiable, so
    the sub-pixel coordinate itself is supervised (integral pose
    regression, Sun et al., ECCV'18).

    The regression target is the *linear* spatial expectation of the GT
    Gaussian heatmap (exactly the keypoint when its support lies in the
    crop), NOT the raw 2D keypoint — so targets automatically follow any
    on-device augmentation that transformed the GT heatmaps
    (data/augmentation.py rotations).

    pred/target: [N, h, w, K]; joint_valid: [N, K] bool (optional).
    Joints whose GT heatmap has no in-crop support (peak < peak_threshold)
    are excluded.  The per-joint error is L1 in *normalized* coordinates
    (|dx|/w + |dy|/h, so one unit == one full heatmap extent), averaged
    over valid joints — bounded ~[0, 2] regardless of resolution, which
    keeps TRAIN.LOSS_CLIP_VALUE semantics meaningful.
    """
    h, w = pred.shape[1], pred.shape[2]
    pred_k = jnp.moveaxis(pred, -1, 1)  # [N, K, h, w]
    tgt_k = jnp.moveaxis(target, -1, 1)
    pred_xy = soft_argmax(pred_k, stride=1.0, temperature=beta)  # [N, K, 2]

    # Linear (not softmax) expectation of the GT Gaussian: its exact mean.
    tgt_sum = jnp.sum(tgt_k, axis=(-2, -1))  # [N, K]
    probs = tgt_k / jnp.maximum(tgt_sum, 1e-8)[..., None, None]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    tx = jnp.sum(probs, axis=-2) @ xs
    ty = jnp.sum(probs, axis=-1) @ ys
    tgt_xy = jnp.stack([tx, ty], axis=-1)  # [N, K, 2]

    valid = jnp.max(tgt_k, axis=(-2, -1)) > peak_threshold  # [N, K]
    if joint_valid is not None:
        valid = valid & joint_valid
    diff = jnp.abs(pred_xy - tgt_xy) / jnp.asarray(
        [float(w), float(h)], jnp.float32
    )
    err = jnp.sum(diff, axis=-1)  # [N, K]
    err = jnp.where(valid, err, 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1)


def heatmap_mse_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    joint_valid: jnp.ndarray | None = None,
    num_samples: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    """Masked heatmap MSE with the reference's normalization: summed squared
    error divided by (leading batch dim * h * w) — NOT by joint count
    (reference: pose_estimators/loss.py:14-20).

    pred/target: NHWC [N, h, w, K]; shapes must match.
    joint_valid: boolean mask broadcastable to pred's shape
    (e.g. [N, 1, 1, K] for per-(sample, joint) validity).
    num_samples: overrides the leading-dim count in the denominator — pass
    the number of REAL samples when the batch carries zero-loss padding
    rows, so tail batches aren't gradient-diluted relative to the
    reference's pad-free loaders (may be a traced scalar).
    """
    err = jnp.square(pred - target)
    if joint_valid is not None:
        err = jnp.where(joint_valid, err, jnp.zeros_like(err))
    n, h, w = pred.shape[0], pred.shape[1], pred.shape[2]
    if num_samples is None:
        num_samples = n
    return jnp.sum(err) / (num_samples * h * w)
