"""Visualization helpers: heatmap grids, 2D keypoint overlays, PCK curves.

Reference: utils/visualization.py:14-64 and evaluation.plot_pckh_figure
(utils/evaluation.py:109-118).  Figures render to HWC uint8 numpy arrays
(suitable for MetricsWriter / TensorBoard add_image).  matplotlib is
optional; when absent the functions fall back to raw array compositing so
the pipeline never hard-depends on a plotting stack.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def _fig_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf.copy()


_PCK_FIG = None  # reused figure: subplots() is ~10x the cost of plotting


def plot_pckh_figure(thresholds: Sequence[float], pck: Sequence[float]) -> np.ndarray:
    """PCK-vs-threshold curve as an image (reference:
    utils/evaluation.py:109-118).  The figure object is reused across calls
    — training logs render 20+ of these per log point and figure creation
    dominates on a 1-core host."""
    global _PCK_FIG
    plt = _mpl()
    if plt is None:
        # 1-pixel-per-threshold fallback bar strip.
        strip = (np.asarray(pck, dtype=np.float64) * 255).astype(np.uint8)
        return np.tile(strip[None, :, None], (16, 1, 3))
    if _PCK_FIG is None:
        _PCK_FIG = plt.subplots(figsize=(4, 3))
    fig, axis = _PCK_FIG
    axis.clear()
    axis.set_ylim((0.0, 1.0))
    axis.plot(thresholds, pck, "r+")
    axis.plot(thresholds, pck)
    axis.grid(True)
    return _fig_to_array(fig)


def heatmap_grid(heatmaps: np.ndarray, max_cols: int = 8) -> np.ndarray:
    """Tile [K, h, w] heatmaps into one normalized grayscale image
    (reference: utils/visualization.py heatmap matshow grids)."""
    heatmaps = np.asarray(heatmaps)
    k, h, w = heatmaps.shape
    cols = min(k, max_cols)
    rows = (k + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w), dtype=np.float64)
    for i in range(k):
        r, c = divmod(i, cols)
        hm = heatmaps[i]
        rng = hm.max() - hm.min()
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = (
            (hm - hm.min()) / rng if rng > 0 else 0.0
        )
    img = (grid * 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def overlay_keypoints(
    image: np.ndarray,
    keypoints_2d: np.ndarray,
    color=(255, 0, 0),
    radius: int = 2,
    gt_keypoints_2d: Optional[np.ndarray] = None,
    gt_color=(0, 255, 0),
) -> np.ndarray:
    """Draw predicted (and optionally GT) 2D keypoints on an HWC uint8 image
    (reference: utils/visualization.py keypoint overlays)."""
    img = np.array(image, dtype=np.uint8, copy=True)
    h, w = img.shape[:2]

    def draw(kps, col):
        for x, y in np.asarray(kps):
            xi, yi = int(round(x)), int(round(y))
            if 0 <= xi < w and 0 <= yi < h:
                y0, y1 = max(yi - radius, 0), min(yi + radius + 1, h)
                x0, x1 = max(xi - radius, 0), min(xi + radius + 1, w)
                img[y0:y1, x0:x1] = col

    draw(keypoints_2d, color)
    if gt_keypoints_2d is not None:
        draw(gt_keypoints_2d, gt_color)
    return img


def pred_vs_gt_heatmaps(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Stack predicted and GT heatmap grids vertically for side-by-side
    inspection (reference: utils/visualization.py pred-vs-gt grid)."""
    top = heatmap_grid(pred)
    bottom = heatmap_grid(gt)
    w = max(top.shape[1], bottom.shape[1])

    def pad(a):
        return np.pad(a, ((0, 0), (0, w - a.shape[1]), (0, 0)))

    return np.concatenate([pad(top), pad(bottom)], axis=0)
