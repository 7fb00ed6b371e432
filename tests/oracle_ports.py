"""Line-faithful numpy/torch ports of the two third-party primitives the
reference's scoring paths depend on but that are not installable here
(zero-egress image): scikit-image's ``peak_local_max`` and kornia's
``spatial_soft_argmax2d``.

The reference (2022, WACV'23 code) calls

  * ``skimage.feature.peak_local_max(hm, min_distance=2, indices=True
    [, num_peaks=2])``  — reference strategy.py:1168-1170, 1204-1206
  * ``kornia.spatial_soft_argmax2d(heatmaps, normalized_coordinates=False)``
    — reference utils/triangulation.py:192-199

``indices=True`` pins the scikit-image generation to <= 0.19.x (the kwarg
was removed in 0.20), so `peak_local_max` here ports the 0.19.3 algorithm:

  1. candidate mask: ``image == maximum_filter(image, footprint=
     ones((2*min_distance+1,)*2), mode='nearest')``; a fully-flat image
     yields no peaks; candidates must exceed
     ``max(threshold_abs or image.min(), threshold_rel * image.max())``;
  2. ``exclude_border=True`` zeroes a ``min_distance``-wide border;
  3. coordinates sorted by intensity descending with a *stable* sort
     (ties keep row-major order);
  4. ``ensure_spacing``: greedy sweep in that order, rejecting any later
     candidate with Chebyshev distance (p_norm=inf) STRICTLY below
     ``spacing=min_distance`` of an accepted peak — a rejected candidate
     never rejects others; stop after ``num_peaks`` acceptances.

These ports are TEST ORACLES only — the product computes the same
quantities as fixed-shape jitted programs (ops/uncertainty.py,
ops/heatmap.py); tools/make_sal_parity_goldens.py injects these ports into
the reference checkout so its MPE/HP/BSB and soft-argmax code paths run
end to end to produce goldens.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi


def ensure_spacing(coords: np.ndarray, spacing: float, max_out=None) -> np.ndarray:
    """skimage._shared.coord.ensure_spacing (0.19.3), p_norm=inf, O(n^2).

    Greedy in the given order: accept a point unless an already-accepted
    point lies strictly closer than `spacing` in Chebyshev distance.
    """
    accepted: list[np.ndarray] = []
    for c in coords:
        if max_out is not None and len(accepted) >= max_out:
            break
        if all(np.max(np.abs(c - a)) >= spacing for a in accepted):
            accepted.append(c)
    if not accepted:
        return np.empty((0, coords.shape[1] if coords.ndim == 2 else 2), int)
    return np.stack(accepted)


def peak_local_max(
    image: np.ndarray,
    min_distance: int = 1,
    threshold_abs=None,
    threshold_rel=None,
    exclude_border=True,
    indices: bool = True,
    num_peaks=np.inf,
    footprint=None,
) -> np.ndarray:
    """scikit-image 0.19.3 ``peak_local_max`` for 2D images, labels=None.

    Returns an [N, 2] int array of (row, col) peak coordinates sorted by
    intensity descending (ties in row-major order), exactly the shape the
    reference consumes (strategy.py:1168-1172, 1204-1207).
    """
    assert indices, "the reference only ever uses indices=True"
    image = np.asarray(image)
    assert image.ndim == 2

    if isinstance(exclude_border, bool):
        border_width = (min_distance if exclude_border else 0,) * image.ndim
    elif np.isscalar(exclude_border):
        border_width = (int(exclude_border),) * image.ndim
    else:
        border_width = tuple(exclude_border)

    threshold = threshold_abs if threshold_abs is not None else image.min()
    if threshold_rel is not None:
        threshold = max(threshold, threshold_rel * image.max())

    if footprint is None:
        size = 2 * min_distance + 1
        footprint = np.ones((size,) * image.ndim, dtype=bool)

    # _get_peak_mask
    if footprint.size == 1 or image.size == 1:
        mask = image > threshold
    else:
        image_max = ndi.maximum_filter(image, footprint=footprint, mode="nearest")
        mask = image == image_max
        if np.all(mask):  # trivial (flat) image -> no peaks
            mask = np.zeros_like(mask)
        mask = mask & (image > threshold)

    # _exclude_border
    for i, width in enumerate(border_width):
        if width == 0:
            continue
        mask[(slice(None),) * i + (slice(None, width),)] = False
        mask[(slice(None),) * i + (slice(-width, None),)] = False

    # _get_high_intensity_peaks
    coord = np.nonzero(mask)
    intensities = image[coord]
    idx_maxsort = np.argsort(-intensities, kind="stable")
    coord = np.column_stack(coord)[idx_maxsort]
    max_out = int(num_peaks) if np.isfinite(num_peaks) else None
    coord = ensure_spacing(coord, spacing=min_distance, max_out=max_out)
    if len(coord) > num_peaks:
        coord = coord[: int(num_peaks)]
    return coord


def spatial_soft_argmax2d(
    input, temperature=None, normalized_coordinates: bool = True, eps: float = 1e-8
):
    """kornia.geometry.subpix.spatial_soft_argmax2d (kornia 0.6.x), torch.

    input: [B, C, H, W] torch tensor -> [B, C, 2] expected (x, y)
    coordinates; with normalized_coordinates=False the grid is pixel
    indices 0..W-1 / 0..H-1 (the reference's usage,
    utils/triangulation.py:192-199).
    """
    import torch
    import torch.nn.functional as F

    if temperature is None:
        temperature = torch.tensor(1.0)
    batch_size, channels, height, width = input.shape
    x = input.view(batch_size, channels, -1)
    x_soft = F.softmax(x * temperature, dim=-1)

    if normalized_coordinates:
        xs = torch.linspace(-1.0, 1.0, width, dtype=input.dtype)
        ys = torch.linspace(-1.0, 1.0, height, dtype=input.dtype)
    else:
        xs = torch.arange(width, dtype=input.dtype)
        ys = torch.arange(height, dtype=input.dtype)
    # create_meshgrid returns [1, H, W, 2] with last dim (x, y)
    pos_y, pos_x = torch.meshgrid(ys, xs, indexing="ij")
    pos_x = pos_x.reshape(-1)
    pos_y = pos_y.reshape(-1)

    expected_y = torch.sum(pos_y * x_soft, dim=-1, keepdim=True)
    expected_x = torch.sum(pos_x * x_soft, dim=-1, keepdim=True)
    output = torch.cat([expected_x, expected_y], dim=-1)
    return output.view(batch_size, channels, 2)
