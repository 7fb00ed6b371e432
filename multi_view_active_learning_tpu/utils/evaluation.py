"""Vectorized pose evaluation metrics: MKPE (MPJPE), 3D-PCK, 3D-PCKh, 2D-PCKh.

The reference computes all of these with per-sample/per-joint Python loops
over gathered tensors (reference: utils/evaluation.py:61-208).  Here each
metric is a single vectorized expression over stacked arrays; semantics
(masking, normalization, strict `<` thresholds) are kept identical.

These run in NUMPY on the host, deliberately: the inputs are tiny
([N, K, 3] keypoints, already fetched from the device by the eval loop),
and on a tunneled TPU runtime every eager jnp op is a remote dispatch —
a metrics pass written in jnp measured ~8 s per eval against milliseconds
in numpy.

Canonical shapes:
  pred_3d: [N, K, 3]   predicted 3D keypoints
  gt_3d:   [N, K, 3]   ground truth
  valid:   [N, K]      per-(sample, joint) validity
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from . import get_logger

PCK_THRESHOLDS_MM = (1, 2, 3, 4, 5)
PCKH_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)


def _np(x) -> np.ndarray:
    # np.asarray on a jax array fetches it; plain arrays pass through.
    return np.asarray(x)


def _dists(pred_3d, gt_3d, valid=None):
    d = np.square(pred_3d - gt_3d)  # [N, K, 3]
    if valid is not None:
        d = np.where(valid[..., None] > 0, d, 0.0)
    return np.sqrt(np.sum(d, axis=-1))  # [N, K]


def compute_mkpe(pred_3d, gt_3d, valid) -> np.ndarray:
    """Mean keypoint error (MPJPE): per-joint error summed over samples,
    normalized by that joint's valid count, then averaged over joints —
    exactly the reference accumulation (utils/evaluation.py:198-208)."""
    pred_3d, gt_3d, valid = _np(pred_3d), _np(gt_3d), _np(valid)
    d = _dists(pred_3d, gt_3d, valid)  # [N, K]
    kpe = np.sum(d, axis=0)  # [K]
    count = np.sum(valid, axis=0)  # [K]
    # A joint with zero valid samples contributes 0/0 in the reference
    # (silent NaN poisoning the whole eval); exclude such joints from the
    # joint mean instead — no effect when every joint has support.
    has_support = count > 0
    if not has_support.all():
        get_logger(__name__).warning(
            "MKPE: %d joint(s) have no valid samples in this eval set; "
            "excluded from the joint mean." % int((~has_support).sum())
        )
    return np.float32(np.mean(kpe[has_support] / count[has_support]))


def compute_3d_pck(pred_3d, gt_3d, valid, threshold_mm: float) -> np.ndarray:
    """Per-joint PCK at an absolute mm threshold, counting only valid joints
    (reference: utils/evaluation.py:177-195).  Returns [K] numpy."""
    pred_3d, gt_3d, valid = _np(pred_3d), _np(gt_3d), _np(valid)
    d = _dists(pred_3d, gt_3d)  # [N, K]
    hit = (d < threshold_mm) & (valid > 0)
    count = np.sum(valid > 0, axis=0)
    return np.sum(hit, axis=0) / count


def compute_3d_pckh(pred_3d, gt_3d, threshold: float) -> np.ndarray:
    """Per-joint PCKh: threshold scales with the per-sample distance between
    joints 0 and 1 (the head segment on Panoptic); all joints counted,
    no validity mask — matching reference utils/evaluation.py:150-174."""
    pred_3d, gt_3d = _np(pred_3d), _np(gt_3d)
    seg = np.sqrt(np.sum(np.square(gt_3d[:, 0, :] - gt_3d[:, 1, :]), axis=-1))
    scale = seg * threshold  # [N]
    d = _dists(pred_3d, gt_3d)  # [N, K]
    hit = d < scale[:, None]
    return np.mean(hit.astype(np.float32), axis=0)


def compute_3d_pck_figure(
    pred_3d, gt_3d, valid, thresholds: Sequence[float] = PCK_THRESHOLDS_MM
) -> Tuple[Sequence[float], list]:
    return thresholds, [
        compute_3d_pck(pred_3d, gt_3d, valid, t).tolist() for t in thresholds
    ]


def compute_3d_pckh_figure(
    pred_3d, gt_3d, thresholds: Sequence[float] = PCKH_THRESHOLDS
) -> Tuple[Sequence[float], list]:
    return thresholds, [compute_3d_pckh(pred_3d, gt_3d, t).tolist() for t in thresholds]


def compute_pckh_2d(
    pred_2d, gt_2d, threshold: float, kp0: int = 0, kp1: int = 1
) -> np.ndarray:
    """2D PCKh: pred_2d/gt_2d [N, K, 2]; threshold scales with the per-sample
    distance between gt joints kp0 and kp1 (reference:
    utils/evaluation.py:65-93).  Returns per-joint [K] numpy."""
    pred_2d, gt_2d = _np(pred_2d), _np(gt_2d)
    seg = np.sqrt(
        np.sum(np.square(gt_2d[:, kp0, :] - gt_2d[:, kp1, :]), axis=-1)
    )
    scale = seg * threshold
    d = np.sqrt(np.sum(np.square(pred_2d - gt_2d), axis=-1))  # [N, K]
    hit = d < scale[:, None]
    return np.mean(hit.astype(np.float32), axis=0)


def compute_pckh_2d_figure(
    pred_2d, gt_2d, thresholds: Sequence[float] = PCKH_THRESHOLDS
) -> Tuple[Sequence[float], list]:
    return thresholds, [
        compute_pckh_2d(pred_2d, gt_2d, t).tolist() for t in thresholds
    ]
