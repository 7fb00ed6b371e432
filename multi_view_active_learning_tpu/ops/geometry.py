"""Camera model and projective geometry.

Host side (numpy): the `Camera` dataclass used during data preparation —
crop/resize intrinsic updates and full-distortion projection
(reference: utils/triangulation.py:25-74, 433-456).

Device side (jnp): batched pinhole projection and homogeneous converters used
inside jitted triangulation and scoring (reference:
utils/triangulation.py:387-430, 459-484) — written as pure, fixed-shape
functions that vmap/jit cleanly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


# ---------------------------------------------------------------------------
# Host-side camera model (numpy; runs in the data pipeline).
# ---------------------------------------------------------------------------


class Camera:
    """Pinhole camera with optional Brown distortion.

    Convention: x_cam = R @ x_world + t; pixel = K @ x_cam (then distortion).
    Matches reference utils/triangulation.py:25-74.
    """

    def __init__(self, R, t, K, dist=None, name: str = ""):
        self.R = np.asarray(R, dtype=np.float64).copy()
        assert self.R.shape == (3, 3)
        self.t = np.asarray(t, dtype=np.float64).reshape(3, 1).copy()
        self.K = np.asarray(K, dtype=np.float64).copy()
        assert self.K.shape == (3, 3)
        self.dist = None if dist is None else np.asarray(dist, dtype=np.float64).flatten()
        self.name = name

    def update_after_crop(self, bbox) -> None:
        """Shift the principal point after cropping to bbox=(l, u, r, b)
        (reference: utils/triangulation.py:44-52)."""
        left, upper, _, _ = bbox
        self.K[0, 2] -= left
        self.K[1, 2] -= upper

    def update_after_resize(self, image_shape, new_width, new_height) -> None:
        """Scale focal lengths and principal point after a resize
        (reference: utils/triangulation.py:54-66)."""
        height, width = image_shape
        sx = new_width / width
        sy = new_height / height
        self.K[0, 0] *= sx
        self.K[1, 1] *= sy
        self.K[0, 2] *= sx
        self.K[1, 2] *= sy

    @property
    def extrinsics(self) -> np.ndarray:
        return np.hstack([self.R, self.t])

    @property
    def projection(self) -> np.ndarray:
        return self.K @ self.extrinsics

    def project(self, points_3d: np.ndarray) -> np.ndarray:
        """Project world points [N, 3] -> pixels [N, 2], with distortion when
        the camera has it (reference: utils/triangulation.py:153-165)."""
        if self.dist is not None:
            return project_points_distorted_np(
                points_3d, self.K, self.R, self.t, self.dist
            )
        return project_points_np(self.projection, points_3d)


def project_points_np(proj: np.ndarray, points_3d: np.ndarray) -> np.ndarray:
    """Distortion-free projection, numpy host path
    (reference: utils/triangulation.py:459-484)."""
    homo = np.hstack([points_3d, np.ones((len(points_3d), 1))])
    result = homo @ proj.T
    z = result[:, 2:3]
    z = np.where(z == 0, np.ones_like(z), z)
    return result[:, :2] / z


def project_points_distorted_np(X, K, R, t, kd) -> np.ndarray:
    """Brown-model distorted projection.

    NOTE (quirk replicated for data-prep parity): the reference applies the
    intrinsic matrix sequentially in place — the updated x coordinate feeds
    the y row (utils/triangulation.py:454-455) and the updated tangential x
    feeds the y tangential term (:449-453).  For real rigs K[1,0] == 0 so the
    intrinsic sequencing is inert, but the tangential sequencing is not; we
    replicate both so ground-truth 2D keypoints (and therefore GT heatmaps)
    match the reference bit-for-bit.
    """
    X = np.asarray(X, dtype=np.float64)
    x = np.asarray(R @ X.T + t.reshape(3, 1))
    x[0:2, :] = x[0:2, :] / x[2, :]
    r = x[0, :] * x[0, :] + x[1, :] * x[1, :]
    radial = 1 + kd[0] * r + kd[1] * r * r + kd[4] * r * r * r
    x[0, :] = (
        x[0, :] * radial
        + 2 * kd[2] * x[0, :] * x[1, :]
        + kd[3] * (r + 2 * x[0, :] * x[0, :])
    )
    x[1, :] = (
        x[1, :] * radial
        + 2 * kd[3] * x[0, :] * x[1, :]
        + kd[2] * (r + 2 * x[1, :] * x[1, :])
    )
    x[0, :] = K[0, 0] * x[0, :] + K[0, 1] * x[1, :] + K[0, 2]
    x[1, :] = K[1, 0] * x[0, :] + K[1, 1] * x[1, :] + K[1, 2]
    return x.T[:, :2]


# ---------------------------------------------------------------------------
# Bounding-box helpers (host side; reference: utils/triangulation.py:96-134).
# ---------------------------------------------------------------------------


def get_square_bbox(bbox) -> Tuple[int, int, int, int]:
    """Stretch the short side so the box is square."""
    left, upper, right, lower = bbox
    width, height = right - left, lower - upper
    if width > height:
        y_center = (upper + lower) // 2
        upper = y_center - width // 2
        lower = upper + width
    else:
        x_center = (left + right) // 2
        left = x_center - height // 2
        right = left + height
    return left, upper, right, lower


def scale_bbox(bbox, scale: float) -> Tuple[int, int, int, int]:
    left, upper, right, lower = bbox
    width, height = right - left, lower - upper
    x_center, y_center = (right + left) // 2, (lower + upper) // 2
    new_width, new_height = int(scale * width), int(scale * height)
    new_left = x_center - new_width // 2
    new_right = new_left + new_width
    new_upper = y_center - new_height // 2
    new_lower = new_upper + new_height
    return new_left, new_upper, new_right, new_lower


def crop_image(image: np.ndarray, bbox) -> np.ndarray:
    """Crop with zero-fill for out-of-bounds regions
    (reference: utils/triangulation.py:77-93) — pure numpy, no PIL."""
    left, upper, right, lower = (int(v) for v in bbox)
    out_h, out_w = lower - upper, right - left
    out = np.zeros((out_h, out_w) + image.shape[2:], dtype=image.dtype)
    src_y0, src_y1 = max(upper, 0), min(lower, image.shape[0])
    src_x0, src_x1 = max(left, 0), min(right, image.shape[1])
    if src_y1 > src_y0 and src_x1 > src_x0:
        out[src_y0 - upper : src_y1 - upper, src_x0 - left : src_x1 - left] = image[
            src_y0:src_y1, src_x0:src_x1
        ]
    return out


def normalize_image(image: np.ndarray) -> np.ndarray:
    """ImageNet normalization (reference: utils/triangulation.py:137-145)."""
    return (image / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_image(image: np.ndarray) -> np.ndarray:
    return np.uint8(np.clip(255.0 * (image * IMAGENET_STD + IMAGENET_MEAN), 0, 255))


# ---------------------------------------------------------------------------
# Device-side (jnp) projective geometry — batched, fixed-shape.
# ---------------------------------------------------------------------------


def homogeneous_to_euclidean(points: jnp.ndarray) -> jnp.ndarray:
    """[..., M+1] -> [..., M] with a z == 0 guard
    (reference: utils/triangulation.py:387-405)."""
    z = points[..., -1:]
    z = jnp.where(z == 0, jnp.ones_like(z), z)
    return points[..., :-1] / z


def euclidean_to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """[..., M] -> [..., M+1]."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def project_points(proj: jnp.ndarray, points_3d: jnp.ndarray) -> jnp.ndarray:
    """Batched pinhole projection.

    proj: [..., 3, 4]; points_3d: [..., N, 3] -> [..., N, 2].
    Leading batch dims of `proj` and `points_3d` broadcast.
    """
    homo = euclidean_to_homogeneous(points_3d)  # [..., N, 4]
    result = jnp.einsum("...ij,...nj->...ni", proj, homo)  # [..., N, 3]
    return homogeneous_to_euclidean(result)


def reprojection_error(
    keypoints_3d: jnp.ndarray,
    keypoints_2d: jnp.ndarray,
    proj: jnp.ndarray,
) -> jnp.ndarray:
    """Half-L2 reprojection error per (point, view)
    (reference: utils/triangulation.py:371-384).

    keypoints_3d: [..., N, 3]; keypoints_2d: [..., V, N, 2];
    proj: [..., V, 3, 4] -> errors [..., V, N].
    """
    reproj = project_points(proj, keypoints_3d[..., None, :, :])  # [..., V, N, 2]
    diff = keypoints_2d - reproj
    return 0.5 * jnp.sqrt(jnp.sum(diff * diff, axis=-1))
