"""Geometry core: cameras, bbox utils, projection, homogeneous converters.

Golden values are computed with independent float64 numpy formulas, matching
the reference semantics at utils/triangulation.py:25-150, 387-484.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu.ops import geometry


def test_camera_projection_matrix():
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    K = np.array([[100.0, 0, 50], [0, 120.0, 60], [0, 0, 1]])
    cam = geometry.Camera(R, t, K)
    expected = K @ np.hstack([R, t.reshape(3, 1)])
    np.testing.assert_allclose(cam.projection, expected)


def test_camera_update_after_crop_and_resize():
    K = np.array([[100.0, 0, 50], [0, 120.0, 60], [0, 0, 1]])
    cam = geometry.Camera(np.eye(3), np.zeros(3), K)
    cam.update_after_crop((10, 20, 90, 100))
    assert cam.K[0, 2] == 40 and cam.K[1, 2] == 40
    cam.update_after_resize((80, 80), 256, 256)
    scale = 256 / 80
    np.testing.assert_allclose(
        [cam.K[0, 0], cam.K[1, 1], cam.K[0, 2], cam.K[1, 2]],
        [100 * scale, 120 * scale, 40 * scale, 40 * scale],
    )


def test_project_points_np_matches_manual():
    rng = np.random.default_rng(0)
    proj = rng.normal(size=(3, 4))
    pts = rng.normal(size=(5, 3))
    got = geometry.project_points_np(proj, pts)
    homo = np.hstack([pts, np.ones((5, 1))]) @ proj.T
    expected = homo[:, :2] / homo[:, 2:3]
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_project_points_jnp_matches_np():
    rng = np.random.default_rng(1)
    proj = rng.normal(size=(2, 4, 3, 4)).astype(np.float32)
    # Keep the homogeneous z well away from zero so the comparison tests the
    # implementation, not float32 conditioning near the principal plane.
    proj[:, :, 2, :] = np.array([0.0, 0.0, 0.0, 1.0]) + 0.01 * rng.normal(
        size=(2, 4, 4)
    ).astype(np.float32)
    pts = rng.normal(size=(2, 4, 7, 3)).astype(np.float32)
    got = np.asarray(geometry.project_points(jnp.array(proj), jnp.array(pts)))
    for b in range(2):
        for v in range(4):
            expected = geometry.project_points_np(proj[b, v], pts[b, v])
            # float32 cancellation in x·P rows bounds achievable agreement;
            # structural bugs (transposes, axis swaps) would be O(1) off.
            np.testing.assert_allclose(got[b, v], expected, atol=1e-3)


def test_homogeneous_euclidean_roundtrip_and_zero_guard():
    pts = jnp.array([[2.0, 4.0, 2.0], [1.0, 1.0, 0.0]])
    eu = geometry.homogeneous_to_euclidean(pts)
    np.testing.assert_allclose(np.asarray(eu), [[1.0, 2.0], [1.0, 1.0]])
    ho = geometry.euclidean_to_homogeneous(jnp.array([[1.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(ho), [[1.0, 2.0, 1.0]])


def test_reprojection_error_halved_l2():
    proj = jnp.array(np.eye(3, 4, dtype=np.float32))[None]  # identity cam
    kp3d = jnp.array([[[1.0, 2.0, 1.0]]])  # projects to (1, 2)
    kp2d = jnp.array([[[[4.0, 6.0]]]])  # off by (3, 4) -> L2 5 -> half 2.5
    err = geometry.reprojection_error(kp3d, kp2d, proj[None])
    np.testing.assert_allclose(np.asarray(err), [[[2.5]]], rtol=1e-6)


def test_get_square_bbox():
    assert geometry.get_square_bbox((0, 0, 100, 40)) == (0, -30, 100, 70)
    assert geometry.get_square_bbox((0, 0, 40, 100)) == (-30, 0, 70, 100)
    assert geometry.get_square_bbox((5, 5, 15, 15)) == (5, 5, 15, 15)


def test_scale_bbox():
    assert geometry.scale_bbox((0, 0, 100, 100), 1.0) == (0, 0, 100, 100)
    left, upper, right, lower = geometry.scale_bbox((0, 0, 100, 100), 2.0)
    assert right - left == 200 and lower - upper == 200


def test_crop_image_zero_fill():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = geometry.crop_image(img, (-2, -1, 3, 2))
    assert out.shape == (3, 5)
    assert out[0].sum() == 0 and out[:, 0].sum() == 0
    np.testing.assert_array_equal(out[1:, 2:], img[:2, :3])


def test_normalize_denormalize_roundtrip():
    img = np.random.default_rng(2).integers(0, 255, size=(8, 8, 3)).astype(np.float64)
    back = geometry.denormalize_image(geometry.normalize_image(img))
    np.testing.assert_allclose(back, img, atol=1.0)


def test_distorted_projection_zero_distortion_matches_pinhole():
    R = np.eye(3)
    t = np.array([0.0, 0.0, 10.0])
    K = np.array([[100.0, 0, 50], [0, 100.0, 60], [0, 0, 1]])
    pts = np.random.default_rng(3).normal(size=(6, 3))
    cam = geometry.Camera(R, t, K, dist=np.zeros(5))
    got = cam.project(pts)
    expected = geometry.project_points_np(cam.projection, pts)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_distorted_projection_radial_only():
    # One point, pure radial distortion; hand-computed expectation.
    R = np.eye(3)
    t = np.zeros(3)
    K = np.array([[100.0, 0, 0], [0, 100.0, 0], [0, 0, 1]])
    kd = np.array([0.1, 0.0, 0.0, 0.0, 0.0])
    pt = np.array([[1.0, 2.0, 10.0]])
    xn, yn = 0.1, 0.2
    r = xn * xn + yn * yn
    radial = 1 + 0.1 * r
    got = geometry.project_points_distorted_np(pt, K, R, t, kd)
    np.testing.assert_allclose(got[0], [100 * xn * radial, 100 * yn * radial], rtol=1e-9)
