"""Heatmap render/decode ops (reference contracts:
dataset/dataset.py:198-207, utils/evaluation.py:13-30,
utils/triangulation.py:192-199)."""

import numpy as np
import jax.numpy as jnp

from multi_view_active_learning_tpu.ops import heatmap


def test_render_gaussian_matches_reference_formula():
    h, w, sigma = 16, 16, 1.5
    kp = np.array([[3.2, 7.8], [0.0, 0.0]], dtype=np.float32)  # [K, 2]
    got = np.asarray(heatmap.render_gaussian_heatmaps(jnp.array(kp), h, w, sigma))
    xs, ys = np.arange(w), np.arange(h)
    for k in range(2):
        dx2 = (xs[None, :] - kp[k, 0]) ** 2
        dy2 = (ys[:, None] - kp[k, 1]) ** 2
        expected = np.exp(-(dx2 + dy2) / (2 * sigma**2))
        # exp() ULP differences between XLA and numpy near zero
        np.testing.assert_allclose(got[k], expected, rtol=1e-4, atol=1e-6)


def test_decode_argmax_xy_convention():
    hm = np.zeros((2, 3, 8, 8), np.float32)
    hm[0, 0, 5, 2] = 1.0  # y=5, x=2
    hm[1, 2, 0, 7] = 1.0
    coords, peak = heatmap.decode_argmax(jnp.array(hm), stride=4.0)
    coords = np.asarray(coords)
    np.testing.assert_allclose(coords[0, 0], [8.0, 20.0])  # (x, y) * stride
    np.testing.assert_allclose(coords[1, 2], [28.0, 0.0])
    np.testing.assert_allclose(np.asarray(peak)[0, 0], 1.0)


def test_soft_argmax_expected_location():
    hm = np.full((1, 8, 8), -50.0, np.float32)
    hm[0, 4, 6] = 50.0  # dominant peak -> expectation collapses to it
    coords = np.asarray(heatmap.soft_argmax(jnp.array(hm), stride=1.0))
    np.testing.assert_allclose(coords[0], [6.0, 4.0], atol=1e-3)


def test_soft_argmax_symmetric_blur_is_unbiased():
    hm = np.zeros((1, 9, 9), np.float32)
    hm[0, 4, 4] = 2.0
    for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        hm[0, 4 + dy, 4 + dx] = 1.0
    coords = np.asarray(heatmap.soft_argmax(jnp.array(hm)))
    np.testing.assert_allclose(coords[0], [4.0, 4.0], atol=1e-5)


def test_decode_keypoints_zeroes_invalid():
    hm = np.random.default_rng(0).random((2, 4, 8, 8)).astype(np.float32)
    valid = np.array([[True, False, True, True], [True, True, True, False]])
    coords = np.asarray(
        heatmap.decode_keypoints(jnp.array(hm), 4.0, jnp.array(valid))
    )
    np.testing.assert_array_equal(coords[0, 1], 0.0)
    np.testing.assert_array_equal(coords[1, 3], 0.0)
    assert coords[0, 0].sum() != 0.0


def test_heatmap_mse_loss_normalization_and_mask():
    n, h, w, k = 4, 8, 8, 3
    pred = np.ones((n, h, w, k), np.float32)
    target = np.zeros((n, h, w, k), np.float32)
    # unmasked: sum of squares = n*h*w*k, normalized by n*h*w -> k
    loss = float(heatmap.heatmap_mse_loss(jnp.array(pred), jnp.array(target)))
    assert abs(loss - k) < 1e-6
    # mask out one joint everywhere -> (k-1)
    mask = np.ones((n, 1, 1, k), bool)
    mask[..., 0] = False
    loss = float(
        heatmap.heatmap_mse_loss(jnp.array(pred), jnp.array(target), jnp.array(mask))
    )
    assert abs(loss - (k - 1)) < 1e-6


def test_decode_keypoints_bbox():
    import jax.numpy as jnp

    hm = np.zeros((2, 3, 8, 8), np.float32)
    hm[0, 0, 4, 2] = 1.0  # y=4, x=2 on an 8x8 grid
    bbox = np.array([[10.0, 20.0, 90.0, 100.0], [0.0, 0.0, 16.0, 16.0]],
                    np.float32)
    coords = np.asarray(
        heatmap.decode_keypoints_bbox(jnp.array(hm), jnp.array(bbox))
    )
    # box 0 is 80x80 -> scale 10: x=20, y=40
    np.testing.assert_allclose(coords[0, 0], [20.0, 40.0])
    # box 1 is 16x16 -> scale 2
    hm2 = np.zeros((1, 1, 8, 8), np.float32)
    hm2[0, 0, 1, 3] = 1.0
    coords2 = np.asarray(
        heatmap.decode_keypoints_bbox(jnp.array(hm2), jnp.array(bbox[1:2]))
    )
    np.testing.assert_allclose(coords2[0, 0], [6.0, 2.0])


def test_integral_loss_zero_at_matching_peak():
    h = w = 16
    kp = np.array([[[5.0, 9.0], [12.0, 3.0]]], np.float32)  # [1, K=2, 2]
    gt = heatmap.render_gaussian_heatmaps(jnp.array(kp), h, w, 1.0)  # [1,K,h,w]
    gt_nhwc = jnp.moveaxis(gt, 1, -1)  # [1,h,w,K]
    # Prediction: sharp logits peaked exactly at the GT keypoints.
    pred = 50.0 * gt_nhwc
    loss = float(
        heatmap.integral_regression_loss(pred, gt_nhwc, beta=1.0)
    )
    assert loss < 2e-2


def test_integral_loss_monotonic_in_distance():
    h = w = 16
    gt_kp = jnp.array([[[8.0, 8.0]]], jnp.float32)
    gt = jnp.moveaxis(
        heatmap.render_gaussian_heatmaps(gt_kp, h, w, 1.0), 1, -1
    )
    losses = []
    for dx in (1.0, 3.0, 6.0):
        pred_kp = jnp.array([[[8.0 + dx, 8.0]]], jnp.float32)
        pred = 50.0 * jnp.moveaxis(
            heatmap.render_gaussian_heatmaps(pred_kp, h, w, 1.0), 1, -1
        )
        losses.append(float(heatmap.integral_regression_loss(pred, gt, beta=1.0)))
    assert losses[0] < losses[1] < losses[2]
    # Normalized units: dx=3 over a 16-wide map ~ 3/16.
    assert abs(losses[1] - 3.0 / 16.0) < 0.05


def test_integral_loss_masks_invalid_and_empty_gt():
    h = w = 16
    kp = np.array([[[5.0, 9.0], [200.0, 200.0]]], np.float32)  # joint 1 off-crop
    gt = jnp.moveaxis(
        heatmap.render_gaussian_heatmaps(jnp.array(kp), h, w, 1.0), 1, -1
    )
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(1, h, w, 2)).astype(np.float32))
    # Off-crop GT (empty heatmap) must not contribute even when marked valid.
    full = heatmap.integral_regression_loss(
        pred, gt, jnp.ones((1, 2), bool), beta=1.0
    )
    only0 = heatmap.integral_regression_loss(
        pred, gt, jnp.array([[True, False]]), beta=1.0
    )
    np.testing.assert_allclose(float(full), float(only0), rtol=1e-6)
    # Masking the remaining joint too -> zero loss.
    none = heatmap.integral_regression_loss(
        pred, gt, jnp.zeros((1, 2), bool), beta=1.0
    )
    assert float(none) == 0.0
