"""On-device crop+resize (ops/image.py)."""

import numpy as np
import jax.numpy as jnp

from multi_view_active_learning_tpu.ops.image import crop_and_resize_bilinear


def test_identity_crop():
    rng = np.random.default_rng(0)
    img = rng.random((1, 16, 16, 3)).astype(np.float32)
    box = np.array([[0.0, 0.0, 16.0, 16.0]], np.float32)
    out = np.asarray(crop_and_resize_bilinear(jnp.array(img), jnp.array(box), 16, 16))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_upscale_constant_region():
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, 2:6, 2:6, 0] = 7.0
    box = np.array([[2.0, 2.0, 6.0, 6.0]], np.float32)
    out = np.asarray(crop_and_resize_bilinear(jnp.array(img), jnp.array(box), 8, 8))
    # interior samples all land inside the constant patch
    np.testing.assert_allclose(out[0, 2:6, 2:6, 0], 7.0, atol=1e-5)


def test_out_of_bounds_zero_filled():
    img = np.full((1, 8, 8, 1), 9.0, np.float32)
    box = np.array([[-8.0, -8.0, 8.0, 8.0]], np.float32)
    out = np.asarray(crop_and_resize_bilinear(jnp.array(img), jnp.array(box), 8, 8))
    assert out[0, :3, :3, 0].max() == 0.0  # fully outside -> zeros
    assert out[0, 5:, 5:, 0].min() > 8.0  # fully inside


def test_downscale_average_close_to_mean():
    rng = np.random.default_rng(1)
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    box = np.tile(np.array([[0.0, 0.0, 32.0, 32.0]], np.float32), (2, 1))
    out = np.asarray(crop_and_resize_bilinear(jnp.array(img), jnp.array(box), 8, 8))
    assert out.shape == (2, 8, 8, 3)
    # bilinear subsampling preserves the global mean approximately
    assert abs(out.mean() - img.mean()) < 0.05


def test_crop_resize_uint8_identity():
    from multi_view_active_learning_tpu.ops import image as image_ops

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(1, 2, 24, 24, 3), dtype=np.uint8)
    boxes = np.tile(np.array([0.0, 0.0, 24.0, 24.0], np.float32), (1, 2, 1))
    out = np.asarray(
        image_ops.crop_resize_uint8(jnp.asarray(frames), jnp.asarray(boxes), 24, 24)
    )
    np.testing.assert_array_equal(out, frames)
