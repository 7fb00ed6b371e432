"""Device-side RandAugment ops (reference: dataset/augmentation.py:15-116;
rotate-heatmap bug fixed here per SURVEY.md quirks list)."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_view_active_learning_tpu.data import augmentation as aug


def test_invert():
    img = jnp.full((4, 4, 3), 100.0)
    np.testing.assert_allclose(np.asarray(aug._invert(img)), 155.0)


def test_solarize_threshold():
    img = jnp.array([[[100.0, 200.0, 128.0]]])
    out = np.asarray(aug._solarize(img, jnp.float32(128.0)))
    np.testing.assert_allclose(out, [[[100.0, 55.0, 127.0]]])


def test_posterize_masks_bits():
    img = jnp.array([[[255.0, 129.0, 64.0]]])
    out = np.asarray(aug._posterize(img, jnp.float32(1.0)))
    np.testing.assert_allclose(out, [[[128.0, 128.0, 0.0]]])


def test_autocontrast_stretches_range():
    rng = np.random.default_rng(0)
    img = jnp.array(rng.uniform(50, 200, (8, 8, 3)).astype(np.float32))
    out = np.asarray(aug._autocontrast(img))
    assert out.min() < 1.0 and out.max() > 254.0


def test_equalize_matches_pil():
    from PIL import Image, ImageOps

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    expected = np.asarray(ImageOps.equalize(Image.fromarray(arr))).astype(np.float32)
    got = np.asarray(aug._equalize(jnp.array(arr, jnp.float32)))
    np.testing.assert_allclose(got, expected)


def test_brightness_zero_blackens():
    img = jnp.full((4, 4, 3), 200.0)
    out = np.asarray(aug._brightness(img, jnp.float32(0.0)))
    np.testing.assert_allclose(out, 0.0)
    out = np.asarray(aug._brightness(img, jnp.float32(1.0)))
    np.testing.assert_allclose(out, 200.0)


def test_rotation_rotates_image_and_heatmap_together():
    img = np.zeros((16, 16, 3), np.float32)
    img[4, 8] = 255.0
    heat = np.zeros((16, 16, 1), np.float32)
    heat[4, 8] = 1.0
    ri = np.asarray(aug._rotate_bilinear(jnp.array(img), jnp.float32(90.0)))
    rh = np.asarray(aug._rotate_bilinear(jnp.array(heat), jnp.float32(90.0)))
    iy, ix = np.unravel_index(ri[..., 0].argmax(), (16, 16))
    hy, hx = np.unravel_index(rh[..., 0].argmax(), (16, 16))
    assert (iy, ix) == (hy, hx)  # image and heatmap move together
    assert (iy, ix) != (4, 8)  # and actually moved


def test_rand_augment_identity_when_disabled():
    rng = np.random.default_rng(2)
    img = jnp.array(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    heat = jnp.array(rng.random((2, 2, 2, 4)).astype(np.float32))
    oi, oh = aug.rand_augment(
        jax.random.PRNGKey(0), img, heat, num_aug=0, magnitude=9
    )
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(img))


def test_rand_augment_changes_images_deterministically():
    rng = np.random.default_rng(3)
    img = jnp.array(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    heat = jnp.array(rng.random((2, 2, 2, 4)).astype(np.float32))
    o1, _ = aug.rand_augment(
        jax.random.PRNGKey(7), img, heat, num_aug=2, magnitude=20,
        use_rotation=False,
    )
    o2, _ = aug.rand_augment(
        jax.random.PRNGKey(7), img, heat, num_aug=2, magnitude=20,
        use_rotation=False,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(img))
