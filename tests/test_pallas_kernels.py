"""Pallas kernels in interpreter mode vs the pure-XLA oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu.ops import coreset, heatmap
from multi_view_active_learning_tpu.ops.pallas import decode as pdecode
from multi_view_active_learning_tpu.ops.pallas import pairwise as ppairwise


def test_fused_decode_matches_xla():
    rng = np.random.default_rng(0)
    hm = rng.normal(size=(10, 16, 16)).astype(np.float32) * 3
    out = pdecode.fused_decode(
        jnp.asarray(hm.reshape(10, -1)), width=16, stride=4.0, interpret=True
    )
    ref_coords, ref_peak = heatmap.decode_argmax(jnp.asarray(hm), stride=4.0)
    np.testing.assert_allclose(np.asarray(out["coords"]), np.asarray(ref_coords))
    np.testing.assert_allclose(np.asarray(out["peak"]), np.asarray(ref_peak))
    ref_soft = heatmap.soft_argmax(jnp.asarray(hm), stride=4.0)
    np.testing.assert_allclose(
        np.asarray(out["soft_coords"]), np.asarray(ref_soft), rtol=1e-4, atol=1e-3
    )


def test_fused_decode_padding_rows():
    rng = np.random.default_rng(1)
    hm = rng.normal(size=(3, 8, 8)).astype(np.float32)  # 3 rows -> pad to 8
    out = pdecode.fused_decode(
        jnp.asarray(hm.reshape(3, -1)), width=8, stride=1.0, interpret=True
    )
    assert out["coords"].shape == (3, 2)


def test_decode_keypoints_pallas_matches_xla():
    rng = np.random.default_rng(2)
    hm = rng.normal(size=(2, 3, 4, 16, 16)).astype(np.float32)
    valid = rng.random((2, 3, 4)) > 0.3
    got = pdecode.decode_keypoints_pallas(
        jnp.asarray(hm), 4.0, jnp.asarray(valid), interpret=True
    )
    ref = heatmap.decode_keypoints(jnp.asarray(hm), 4.0, jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_min_distance_kernel_matches_xla():
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(300, 57)).astype(np.float32)
    mask = np.zeros(300, bool)
    mask[250:] = True
    got = np.asarray(
        ppairwise.min_distance_to_centers(
            jnp.asarray(feats), jnp.asarray(mask), interpret=True
        )
    )
    ref = np.asarray(coreset._min_dist_to_centers(jnp.asarray(feats), jnp.asarray(mask)))
    # zero distances (a labeled point to itself) sit on the f32 cancellation
    # floor of the ||x||^2+||c||^2-2xc expansion: sqrt(eps) ~ 4e-3
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-3)


def test_min_distance_kernel_multi_tile():
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(600, 16)).astype(np.float32)  # 3 row tiles
    mask = np.zeros(600, bool)
    mask[::7] = True
    got = np.asarray(
        ppairwise.min_distance_to_centers(
            jnp.asarray(feats), jnp.asarray(mask), interpret=True
        )
    )
    ref = np.asarray(
        coreset._min_dist_to_centers(jnp.asarray(feats), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
