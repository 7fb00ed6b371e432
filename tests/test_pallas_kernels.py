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


def test_fused_deconv_bn_relu_matches_flax():
    import flax.linen as nn
    from multi_view_active_learning_tpu.ops.pallas.deconv import (
        fold_bn,
        fused_deconv_bn_relu,
    )

    rng = np.random.default_rng(3)
    # Cin=640 exercises the Cin-chunk accumulation (chunk=256 -> 3 chunks,
    # incl. zero padding of the tail chunk); N=3 exercises sample padding
    # to the per-program group size.
    for (N, H, W, Cin, Cout) in [(3, 4, 4, 640, 64), (2, 8, 8, 96, 64)]:
        x = rng.normal(size=(N, H, W, Cin)).astype(np.float32)
        k = rng.normal(scale=0.05, size=(4, 4, Cin, Cout)).astype(np.float32)
        gamma = rng.uniform(0.5, 1.5, Cout).astype(np.float32)
        beta = rng.normal(size=Cout).astype(np.float32)
        mean = rng.normal(size=Cout).astype(np.float32)
        var = rng.uniform(0.1, 2.0, Cout).astype(np.float32)

        mod = nn.ConvTranspose(
            Cout, (4, 4), strides=(2, 2), padding="SAME", use_bias=False
        )
        ref = mod.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))
        ref = (np.asarray(ref) - mean) / np.sqrt(var + 1e-5) * gamma + beta
        ref = np.maximum(ref, 0)

        scale, bias = fold_bn(
            jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mean),
            jnp.asarray(var),
        )
        got = np.asarray(
            fused_deconv_bn_relu(
                jnp.asarray(x), jnp.asarray(k), scale, bias, interpret=True
            )
        )
        assert got.shape == (N, 2 * H, 2 * W, Cout)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_deconv_bn_relu_int8_matches_explicit_quantization():
    """The int8 phase-deconv kernel == an XLA conv_transpose over the SAME
    int8-rounded operands (the s32 accumulation is exact, so the two must
    agree to f32-epilogue precision), and stays close to the float result."""
    import flax.linen as nn
    from multi_view_active_learning_tpu.ops.pallas.deconv import (
        fold_bn,
        fused_deconv_bn_relu_int8,
    )

    rng = np.random.default_rng(9)
    for (N, H, W, Cin, Cout) in [(3, 4, 4, 640, 64), (2, 8, 8, 96, 64)]:
        x = rng.normal(size=(N, H, W, Cin)).astype(np.float32)
        k = rng.normal(scale=0.05, size=(4, 4, Cin, Cout)).astype(np.float32)
        gamma = rng.uniform(0.5, 1.5, Cout).astype(np.float32)
        beta = rng.normal(size=Cout).astype(np.float32)
        mean = rng.normal(size=Cout).astype(np.float32)
        var = rng.uniform(0.1, 2.0, Cout).astype(np.float32)
        scale, bias = fold_bn(
            jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mean),
            jnp.asarray(var),
        )
        sx = np.float32(np.abs(x).max() / 127.0)

        got = np.asarray(
            fused_deconv_bn_relu_int8(
                jnp.asarray(x), jnp.asarray(k), scale, bias,
                jnp.asarray(sx), interpret=True,
            )
        )
        assert got.shape == (N, 2 * H, 2 * W, Cout)

        # Explicitly quantized XLA reference: same rounding of x and k.
        xq = np.clip(np.round(x / sx), -127, 127).astype(np.float32)
        ws = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-8) / 127.0
        kq = np.clip(np.round(k / ws), -127, 127).astype(np.float32)
        mod = nn.ConvTranspose(
            Cout, (4, 4), strides=(2, 2), padding="SAME", use_bias=False
        )
        yq = np.asarray(
            mod.apply({"params": {"kernel": jnp.asarray(kq)}}, jnp.asarray(xq))
        )
        ref = np.maximum(
            yq * (sx * ws * np.asarray(scale)) + np.asarray(bias), 0.0
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

        # And the quantization error vs the true float op stays small.
        yf = np.asarray(
            mod.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))
        )
        full = np.maximum(yf * np.asarray(scale) + np.asarray(bias), 0.0)
        denom = np.abs(full).max()
        assert np.abs(got - full).max() / denom < 0.05


def test_quantized_forward_int8_head_close_to_bf16_head():
    """quantized_pose_resnet_forward(int8_head=True) through the Pallas
    kernel (interpret) tracks the default bf16-head quantized forward."""
    import jax
    from multi_view_active_learning_tpu.models.pose_resnet import PoseResNet
    from multi_view_active_learning_tpu.models import quantize
    from unittest import mock
    from multi_view_active_learning_tpu.ops.pallas import deconv as pdeconv

    model = PoseResNet(num_joints=5, num_layers=18, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(
        quantize.quantized_pose_resnet_forward(
            variables["params"], variables["batch_stats"], x, 18
        )
    )
    real = pdeconv.fused_deconv_bn_relu_int8

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return real(*args, **kwargs)

    with mock.patch.object(pdeconv, "fused_deconv_bn_relu_int8", interp):
        got = np.asarray(
            quantize.quantized_pose_resnet_forward(
                variables["params"], variables["batch_stats"], x, 18,
                int8_head=True,
            )
        )
    assert got.shape == ref.shape
    a, b = ref.ravel(), got.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    # Untrained-net worst case: three extra int8 rounding stages over the
    # already-int8 backbone; 0.99 is the same bar the backbone met in the
    # round-2 int8 acceptance (BENCH_NOTES).
    assert cos > 0.99, cos


def test_pallas_head_matches_standard_pose_resnet_head():
    """Full-model check: trunk + apply_pose_resnet_head == the standard
    flax forward (the TPU.PALLAS_HEAD inference path, engine.forward)."""
    import jax
    from multi_view_active_learning_tpu.models.pose_resnet import PoseResNet
    from multi_view_active_learning_tpu.ops.pallas.deconv import (
        apply_pose_resnet_head,
    )

    model = PoseResNet(num_joints=5, num_layers=18, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    trunk = model.apply(variables, x, train=False, skip_head=True)
    got = apply_pose_resnet_head(
        trunk, variables["params"], variables["batch_stats"], interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_decode_keypoints_pallas_with_peak():
    """with_peak returns the kernel's own peak values (the confidence used
    by AL.CONFIDENCE_WEIGHTED_DLT without a second decode pass)."""
    rng = np.random.default_rng(5)
    hm = rng.normal(size=(2, 3, 4, 16, 16)).astype(np.float32)
    valid = np.ones((2, 3, 4), bool)
    coords, peak = pdecode.decode_keypoints_pallas(
        jnp.asarray(hm), 4.0, jnp.asarray(valid), interpret=True, with_peak=True
    )
    ref_coords = heatmap.decode_keypoints(jnp.asarray(hm), 4.0, jnp.asarray(valid))
    _, ref_peak = heatmap.decode_argmax(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(coords), np.asarray(ref_coords))
    np.testing.assert_allclose(np.asarray(peak), np.asarray(ref_peak), rtol=1e-6)
