"""Native C++ host data path vs the PIL reference pipeline."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from multi_view_active_learning_tpu.data import native_loader
from multi_view_active_learning_tpu.ops import geometry

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native library not built"
)


def _jpeg_bytes(arr, quality=95):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _pil_pipeline(jpeg, bbox, out):
    image = np.asarray(Image.open(io.BytesIO(jpeg)))[..., ::-1]
    image = geometry.crop_image(image, bbox)
    image = Image.fromarray(image).resize((out, out), resample=Image.LANCZOS)
    return np.asarray(image, dtype=np.uint8)


def test_decode_jpeg_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
    jpeg = _jpeg_bytes(arr, quality=100)
    out = native_loader.decode_jpeg(jpeg)
    assert out.shape == (64, 96, 3)
    ref = np.asarray(Image.open(io.BytesIO(jpeg)))
    np.testing.assert_array_equal(out, ref)  # same libjpeg -> identical


def test_decode_crop_resize_matches_pil_closely():
    rng = np.random.default_rng(1)
    # Smooth image so Lanczos implementation differences stay sub-LSB-ish.
    base = rng.normal(size=(16, 16, 3))
    arr = np.clip(
        np.asarray(Image.fromarray(
            (base * 40 + 128).astype(np.uint8)
        ).resize((256, 256), Image.BICUBIC)),
        0, 255,
    ).astype(np.uint8)
    jpeg = _jpeg_bytes(arr, quality=100)
    bbox = (30, 40, 190, 200)
    got = native_loader.decode_crop_resize(jpeg, bbox, 64, 64)
    ref = _pil_pipeline(jpeg, bbox, 64)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.mean() < 1.0
    assert np.percentile(diff, 99) <= 2


def test_out_of_bounds_crop_zero_filled():
    rng = np.random.default_rng(2)
    arr = rng.integers(100, 255, size=(64, 64, 3)).astype(np.uint8)
    jpeg = _jpeg_bytes(arr)
    bbox = (-32, -32, 32, 32)  # top-left quadrant outside
    got = native_loader.decode_crop_resize(jpeg, bbox, 32, 32)
    # upper-left quarter of the output comes from zero fill
    assert got[:14, :14].max() <= 5
    assert got[20:, 20:].mean() > 50


def test_invalid_jpeg_returns_none():
    assert native_loader.decode_crop_resize(b"not a jpeg", (0, 0, 8, 8), 8, 8) is None


def test_fast_scale_mode_close_to_full():
    rng = np.random.default_rng(3)
    base = (rng.normal(size=(8, 8, 3)) * 30 + 128).astype(np.uint8)
    arr = np.asarray(Image.fromarray(base).resize((1024, 1024), Image.BICUBIC))
    jpeg = _jpeg_bytes(arr, quality=95)
    bbox = (0, 0, 1024, 1024)
    full = native_loader.decode_crop_resize(jpeg, bbox, 128, 128, fast_scale=False)
    fast = native_loader.decode_crop_resize(jpeg, bbox, 128, 128, fast_scale=True)
    diff = np.abs(full.astype(int) - fast.astype(int))
    assert diff.mean() < 3.0
