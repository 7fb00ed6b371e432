"""Serving artifacts: jax.export round-trip of the frozen inference fn.

The fast test covers the export/serialize/deserialize plumbing without
executing (lowering only — no XLA compile); the heavy tests execute the
deserialized artifact and pin it to the live engine's outputs, including
a symbolic-batch artifact called at two different batch sizes and an
int8-baked artifact.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from multi_view_active_learning_tpu import serving
from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.engine import Engine


def _small_engine(model_type="POSE_RESNET"):
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.POSE_ESTIMATOR.TYPE = model_type
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(11), input_shape=(1, 32, 32, 3))
    return engine, state


def _random_request(batch, views, img=32, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, size=(batch, views, img, img, 3)).astype(
        np.uint8
    )
    box = np.tile(np.asarray([0, 0, 256, 256], np.float32), (batch, views, 1))
    return images, box


def test_export_serialize_roundtrip(tmp_path):
    engine, state = _small_engine()
    exported = serving.export_serving(
        engine, state.params, state.batch_stats, batch_size=2, num_views=3
    )
    assert set(exported.platforms) == {"cpu", "tpu"}
    assert [tuple(a.shape) for a in exported.in_avals] == [
        (2, 3, 32, 32, 3),
        (2, 3, 4),
    ]
    path = os.path.join(str(tmp_path), "model" + serving.SERVING_SUFFIX)
    serving.save_serving(exported, path)
    assert os.path.getsize(path) > 1e6  # weights are baked in

    call = serving.load_serving(path)
    re_in = call.exported.in_avals
    assert [tuple(a.shape) for a in re_in] == [(2, 3, 32, 32, 3), (2, 3, 4)]


@pytest.mark.heavy
@pytest.mark.parametrize("model_type", ["POSE_RESNET", "HRNET"])
def test_artifact_matches_engine(tmp_path, model_type):
    engine, state = _small_engine(model_type)
    path = os.path.join(str(tmp_path), "model" + serving.SERVING_SUFFIX)
    serving.save_serving(
        serving.export_serving(
            engine, state.params, state.batch_stats, batch_size=2, num_views=3
        ),
        path,
    )
    call = serving.load_serving(path)
    images, box = _random_request(2, 3)
    out = call(images, box)

    serve = serving.build_serve_fn(engine, state.params, state.batch_stats)
    direct = jax.jit(serve)(images, box)
    for key in ("heatmaps", "keypoints", "confidence"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(direct[key]), atol=1e-5,
            err_msg=key,
        )
    assert np.asarray(out["keypoints"]).shape == (2, 3, 4, 2)


@pytest.mark.heavy
def test_symbolic_batch_artifact(tmp_path):
    engine, state = _small_engine()
    exported = serving.export_serving(
        engine, state.params, state.batch_stats, batch_size=None, num_views=2
    )
    assert str(exported.in_avals[0].shape[0]) == "b"
    path = os.path.join(str(tmp_path), "model_b" + serving.SERVING_SUFFIX)
    serving.save_serving(exported, path)
    call = serving.load_serving(path)
    for batch in (1, 3):  # one artifact, two request sizes
        images, box = _random_request(batch, 2, seed=batch)
        out = call(images, box)
        assert np.asarray(out["heatmaps"]).shape[0] == batch
        assert np.isfinite(np.asarray(out["confidence"])).all()


@pytest.mark.heavy
def test_int8_baked_artifact(tmp_path):
    engine, state = _small_engine()
    images, box = _random_request(1, 2, seed=5)
    scales = engine.int8_calibrate(state.params, state.batch_stats, images)
    if scales is None:
        pytest.skip("int8 path unsupported for this engine config")
    path = os.path.join(str(tmp_path), "model_i8" + serving.SERVING_SUFFIX)
    serving.save_serving(
        serving.export_serving(
            engine, state.params, state.batch_stats, batch_size=1,
            num_views=2, int8_scales=scales,
        ),
        path,
    )
    out = serving.load_serving(path)(images, box)
    serve = serving.build_serve_fn(
        engine, state.params, state.batch_stats, int8_scales=scales
    )
    direct = jax.jit(serve)(images, box)
    np.testing.assert_allclose(
        np.asarray(out["heatmaps"]), np.asarray(direct["heatmaps"]), atol=1e-4
    )
