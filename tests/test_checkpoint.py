"""Orbax checkpointing: roundtrip, params-only restore, overwrite
(reference contract: strategy.py:681-745)."""

import os

import numpy as np
import jax
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.engine import Engine
from multi_view_active_learning_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def engine_state():
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 3
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    engine = Engine(cfg)
    return engine, engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip(engine_state, tmp_path):
    engine, state = engine_state
    state = state.replace(step=state.step + 41)
    path = os.path.join(str(tmp_path), "CKPT-FINAL")
    ckpt.save_checkpoint(path, state, epoch=3)
    fresh = engine.init_state(jax.random.PRNGKey(1), (1, 32, 32, 3))
    restored = ckpt.restore_checkpoint(path, fresh)
    assert int(restored.step) == 41
    _tree_equal(restored.params, state.params)
    _tree_equal(restored.opt_state, state.opt_state)


def test_params_only_restore_keeps_opt_state(engine_state, tmp_path):
    engine, state = engine_state
    path = os.path.join(str(tmp_path), "CKPT")
    ckpt.save_checkpoint(path, state)
    fresh = engine.init_state(jax.random.PRNGKey(2), (1, 32, 32, 3))
    restored = ckpt.restore_params_only(path, fresh)
    _tree_equal(restored.params, state.params)
    assert int(restored.step) == int(fresh.step)  # untouched


def test_overwrite(engine_state, tmp_path):
    engine, state = engine_state
    path = os.path.join(str(tmp_path), "CKPT-FINAL")
    ckpt.save_checkpoint(path, state, epoch=1)
    state2 = state.replace(step=state.step + 7)
    ckpt.save_checkpoint(path, state2, epoch=2)
    restored = ckpt.restore_checkpoint(path, state)
    assert int(restored.step) == 7


def test_checkpoint_exists(tmp_path):
    assert not ckpt.checkpoint_exists(os.path.join(str(tmp_path), "nope"))
