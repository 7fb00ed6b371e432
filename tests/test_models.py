"""Model shape contracts and init distributions.

Reference contracts: tests/test_pose_resnet.py:14-22 and
tests/test_hrnet.py:14-22 ([2, 3, 256, 256] -> [2, 19, 64, 64]); our layout
is NHWC: [2, 256, 256, 3] -> [2, 64, 64, 19].  Tests use 64x64 inputs where
possible to keep single-core CPU compile times sane; the stride-4 contract
is resolution-independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu.models import PoseResNet, PoseHighResolutionNet


def _init_and_apply(model, shape, train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return out, variables, mutated
    return model.apply(variables, x, train=False), variables, None


def test_pose_resnet18_shape_contract():
    model = PoseResNet(num_joints=19, num_layers=18)
    out, _, _ = _init_and_apply(model, (2, 64, 64, 3))
    assert out.shape == (2, 16, 16, 19)  # stride 4


def test_pose_resnet50_shape_contract():
    model = PoseResNet(num_joints=19, num_layers=50)
    out, _, _ = _init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 16, 16, 19)


def test_pose_resnet_train_mode_updates_batch_stats():
    model = PoseResNet(num_joints=4, num_layers=18)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


def test_pose_resnet_final_layer_init():
    model = PoseResNet(num_joints=19, num_layers=18)
    _, variables, _ = _init_and_apply(model, (1, 64, 64, 3))
    w = np.asarray(variables["params"]["final_layer"]["kernel"])
    assert abs(w.std() - 0.001) < 5e-4  # normal(0, 0.001)
    b = np.asarray(variables["params"]["final_layer"]["bias"])
    np.testing.assert_array_equal(b, 0.0)
    dw = np.asarray(variables["params"]["deconv0"]["kernel"])
    assert abs(dw.std() - 0.001) < 5e-4


def test_hrnet_shape_contract():
    model = PoseHighResolutionNet(num_joints=19)
    out, _, _ = _init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 16, 16, 19)


def test_hrnet_ih26m_joint_count():
    model = PoseHighResolutionNet(num_joints=42)
    out, _, _ = _init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 16, 16, 42)


def test_hrnet_conv_init_std():
    model = PoseHighResolutionNet(num_joints=4)
    _, variables, _ = _init_and_apply(model, (1, 64, 64, 3))
    w = np.asarray(variables["params"]["conv1"]["kernel"])
    assert abs(w.std() - 0.001) < 5e-4


def test_bfloat16_compute_keeps_f32_output():
    model = PoseResNet(num_joints=4, num_layers=18, dtype=jnp.bfloat16)
    out, variables, _ = _init_and_apply(model, (1, 64, 64, 3))
    assert out.dtype == jnp.float32
    # params stay f32
    kinds = {
        p.dtype for p in jax.tree_util.tree_leaves(variables["params"])
    }
    assert kinds == {jnp.dtype(jnp.float32)}
