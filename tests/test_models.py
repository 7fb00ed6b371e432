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


def test_hrnet_w48_width_plumbing():
    """HRNet widths are config-driven (reference hrnet.py:293-533 builds
    stages from cfg): a W48 variant ([48, 96, 192, 384] branch channels)
    must plumb through the transitions and exchange units.  Module counts
    are cut to 1 — repetition adds compile time, not coverage; the width
    plumbing (transition convs, fuse-layer channel matching) is what W48
    support means."""
    model = PoseHighResolutionNet(
        num_joints=19,
        stage2=(1, 2, "BASIC", (4, 4), (48, 96)),
        stage3=(1, 3, "BASIC", (4, 4, 4), (48, 96, 192)),
        stage4=(1, 4, "BASIC", (4, 4, 4, 4), (48, 96, 192, 384)),
    )
    out, variables, _ = _init_and_apply(model, (1, 64, 64, 3))
    assert out.shape == (1, 16, 16, 19)
    # the highest-res branch (and hence the final conv input) is 48-wide
    w = np.asarray(variables["params"]["final_layer"]["kernel"])
    assert w.shape[2] == 48


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


def test_space_to_depth_input_is_exact():
    """PoseResNet on a space-to-depth'd input must reproduce the plain-input
    model exactly (same params — the stem computes the identical conv in
    either layout)."""
    import jax
    import numpy as np

    from multi_view_active_learning_tpu.models.pose_resnet import space_to_depth

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    model = PoseResNet(num_joints=7, num_layers=18)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y_plain = model.apply(variables, x, train=False)
    y_s2d = model.apply(variables, space_to_depth(x), train=False)
    np.testing.assert_allclose(
        np.asarray(y_plain), np.asarray(y_s2d), rtol=1e-4, atol=1e-4
    )


def test_fast_deconv_is_exact():
    """PhaseDeconv is a mathematical reformulation of ConvTranspose: with
    IDENTICAL params both models must agree to f32 tolerance."""
    import jax
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    slow = PoseResNet(num_joints=7, num_layers=18)
    fast = PoseResNet(num_joints=7, num_layers=18, fast_deconv=True)
    variables = slow.init(jax.random.PRNGKey(0), x, train=False)
    fast_vars = fast.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(fast_vars)
    y_slow = slow.apply(variables, x, train=False)
    y_fast = fast.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_slow), np.asarray(y_fast), rtol=1e-4, atol=1e-4
    )


def test_engine_forward_s2d_path_matches_plain():
    """engine.forward's uint8 space-to-depth fast path must produce the
    same heatmaps as the plain path (flag off)."""
    import jax
    import numpy as np

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.engine import Engine

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.INT8_SCORING = False  # this test pins the FLOAT s2d fast path
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(1, 2, 64, 64, 3)), jnp.uint8)

    cfg.TPU.SPACE_TO_DEPTH_STEM = True
    eng = Engine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    y_fast = eng.forward(state.params, state.batch_stats, images)

    cfg2 = cfg.clone()
    cfg2.TPU.SPACE_TO_DEPTH_STEM = False
    eng2 = Engine(cfg2)
    y_plain = eng2.forward(state.params, state.batch_stats, images)
    np.testing.assert_allclose(
        np.asarray(y_fast), np.asarray(y_plain), rtol=1e-4, atol=1e-4
    )
