"""torch <-> flax conversion: tensor-level numerical equivalence against
torch.nn.functional, and name-mapping bijectivity on the real Flax trees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from multi_view_active_learning_tpu.models import (
    PoseResNet,
    PoseHighResolutionNet,
    convert,
)


def test_conv_weight_transform_matches_torch():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)  # [O, I, kh, kw]
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1
    ).numpy()
    k = convert.conv_weight_to_flax(w)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(k),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-2
    )
    # inverse
    np.testing.assert_array_equal(convert.conv_weight_to_torch(k), w)


def test_deconv_weight_transform_matches_torch():
    import flax.linen as nn

    rng = np.random.default_rng(1)
    w = rng.normal(size=(6, 4, 4, 4)).astype(np.float32)  # [I, O, kh, kw]
    x = rng.normal(size=(1, 6, 5, 5)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()  # [1, 4, 10, 10]

    k = convert.deconv_weight_to_flax(w)
    model = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME", use_bias=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 5, 6)))
    variables = {"params": {"kernel": jnp.asarray(k)}}
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-2
    )
    np.testing.assert_array_equal(convert.deconv_weight_to_torch(k), w)


def _fake_torch_names_from_flax(tree, mapper_inverse):
    """Collect flax param paths."""
    paths = []

    def walk(node, path):
        for key, value in node.items():
            if isinstance(value, dict):
                walk(value, path + (key,))
            else:
                paths.append(path + (key,))

    walk(tree, ())
    return paths


@pytest.mark.heavy
def test_posresnet_name_mapping_covers_model():
    model = PoseResNet(num_joints=3, num_layers=18)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # Build a synthetic torch state_dict keyed by reference names whose
    # mapped paths must all exist in the flax tree.
    names = {
        "conv1.weight": (64, 3, 7, 7),
        "bn1.weight": (64,),
        "bn1.bias": (64,),
        "bn1.running_mean": (64,),
        "bn1.running_var": (64,),
        "layer1.0.conv1.weight": (64, 64, 3, 3),
        "layer2.0.downsample.0.weight": (128, 64, 1, 1),
        "layer2.0.downsample.1.weight": (128,),
        "deconv_layers.0.weight": (512, 256, 4, 4),
        "deconv_layers.1.weight": (256,),
        "deconv_layers.3.weight": (256, 256, 4, 4),
        "final_layer.weight": (3, 256, 1, 1),
        "final_layer.bias": (3,),
    }
    rng = np.random.default_rng(0)
    sd = {k: rng.normal(size=s).astype(np.float32) for k, s in names.items()}
    params, stats = convert.torch_state_dict_to_flax(sd, "POSE_RESNET")

    def exists(tree, path):
        node = tree
        for p in path:
            assert p in node, (path, list(node.keys()))
            node = node[p]
        return True

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, _ in flat_p:
        keys = tuple(k.key for k in path)
        exists(variables["params"], keys)
    flat_s = jax.tree_util.tree_flatten_with_path(stats)[0]
    for path, _ in flat_s:
        keys = tuple(k.key for k in path)
        exists(variables["batch_stats"], keys)


@pytest.mark.heavy
def test_hrnet_name_mapping_samples():
    model = PoseHighResolutionNet(num_joints=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    names = [
        ("conv1", ("conv1",)),
        ("layer1.2.conv3", ("layer1_2", "conv3")),
        ("layer1.0.downsample.0", ("layer1_0", "downsample_conv")),
        ("transition1.0.0", ("transition1_0_conv",)),
        ("transition1.1.0.0", ("transition1_1_conv0",)),
        ("stage2.0.branches.1.3.conv2", ("stage2_module0", "branch1_block3", "conv2")),
        ("stage3.2.fuse_layers.0.2.0", ("stage3_module2", "fuse0_2_conv")),
        ("stage4.0.fuse_layers.2.0.1.1", ("stage4_module0", "fuse2_0_bn1")),
        ("final_layer", ("final_layer",)),
    ]
    for torch_name, expected in names:
        assert convert._hrnet_torch_to_flax(torch_name) == expected

    # mapped paths exist in the real tree
    def exists(tree, path):
        node = tree
        for p in path:
            assert p in node, (path, list(node.keys())[:8])
            node = node[p]

    for torch_name, expected in names:
        exists(variables["params"], expected)


@pytest.mark.heavy
def test_load_pretrained_drops_final_layer(tmp_path):
    import os

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.engine import Engine

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 3
    cfg.DATA.INPUT_WIDTH = 64
    cfg.DATA.INPUT_HEIGHT = 64
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3))
    rng = np.random.default_rng(2)
    sd = {
        "conv1.weight": torch.from_numpy(
            rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
        ),
        "final_layer.weight": torch.from_numpy(
            rng.normal(size=(19, 256, 1, 1)).astype(np.float32)
        ),
        "final_layer.bias": torch.zeros(19),
    }
    path = os.path.join(str(tmp_path), "init.pth")
    torch.save(sd, path)
    old_final = np.asarray(state.params["final_layer"]["kernel"])
    new_state = convert.load_pretrained(cfg, path, state)
    # conv1 replaced, final layer untouched (shape 19 would not fit anyway)
    np.testing.assert_allclose(
        np.asarray(new_state.params["conv1"]["kernel"]),
        convert.conv_weight_to_flax(sd["conv1.weight"].numpy()),
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.params["final_layer"]["kernel"]), old_final
    )


def test_flax_to_torch_roundtrip_posresnet():
    """Export flax params to a torch state_dict and re-import: identical."""
    model = PoseResNet(num_joints=5, num_layers=18)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = convert.flax_to_torch_state_dict(params, stats, "POSE_RESNET")
    assert "conv1.weight" in sd and "final_layer.bias" in sd
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["deconv_layers.0.weight"].shape[2:] == (4, 4)
    back_params, back_stats = convert.torch_state_dict_to_flax(sd, "POSE_RESNET")

    def assert_tree_equal(a, b, path=""):
        assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
        for k in a:
            if isinstance(a[k], dict):
                assert_tree_equal(a[k], b[k], path + "/" + k)
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=path + "/" + k)

    assert_tree_equal(params, back_params)
    assert_tree_equal(stats, back_stats)


def test_flax_to_torch_roundtrip_hrnet():
    model = PoseHighResolutionNet(num_joints=3)
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = convert.flax_to_torch_state_dict(params, stats, "HRNET")
    assert "stage4.0.fuse_layers.0.3.weight" not in sd  # fuse convs end in .0
    assert "stage2.0.branches.1.3.conv2.weight" in sd
    assert "transition1.1.0.0.weight" in sd
    back_params, back_stats = convert.torch_state_dict_to_flax(sd, "HRNET")

    def assert_tree_equal(a, b, path=""):
        assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
        for k in a:
            if isinstance(a[k], dict):
                assert_tree_equal(a[k], b[k], path + "/" + k)
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=path + "/" + k)

    assert_tree_equal(params, back_params)
    assert_tree_equal(stats, back_stats)
