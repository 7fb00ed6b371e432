"""FULL-MODEL forward parity against the reference torch models.

tools/make_model_goldens.py ran the reference PoseResNet-50
(/root/reference/pose_estimators/pose_resnet.py:17-231) and HRNet-W32
(hrnet.py:293-533) in eval mode on deterministic synthetic weights + inputs
and stored the outputs.  Here the SAME weights are regenerated
(helpers.golden_fill_values), pushed through models/convert.py into the
Flax models, and the forwards must match — proving the topology + converter
chain end to end (stage ordering, deconv tap rotation, BN eps/stats
handling, fuse-layer wiring), not just name-mapping bijectivity.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import golden_fill_values
from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.models import build_model, convert

pytestmark = pytest.mark.heavy  # fresh 128x128 model compiles

GOLDENS = os.path.join(
    os.path.dirname(__file__), "fixtures", "model_forward_goldens.npz"
)


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def _json_field(goldens, key):
    return json.loads(bytes(goldens[key]).decode())


def _run_parity(goldens, tag, model_type, rtol, num_layers=50):
    names = _json_field(goldens, "%s_names" % tag)
    shapes = _json_field(goldens, "%s_shapes" % tag)
    values = golden_fill_values(names, shapes, int(goldens["weight_seed"]))
    params, batch_stats = convert.torch_state_dict_to_flax(values, model_type)

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = int(goldens["num_joints"])
    cfg.POSE_ESTIMATOR.TYPE = model_type
    cfg.POSE_ESTIMATOR.NUM_LAYERS = num_layers
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    hw, batch = int(goldens["input_hw"]), int(goldens["batch"])
    init = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32),
            train=False,
        )
    )()
    ref_params = jax.tree_util.tree_map(np.asarray, jax.device_get(init["params"]))
    ref_stats = jax.tree_util.tree_map(
        np.asarray, jax.device_get(init["batch_stats"])
    )
    n_params = convert._merge_into(ref_params, params)
    n_stats = convert._merge_into(ref_stats, batch_stats)
    # every converted tensor found a home, and every flax leaf was covered
    assert n_params == len(jax.tree_util.tree_leaves(params))
    assert n_stats == len(jax.tree_util.tree_leaves(batch_stats))
    assert n_params == len(jax.tree_util.tree_leaves(ref_params))
    assert n_stats == len(jax.tree_util.tree_leaves(ref_stats))
    assert n_params + n_stats == len(names)

    rng = np.random.default_rng(int(goldens["input_seed"]))
    x = rng.normal(size=(batch, 3, hw, hw)).astype(np.float32)
    y = jax.jit(
        lambda p, s, xi: model.apply(
            {"params": p, "batch_stats": s}, xi, train=False
        )
    )(ref_params, ref_stats, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    y = np.transpose(np.asarray(jax.device_get(y)), (0, 3, 1, 2))  # NHWC->NCHW

    ref = goldens["%s_output" % tag]
    assert y.shape == ref.shape
    scale = np.abs(ref).max()
    max_err = np.abs(y - ref).max()
    cos = float(
        np.dot(y.ravel(), ref.ravel())
        / (np.linalg.norm(y) * np.linalg.norm(ref))
    )
    assert max_err <= rtol * scale, (max_err, scale, cos)
    assert cos > 0.999999, cos


def test_pose_resnet50_forward_matches_reference(goldens):
    _run_parity(goldens, "pose_resnet50", "POSE_RESNET", rtol=1e-4)


def test_pose_resnet18_forward_matches_reference(goldens):
    """BasicBlock trunk (reference pose_resnet.py:19-25 spec table) — a
    different residual topology than the Bottleneck-50 case above."""
    _run_parity(goldens, "pose_resnet18", "POSE_RESNET", rtol=1e-4, num_layers=18)


def test_hrnet_w32_forward_matches_reference(goldens):
    _run_parity(goldens, "hrnet_w32", "HRNET", rtol=1e-4)
