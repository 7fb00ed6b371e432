"""Reverse interop: orbax checkpoint -> reference-format .pth.

Proves tools/export_checkpoint.py output (a) round-trips through our own
torch->flax converter to the exact trees we exported, and (b) strict-loads
into the REFERENCE torch model (pose_estimators/pose_resnet.py) and
produces the same forward as the flax model that was checkpointed — i.e. a
model trained here can be evaluated in the reference stack
(reference strategy.py:697-721 save/strict-load contract).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.engine import Engine
from multi_view_active_learning_tpu.models.convert import (
    torch_state_dict_to_flax,
)
from multi_view_active_learning_tpu.utils import checkpoint as ckpt_utils

pytestmark = pytest.mark.heavy  # fresh model compiles + a subprocess torch run

REFERENCE = "/root/reference"

_REF_FORWARD = textwrap.dedent(
    """
    import json, sys, types, copy
    import numpy as np

    # Stub the reference's cosmetic/unused imports (colorlog, kornia, yacs)
    # exactly as tools/make_model_goldens.py does.
    colorlog = types.ModuleType("colorlog")
    colorlog.ColoredFormatter = type("F", (), {"__init__": lambda s,*a,**k: None,
                                               "format": lambda s,r: str(r)})
    colorlog.basicConfig = lambda *a, **k: None
    sys.modules.setdefault("colorlog", colorlog)
    kornia = types.ModuleType("kornia")
    kornia.geometry = types.SimpleNamespace(spatial_soft_argmax2d=None)
    sys.modules.setdefault("kornia", kornia)
    class _Cfg(dict):
        def __getattr__(self, k):
            try: return self[k]
            except KeyError as e: raise AttributeError(k) from e
        def __setattr__(self, k, v): self[k] = v
        def clone(self): return copy.deepcopy(self)
    yacs = types.ModuleType("yacs"); yc = types.ModuleType("yacs.config")
    yc.CfgNode = _Cfg; yacs.config = yc
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yc)

    sys.path.insert(0, %(reference)r)
    import torch

    if %(model)r == "POSE_RESNET":
        from pose_estimators import pose_resnet as ref_pr
        if not hasattr(ref_pr.BasicBlock, "expansion"):
            ref_pr.BasicBlock.expansion = 1  # reference bug; torchvision value
        model = ref_pr.PoseResNet(num_joints=%(joints)d, num_layers=18)
    else:
        from pose_estimators.hrnet import PoseHighResolutionNet
        model = PoseHighResolutionNet(num_joints=%(joints)d)

    ckpt = torch.load(%(pth)r, map_location="cpu")
    sd = {k.replace("module.", "", 1): v
          for k, v in ckpt["state_dict"].items()}
    model.load_state_dict(sd, strict=True)  # every key must be present
    model.eval()
    x = np.load(%(x)r)["x"]  # [B, 3, H, W]
    with torch.no_grad():
        y = model(torch.from_numpy(x)).numpy()
    np.savez(%(y)r, y=y, global_step=ckpt["global_step"])
    """
)


def _tree_allclose(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_allclose(a[k], b[k], path + "/" + str(k))
        return
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        rtol=0, atol=1e-6, err_msg=path,
    )


@pytest.mark.parametrize("model_type", ["POSE_RESNET", "HRNET"])
def test_export_roundtrip_and_reference_forward(tmp_path, model_type):
    from tools.export_checkpoint import export_checkpoint

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 64
    cfg.DATA.INPUT_HEIGHT = 64
    cfg.POSE_ESTIMATOR.TYPE = model_type
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"

    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(3), input_shape=(1, 64, 64, 3))
    # Non-trivial batch_stats + step so the export carries real content.
    state = state.replace(step=np.int32(17))
    ckpt_dir = os.path.join(str(tmp_path), "orbax", "CKPT-FINAL")
    ckpt_utils.save_checkpoint(ckpt_dir, state)

    pth = os.path.join(str(tmp_path), "CKPT-FINAL.pth")
    payload = export_checkpoint(cfg, ckpt_dir, pth, bare=False)
    assert payload["global_step"] == 17
    assert set(payload) == {"epoch", "global_step", "state_dict", "optimizer"}
    sd = payload["state_dict"]
    assert all(k.startswith("module.") for k in sd)
    nbt = [k for k in sd if k.endswith("num_batches_tracked")]
    assert nbt and all(int(sd[k]) == 17 for k in nbt)

    # (a) round-trip through our own converter reproduces the saved trees.
    stripped = {
        k.replace("module.", "", 1): v.numpy() for k, v in sd.items()
    }
    params, stats = torch_state_dict_to_flax(stripped, model_type)
    _tree_allclose(params, jax.device_get(state.params))
    _tree_allclose(stats, jax.device_get(state.batch_stats))

    # (b) the reference model strict-loads the file and its forward matches
    # the flax forward of the exported state.
    if not os.path.isdir(os.path.join(REFERENCE, "pose_estimators")):
        pytest.skip("reference checkout unavailable")
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    x_npz = os.path.join(str(tmp_path), "x.npz")
    y_npz = os.path.join(str(tmp_path), "y.npz")
    np.savez(x_npz, x=x_nchw)
    script = _REF_FORWARD % {
        "reference": REFERENCE, "pth": pth, "joints": 4,
        "x": x_npz, "y": y_npz, "model": model_type,
    }
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # pure torch subprocess
    subprocess.run(
        [sys.executable, "-c", script], check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    ref = np.load(y_npz)
    assert int(ref["global_step"]) == 17
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))[:, None]  # [B, V=1, H, W, 3]
    flax_y = engine.forward(
        state.params, state.batch_stats, jax.numpy.asarray(x_nhwc),
        use_int8=False,  # float-exact comparison against the torch forward
    )
    flax_y = np.transpose(np.asarray(flax_y, np.float32)[:, 0], (0, 3, 1, 2))
    np.testing.assert_allclose(flax_y, ref["y"], atol=2e-4, rtol=0)
