"""Generate FULL-MODEL forward-parity goldens by RUNNING the reference
torch models (/root/reference/pose_estimators/pose_resnet.py:17-231 and
hrnet.py:293-533) on deterministic synthetic weights + inputs.

Outputs tests/fixtures/model_forward_goldens.npz, consumed by
tests/test_model_forward_parity.py.  The npz stores only the state_dict
names/shapes, the RNG seeds, and the torch forward outputs — the weight
VALUES are regenerated on both sides from tests/helpers.golden_fill_values,
so the fixture stays small while pinning the whole topology + converter
chain (a transposed stage ordering, wrong deconv tap rotation, or BN-eps
mismatch all shift the output and fail the comparison).

Requires the reference checkout + torch (this build environment has both);
the parity test itself needs neither.
"""

import copy
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "fixtures", "model_forward_goldens.npz")

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# --- stubs so the reference package imports without its full dep set ------

# colorlog: only used for logger cosmetics (reference utils/__init__.py).
colorlog_stub = types.ModuleType("colorlog")


class _Formatter:
    def __init__(self, *a, **k):
        pass

    def format(self, record):
        return str(record)


colorlog_stub.ColoredFormatter = _Formatter
colorlog_stub.basicConfig = lambda *a, **k: None
sys.modules.setdefault("colorlog", colorlog_stub)

# kornia: the models never call it, but reference utils imports pull it in.
kornia_stub = types.ModuleType("kornia")
kornia_stub.geometry = types.SimpleNamespace(
    spatial_soft_argmax2d=lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("kornia stub called")
    )
)
sys.modules.setdefault("kornia", kornia_stub)


# yacs (absent here): pose_estimators/config.py only needs attribute-style
# get/set and clone().
class _CfgNode(dict):
    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def clone(self):
        return copy.deepcopy(self)


yacs_stub = types.ModuleType("yacs")
yacs_config_stub = types.ModuleType("yacs.config")
yacs_config_stub.CfgNode = _CfgNode
yacs_stub.config = yacs_config_stub
sys.modules.setdefault("yacs", yacs_stub)
sys.modules.setdefault("yacs.config", yacs_config_stub)

sys.path.insert(0, REFERENCE)

import torch  # noqa: E402

from pose_estimators.hrnet import PoseHighResolutionNet  # noqa: E402
from pose_estimators import pose_resnet as _ref_pose_resnet  # noqa: E402
from pose_estimators.pose_resnet import PoseResNet  # noqa: E402

# Reference bug: BasicBlock (pose_resnet.py:156) is missing the
# `expansion = 1` class attribute, so the reference's OWN 18/34 variants
# crash in _make_layer (pose_resnet.py:71).  torchvision semantics (which
# the spec table at pose_resnet.py:19-25 copies) define expansion=1 for
# BasicBlock; patch it in so the intended-architecture golden can be made.
if not hasattr(_ref_pose_resnet.BasicBlock, "expansion"):
    _ref_pose_resnet.BasicBlock.expansion = 1

from helpers import golden_fill_values  # noqa: E402  (tests/helpers.py)

NUM_JOINTS = 19
# 128x128 keeps the 1-core CPU forwards fast while exercising every layer;
# all strides/paddings are input-size independent.
INPUT_HW = 128
BATCH = 2
WEIGHT_SEED = 20260817
INPUT_SEED = 411


def make_golden(model, tag, goldens):
    names, shapes = [], []
    for name, tensor in model.state_dict().items():
        if name.endswith("num_batches_tracked"):
            continue
        names.append(name)
        shapes.append(tuple(tensor.shape))
    values = golden_fill_values(names, shapes, WEIGHT_SEED)
    sd = {k: torch.from_numpy(v) for k, v in values.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    model.eval()

    rng = np.random.default_rng(INPUT_SEED)
    x = rng.normal(size=(BATCH, 3, INPUT_HW, INPUT_HW)).astype(np.float32)
    with torch.no_grad():
        y = model(torch.from_numpy(x)).numpy()
    goldens["%s_names" % tag] = np.frombuffer(
        json.dumps(names).encode(), dtype=np.uint8
    )
    goldens["%s_shapes" % tag] = np.frombuffer(
        json.dumps(shapes).encode(), dtype=np.uint8
    )
    goldens["%s_output" % tag] = y.astype(np.float32)
    print(
        "%s: %d tensors, output %s, |y| mean %.4f max %.4f"
        % (tag, len(names), y.shape, np.abs(y).mean(), np.abs(y).max())
    )


def main():
    torch.manual_seed(0)
    goldens = {
        "num_joints": np.array(NUM_JOINTS),
        "input_hw": np.array(INPUT_HW),
        "batch": np.array(BATCH),
        "weight_seed": np.array(WEIGHT_SEED),
        "input_seed": np.array(INPUT_SEED),
    }
    make_golden(
        PoseResNet(num_joints=NUM_JOINTS, num_layers=50), "pose_resnet50", goldens
    )
    # 18 covers the BasicBlock trunk (reference pose_resnet.py:19-25 spec
    # table) — a different residual topology than Bottleneck-50.
    make_golden(
        PoseResNet(num_joints=NUM_JOINTS, num_layers=18), "pose_resnet18", goldens
    )
    make_golden(PoseHighResolutionNet(num_joints=NUM_JOINTS), "hrnet_w32", goldens)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **goldens)
    print("wrote %s (%.1f KB)" % (OUT, os.path.getsize(OUT) / 1024.0))


if __name__ == "__main__":
    main()
