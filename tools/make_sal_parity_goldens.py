"""END-TO-END sal_dict parity goldens: run the REFERENCE's flagship
scoring loop (/root/reference/strategy.py:1004-1215 `_compute_sal_dict` —
CMUPanopticDataset -> DataLoader -> torch PoseResNet-50 / HRNet-W32 ->
per-sample scoring -> all_gather) on the synthetic Panoptic tree with
deterministic golden weights, for EVERY metric strategy and decode mode
the reference ships:

  * TRIANGULATION (hard argmax + RANSAC-DLT reprojection error),
  * TRIANGULATION with AL.USE_SOFTARGMAX (kornia spatial_soft_argmax2d),
  * TRIANGULATION with AL.USE_REPROJECTION_XE (Gaussian re-render MSE),
  * MPE / HP / BSB, each with AVG and STD aggregation
    (reference strategy.py:1149-1215).

skimage and kornia are not installable here (zero-egress image); the
reference runs against the line-faithful oracle ports in
tests/oracle_ports.py (skimage 0.19.3 `peak_local_max` — the last
generation with the `indices=True` kwarg the reference passes — and
kornia 0.6 `spatial_soft_argmax2d`), injected as modules so the
reference's own scoring code paths execute end to end.

tests/test_sal_parity.py then runs THIS repo's `_compute_sal_dict`
(one jitted score_step per batch) on the same tree with the same weights
(converted via models/convert.py) and compares guid by guid per variant —
proving the whole flagship loop end to end: JSON indexing, guid format,
image pipeline, model forward, heatmap decode, RANSAC inlier selection,
DLT, every AL metric, and the per-frame MKPE.

Requires torch + the reference checkout (this environment has both); the
test needs neither.  Single process, gloo world-1 process group (the
reference's all_gather degenerates to identity), .cuda() stubbed to CPU.

Model inference is cached per (model, batch): the reference recomputes
heatmaps per variant, but its forward is deterministic in eval mode, so
one forward per batch serves all nine variants.
"""

import copy
import hashlib
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "fixtures", "sal_dict_goldens.json")
TREE = "/tmp/mval_sal_parity_tree"

NUM_JOINTS = 19
NUM_CAMS = 4
NUM_FRAMES = 8
WEIGHT_SEED = 20260817  # same as tools/make_model_goldens.py

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# ---- stubs (colorlog / kornia / yacs as in make_model_goldens.py, plus
# iopath and skimage for strategy.py's module-level imports) --------------

colorlog_stub = types.ModuleType("colorlog")


class _Formatter:
    def __init__(self, *a, **k):
        pass

    def format(self, record):
        return str(record)


colorlog_stub.ColoredFormatter = _Formatter
colorlog_stub.basicConfig = lambda *a, **k: None
sys.modules.setdefault("colorlog", colorlog_stub)

from oracle_ports import peak_local_max as oracle_peak_local_max  # noqa: E402
from oracle_ports import (  # noqa: E402
    spatial_soft_argmax2d as oracle_spatial_soft_argmax2d,
)

kornia_stub = types.ModuleType("kornia")
kornia_stub.spatial_soft_argmax2d = oracle_spatial_soft_argmax2d
kornia_stub.geometry = types.SimpleNamespace(
    spatial_soft_argmax2d=oracle_spatial_soft_argmax2d
)
sys.modules.setdefault("kornia", kornia_stub)


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


class _PathManager:
    def open(self, path, mode="r", **kwargs):
        return open(path, mode)


iopath_stub = types.ModuleType("iopath")
iopath_common = types.ModuleType("iopath.common")
iopath_file_io = types.ModuleType("iopath.common.file_io")
iopath_file_io.PathManager = _PathManager
iopath_common.file_io = iopath_file_io
iopath_stub.common = iopath_common
sys.modules.setdefault("iopath", iopath_stub)
sys.modules.setdefault("iopath.common", iopath_common)
sys.modules.setdefault("iopath.common.file_io", iopath_file_io)

# skimage: strategy.py does `from skimage.feature import peak_local_max`
# at module level; MPE and BSB call it per (view, joint).
skimage_stub = types.ModuleType("skimage")
skimage_feature = types.ModuleType("skimage.feature")
skimage_feature.peak_local_max = oracle_peak_local_max
skimage_stub.feature = skimage_feature
sys.modules.setdefault("skimage", skimage_stub)
sys.modules.setdefault("skimage.feature", skimage_feature)

sys.path.insert(0, REFERENCE)

import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self  # CPU run
torch.manual_seed(0)

# The reference's `from torch.utils.tensorboard import summary_writer`
# (strategy.py:17) targets an older torch; current torch only exports
# SummaryWriter.  The TRIANGULATION scoring path never logs, so a
# callable stub suffices.
import torch.utils.tensorboard as _tb  # noqa: E402

if not hasattr(_tb, "summary_writer"):
    _tb.summary_writer = _tb.SummaryWriter


def tree_checksum(tree: str) -> str:
    """Checksum of one JPEG so the test can detect an encoder drift (a
    different PIL would re-render different bytes) and skip, not fail."""
    first = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tree)
        for f in fs
        if f.endswith(".jpg")
    )[0]
    return hashlib.sha256(open(first, "rb").read()).hexdigest()


def main():
    # --- the synthetic tree, via this repo's generator (deterministic) ---
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )

    import shutil

    shutil.rmtree(TREE, ignore_errors=True)
    generate_panoptic_tree(
        TREE, num_train_frames=NUM_FRAMES, num_val_frames=2,
        num_joints=NUM_JOINTS, num_cameras=NUM_CAMS,
    )

    # --- reference stack -------------------------------------------------
    from config import get_default_configs as ref_configs  # noqa: E402
    from dataset.panoptic_dataset import CMUPanopticDataset  # noqa: E402
    from pose_estimators.pose_resnet import PoseResNet  # noqa: E402
    from strategy import ActiveLearningStrategy as RefStrategy  # noqa: E402
    from torch.utils.data import DataLoader  # noqa: E402

    from helpers import golden_fill_values  # noqa: E402

    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", init_method="tcp://localhost:29517",
            world_size=1, rank=0,
        )

    cfg = ref_configs()
    cfg.NUM_GPUS = 1
    cfg.DATA.TYPE = "panoptic"
    cfg.DATA.NUM_JOINTS = NUM_JOINTS
    cfg.DATA.PANOPTIC.HOME = TREE
    cfg.DATA.PANOPTIC.LABEL_PATH = os.path.join(TREE, "labels.json")
    cfg.DATA.PANOPTIC.GT_BOXES = os.path.join(TREE, "boxes.json")
    cfg.DATA.PANOPTIC.TRAIN_VAL_SPLIT = os.path.join(TREE, "split.json")
    cfg.AL.STRATEGY = "TRIANGULATION"

    # Every scoring variant the reference dispatches on
    # (strategy.py:1072-1095 for the STRATEGY branch,
    # utils/triangulation.py:192-199 for USE_SOFTARGMAX,
    # utils/triangulation.py:224-227 + 236-257 for USE_REPROJECTION_XE).
    # Overrides apply to cfg.AL.
    variants = {
        "TRIANGULATION": {},
        "TRI_SOFTARGMAX": {"USE_SOFTARGMAX": True},
        "TRI_XE": {"USE_REPROJECTION_XE": True, "REPROJECTION_SIGMA": 2.0},
        "MPE_AVG": {"STRATEGY": "MPE", "MPE_CONFIG": "AVG"},
        "MPE_STD": {"STRATEGY": "MPE", "MPE_CONFIG": "STD"},
        "HP_AVG": {"STRATEGY": "HP", "HP_CONFIG": "AVG"},
        "HP_STD": {"STRATEGY": "HP", "HP_CONFIG": "STD"},
        "BSB_AVG": {"STRATEGY": "BSB", "BSB_CONFIG": "AVG"},
        "BSB_STD": {"STRATEGY": "BSB", "BSB_CONFIG": "STD"},
    }

    dataset = CMUPanopticDataset(
        cfg.DATA, cfg.POSE_ESTIMATOR.STRIDE, split="train"
    )
    assert len(dataset.unlabeled_data) == NUM_FRAMES
    dataset.resample_unlabeled_data()
    loader = DataLoader(dataset, batch_size=2, num_workers=0)

    from pose_estimators.hrnet import PoseHighResolutionNet  # noqa: E402

    # Cache the deterministic eval-mode forward per (model, batch): one
    # inference serves all nine variants.
    _orig_heatmap = RefStrategy._compute_batch_heatmap  # staticmethod
    _hm_cache = {}

    def _cached_heatmap(pose_estimator, dp):
        key = (
            id(pose_estimator),
            tuple(int(p) for p in dp["pose"]),
            tuple(int(f) for f in dp["frame_id"]),
        )
        if key not in _hm_cache:
            _hm_cache[key] = _orig_heatmap(pose_estimator, dp)
        return _hm_cache[key]

    RefStrategy._compute_batch_heatmap = staticmethod(_cached_heatmap)

    golden = {
        "meta": {
            "num_joints": NUM_JOINTS,
            "num_cams": NUM_CAMS,
            "num_frames": NUM_FRAMES,
            "weight_seed": WEIGHT_SEED,
            "tree_checksum": tree_checksum(TREE),
            "reference": "/root/reference/strategy.py:1004-1215",
            "variants": {k: dict(v) for k, v in variants.items()},
        },
        "models": {},
    }
    # Golden-filled HRNet emits heatmaps spanning ±14000 (measured) —
    # np.exp overflows and the reference's own MPE crashes on
    # math.log(0) (strategy.py:1173-1174).  Scale its final layer by an
    # exact power of two so heatmaps land in the ±10 regime real
    # checkpoints produce; the test applies the same scale before
    # conversion, so both pipelines see identical weights.
    head_scales = {"pose_resnet50": 1.0, "hrnet_w32": 2.0**-11}

    for tag, model in (
        ("pose_resnet50", PoseResNet(num_joints=NUM_JOINTS, num_layers=50)),
        ("hrnet_w32", PoseHighResolutionNet(num_joints=NUM_JOINTS)),
    ):
        names, shapes = [], []
        for name, tensor in model.state_dict().items():
            if name.endswith("num_batches_tracked"):
                continue
            names.append(name)
            shapes.append(tuple(tensor.shape))
        values = golden_fill_values(names, shapes, WEIGHT_SEED)
        head_scale = head_scales[tag]
        if head_scale != 1.0:
            for name in values:
                if name.startswith("final_layer."):
                    values[name] = values[name] * np.float32(head_scale)
        missing, unexpected = model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in values.items()}, strict=False
        )
        assert not unexpected
        assert all(m.endswith("num_batches_tracked") for m in missing)
        model.eval()

        sal_dicts = {}
        for vname, overrides in variants.items():
            vcfg = cfg.clone()
            for k, v in overrides.items():
                setattr(vcfg.AL, k, v)
            strategy = RefStrategy(vcfg)
            sal_dict = strategy._compute_sal_dict(loader, model)
            assert len(sal_dict["al_metric"]) == NUM_FRAMES
            sal_dicts[vname] = {
                key: {
                    g: (
                        float(val[g])
                        if key != "pred_3d_keypoints"
                        else val[g]
                    )
                    for g in val
                }
                for key, val in sal_dict.items()
            }
            for guid in sal_dict["al_metric"]:
                print(
                    "%s %s %s: al %.6f sal %.6f inliers %d mkpe %.4f"
                    % (
                        tag,
                        vname,
                        guid,
                        sal_dict["al_metric"][guid],
                        sal_dict["sal_metric"][guid],
                        int(sal_dict["inlier_count"][guid]),
                        sal_dict["mkpe"][guid],
                    )
                )
        golden["models"][tag] = {
            # torch state_dict names/shapes: the test regenerates the same
            # weights via helpers.golden_fill_values without torch, then
            # scales final_layer.* by head_scale (see above).
            "weights": {
                "names": names,
                "shapes": shapes,
                "head_scale": head_scale,
            },
            "sal_dicts": sal_dicts,
        }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f)
    print("wrote %s" % OUT)


if __name__ == "__main__":
    main()
