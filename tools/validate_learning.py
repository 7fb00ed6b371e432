"""End-to-end learning validation.

Trains PoseResNet-18 on a synthetic camera-ring dataset and then evaluates
MKPE on the *training* frames: a correct pipeline must reach the stride-4
argmax quantization floor (~1.5 world units for this rig, 3D-PCK@5 = 100%).
This closes the loop across host prep, device GT synthesis, training,
heatmap decode, RANSAC-DLT triangulation, and the metrics stack.

Run on the TPU (default) or CPU (JAX_PLATFORMS=cpu, slow):
  python tools/validate_learning.py [--steps 2000] [--frames 8]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--num_aug", type=int, default=0)
    parser.add_argument(
        "--loss", default="MSE", choices=["MSE", "INTEGRAL", "MSE+INTEGRAL"],
        help="training objective (TRAIN.LOSS)",
    )
    parser.add_argument("--workdir", default="/tmp/mval_validate")
    args = parser.parse_args()

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.data.synthetic import generate_panoptic_tree
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy
    from multi_view_active_learning_tpu.utils import checkpoint as ckpt

    tree = generate_panoptic_tree(
        os.path.join(args.workdir, "tree"),
        num_train_frames=args.frames,
        num_val_frames=max(args.frames // 2, 2),
    )
    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = tree
    cfg.DATA.INPUT_WIDTH = 64
    cfg.DATA.INPUT_HEIGHT = 64
    cfg.DATA.EPOCH_SIZE = 2048
    cfg.DATA.NUM_AUG = args.num_aug
    cfg.DATA.AUG_MAGNITUDE = 9
    cfg.DATA.USE_ROTATION = False
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TRAIN.LOSS = args.loss
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.VAL_SIZE = 4
    cfg.TRAIN.OPTIM.TOTAL_STEPS = args.steps
    cfg.TRAIN.LOG_EVERY_ITER = max(args.steps // 4, 1)
    cfg.LOG_DIR = os.path.join(args.workdir, "logs")
    cfg.EXPR_NAME = "VALIDATE"

    strategy = ActiveLearningStrategy(cfg)
    train = build_dataset(cfg, "train")
    val = build_dataset(cfg, "val")
    t0 = time.time()
    strategy.run_fully_supervised_training(strategy.new_state(), train, val)
    print("train time: %.1fs" % (time.time() - t0))

    final = glob.glob(
        os.path.join(cfg.LOG_DIR, "VALIDATE", "FULLY_SUPERVISED",
                     "checkpoints", "CKPT-FINAL")
    )[0]
    state = ckpt.restore_params_only(final, strategy.new_state())
    train2 = build_dataset(cfg, "train")
    train2.label_all()
    train2.resample_frames(-1, rng=np.random.default_rng(0))
    res = strategy._evaluate_all(-1, state, strategy._get_loader(train2, 4))
    pck5 = float(np.mean(res["pcks"][-1]))
    print("train-set MKPE: %.3f  3D-PCK@5: %.3f" % (res["mkpe"], pck5))
    ok = res["mkpe"] < 3.0 and pck5 > 0.95
    print("VALIDATION %s" % ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
