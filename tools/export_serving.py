"""Export a trained model as a self-contained StableHLO serving artifact.

See multi_view_active_learning_tpu/serving.py for the artifact contract
(uint8 pixels + square boxes in; heatmaps, decoded keypoints, confidences
out; weights baked in).  The output runs on any JAX runtime (CPU/TPU)
without this package.

Usage:
  python tools/export_serving.py --ckpt <orbax dir> --out model.stablehlo \
      [--config_file experiments/foo.yaml] [--model POSE_RESNET]
      [--num_layers 50] [--num_joints 19] --views 31 \
      [--batch 4 | --symbolic-batch] [--int8-calib images.npz] [--selftest]

  --int8-calib: .npz with an `images` uint8 array [B, V, H, W, 3]; bakes
    the int8 MXU backbone in, calibrated on that batch.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir "
                        "(omitted = fresh init, for artifact plumbing tests)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--config_file", default=None)
    parser.add_argument("--model", default=None, help="POSE_RESNET | HRNET")
    parser.add_argument("--num_layers", type=int, default=None)
    parser.add_argument("--num_joints", type=int, default=None)
    parser.add_argument("--views", type=int, default=31)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument(
        "--symbolic-batch", action="store_true",
        help="export a symbolic batch dim (one artifact, any request size)",
    )
    parser.add_argument("--int8-calib", default=None)
    parser.add_argument(
        "--selftest", action="store_true",
        help="deserialize the written artifact and run one random batch",
    )
    args = parser.parse_args()

    import jax

    # Export is tracing + lowering — no device execution; keep the TPU free.
    jax.config.update("jax_platforms", "cpu")

    from multi_view_active_learning_tpu import serving
    from multi_view_active_learning_tpu.config import load_config
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.utils import (
        checkpoint as ckpt_utils,
        enable_compilation_cache,
    )

    enable_compilation_cache("/tmp/jax_cache")
    cfg = load_config(args.config_file)
    if args.model:
        cfg.POSE_ESTIMATOR.TYPE = args.model
    if args.num_layers is not None:
        cfg.POSE_ESTIMATOR.NUM_LAYERS = args.num_layers
    if args.num_joints is not None:
        cfg.DATA.NUM_JOINTS = args.num_joints
    if args.int8_calib:
        # --int8-calib is an explicit request: force the int8 path on even
        # for model families where the SCORING default is float (HRNet,
        # TPU.INT8_SCORING_HRNET) and for AL strategies the per-strategy
        # scoring gate keeps float (MPE/BSB, EMBEDDING coreset) — the gate
        # protects selection parity, which a frozen serving artifact never
        # runs.  INT8_SCORING_FORCE is the documented bypass.
        cfg.TPU.INT8_SCORING = True
        cfg.TPU.INT8_SCORING_HRNET = True
        cfg.TPU.INT8_SCORING_FORCE = True

    engine = Engine(cfg)
    state = engine.init_state(
        jax.random.PRNGKey(0),
        input_shape=(1, cfg.DATA.INPUT_HEIGHT, cfg.DATA.INPUT_WIDTH, 3),
    )
    if args.ckpt:
        state = ckpt_utils.restore_checkpoint(args.ckpt, state)
    else:
        print("WARNING: no --ckpt; exporting freshly initialized weights")

    int8_scales = None
    if args.int8_calib:
        calib = np.load(args.int8_calib)["images"]
        int8_scales = engine.int8_calibrate(
            state.params, state.batch_stats, calib
        )

    exported = serving.export_serving(
        engine,
        state.params,
        state.batch_stats,
        None if args.symbolic_batch else args.batch,
        args.views,
        int8_scales=int8_scales,
    )
    serving.save_serving(exported, args.out)
    print(
        "wrote %s (%.1f MB): %s -> (confidence, heatmaps, keypoints)"
        % (
            args.out,
            os.path.getsize(args.out) / 1e6,
            [str(a) for a in exported.in_avals],
        )
    )

    if args.selftest:
        call = serving.load_serving(args.out)
        B = 1 if args.symbolic_batch else args.batch
        rng = np.random.default_rng(0)
        images = rng.integers(
            0, 256,
            size=(B, args.views, cfg.DATA.INPUT_HEIGHT, cfg.DATA.INPUT_WIDTH, 3),
        ).astype(np.uint8)
        box = np.tile(
            np.asarray([0, 0, 256, 256], np.float32), (B, args.views, 1)
        )
        out = call(images, box)
        print(
            "selftest ok: heatmaps %s, keypoints %s, confidence mean %.4f"
            % (
                np.asarray(out["heatmaps"]).shape,
                np.asarray(out["keypoints"]).shape,
                float(np.asarray(out["confidence"]).mean()),
            )
        )


if __name__ == "__main__":
    main()
