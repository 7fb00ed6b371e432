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
    parser.add_argument(
        "--int8_compare", action="store_true",
        help="after validation, score the pool with float vs int8 "
        "(TPU.INT8_SCORING) on the trained checkpoint and report ranking "
        "agreement + eval-MKPE delta (the INT8_SCORING-default evidence)",
    )
    args = parser.parse_args()

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.data.synthetic import generate_panoptic_tree
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy
    from multi_view_active_learning_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
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

    if ok and args.int8_compare:
        ok = _int8_compare(cfg, state) and ok
    return 0 if ok else 1


def _int8_compare(cfg, state) -> bool:
    """Float-vs-int8 scoring on a TRAINED checkpoint, PER STRATEGY: the
    evidence behind the TPU.INT8_SCORING default.  The AL metric only feeds
    frame selection (a ranking, reference strategy.py:945-949), so the bar
    is ranking agreement, not bitwise parity: rank_corr > 0.9 and top-25%
    overlap >= 0.75 for every metric strategy (TRIANGULATION scores off
    triangulated geometry; MPE/HP/BSB score off raw heatmap values, which
    int8 requant perturbs differently), plus selected-set overlap for
    CORESET (k-center greedy over the triangulated poses).  eval-MKPE is
    compared for the TPU.INT8_EVAL (off-by-default) knob."""
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.ops import coreset as coreset_ops
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    good = True
    sal = {}
    raw_ok = {}
    for strategy_name in ("TRIANGULATION", "MPE", "HP", "BSB"):
        for int8 in (False, True):
            c = cfg.clone()
            c.AL.STRATEGY = strategy_name
            c.TPU.INT8_SCORING = int8
            # RAW int8 behavior is the evidence; the per-strategy product
            # gate (Engine.INT8_SAFE_STRATEGIES) is checked against it
            # below, so bypass it here.
            c.TPU.INT8_SCORING_FORCE = int8
            strat = ActiveLearningStrategy(c)
            pool = build_dataset(c, "train")
            pool.resample_unlabeled_data()
            sal[(strategy_name, int8)] = strat._compute_sal_dict(pool, state)
        guids = list(sal[(strategy_name, False)]["al_metric"])
        a = np.asarray(
            [sal[(strategy_name, False)]["al_metric"][g] for g in guids]
        )
        b = np.asarray(
            [sal[(strategy_name, True)]["al_metric"][g] for g in guids]
        )
        ra = np.argsort(np.argsort(a))
        rb = np.argsort(np.argsort(b))
        rank_corr = float(np.corrcoef(ra, rb)[0, 1])
        k = max(len(guids) // 4, 1)
        topk_f32 = set(np.argsort(-a)[:k].tolist())
        topk_i8 = set(np.argsort(-b)[:k].tolist())
        overlap = len(topk_f32 & topk_i8) / k
        raw_ok[strategy_name] = rank_corr > 0.9 and overlap >= 0.75
        print(
            "int8(raw) vs float [%s] (%d frames): rank_corr %.3f  top-%d "
            "overlap %.2f  %s"
            % (strategy_name, len(guids), rank_corr, k, overlap,
               "ok" if raw_ok[strategy_name] else "unsafe")
        )

    # CORESET selects by triangulated pose, not by a metric ranking:
    # compare the actual selected sets over the float vs int8 poses.
    k = max(len(guids) // 4, 1)
    # Same non-finite filter the product applies (strategy.py CORESET
    # branch): one NaN triangulation would win every k-center argmax in
    # BOTH arms and make the overlap spuriously perfect.  Both arms select
    # from the guids finite in BOTH — a frame only one arm can consider
    # would depress the overlap with no int8 signal in it — and the
    # denominator is the number actually selected, not k, so small or
    # partially-degenerate pools cannot spuriously trip the gate check.
    finite = {
        int8: {
            g: np.asarray(kp)
            for g, kp in sal[("TRIANGULATION", int8)][
                "pred_3d_keypoints"
            ].items()
            if np.isfinite(kp).all()
        }
        for int8 in (False, True)
    }
    common = [g for g in finite[False] if g in finite[True]]
    n_sel = min(k, len(common))
    picks = {}
    for int8 in (False, True):
        cs = coreset_ops.CoreSet(
            {g: finite[int8][g] for g in common}, {}, 2
        )
        picks[int8] = set(cs.select_batch(n_sel))
    coreset_overlap = len(picks[False] & picks[True]) / max(n_sel, 1)
    raw_ok["CORESET"] = coreset_overlap >= 0.75
    print(
        "int8(raw) vs float [CORESET] top-%d selection overlap %.2f  %s"
        % (n_sel, coreset_overlap, "ok" if raw_ok["CORESET"] else "unsafe")
    )

    # The PRODUCT contract: every strategy the default runs int8 must have
    # measured safe, and every measured-unsafe strategy must be gated to
    # float (Engine.INT8_SAFE_STRATEGIES).
    for name, ok in raw_ok.items():
        gated_on = name in Engine.INT8_SAFE_STRATEGIES
        if gated_on and not ok:
            print("GATE VIOLATION: %s defaults to int8 but measured unsafe"
                  % name)
            good = False
        if not gated_on and ok:
            print("note: %s measured int8-safe here but stays float "
                  "(conservative gate)" % name)

    tri_f, tri_i = sal[("TRIANGULATION", False)], sal[("TRIANGULATION", True)]
    mk_a = np.asarray([tri_f["mkpe"][g] for g in guids])
    mk_b = np.asarray([tri_i["mkpe"][g] for g in guids])
    print(
        "median per-frame |MKPE delta| %.3f"
        % float(np.median(np.abs(mk_a - mk_b)))
    )

    evals = {}
    for int8_eval in (False, True):
        c = cfg.clone()
        c.TPU.INT8_EVAL = int8_eval
        strat = ActiveLearningStrategy(c)
        val = build_dataset(c, "train")
        val.label_all()
        val.resample_frames(-1, rng=np.random.default_rng(0))
        evals[int8_eval] = strat._evaluate_all(
            -1, state, strat._get_loader(val, 4)
        )
    print(
        "eval MKPE float %.3f vs int8 %.3f (delta %.3f)"
        % (
            evals[False]["mkpe"],
            evals[True]["mkpe"],
            evals[True]["mkpe"] - evals[False]["mkpe"],
        )
    )
    print("INT8 COMPARE %s" % ("PASSED" if good else "FAILED"))
    return good


if __name__ == "__main__":
    sys.exit(main())
