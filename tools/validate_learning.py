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
    parser.add_argument(
        "--compare_pool", type=int, default=0,
        help="score a SEPARATE synthetic pool of this many frames for the "
        "int8 comparison (0 = reuse the training tree).  The per-strategy "
        "gate evidence should come from a few-hundred-frame pool, not the "
        "8-frame training set.",
    )
    parser.add_argument(
        "--bootstrap", type=int, default=1000,
        help="bootstrap resamples for the rank-correlation CI",
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
        ok = _int8_compare(cfg, state, args) and ok
    return 0 if ok else 1


def _spearman_ci(a, b, n_boot: int, rng) -> tuple:
    """(rank_corr, ci_lo, ci_hi): Spearman correlation with a frame-level
    bootstrap CI — the uncertainty that matters for 'does int8 rank this
    POOL like float', resampling frames with replacement."""
    def spearman(x, y):
        rx = np.argsort(np.argsort(x)).astype(np.float64)
        ry = np.argsort(np.argsort(y)).astype(np.float64)
        c = np.corrcoef(rx, ry)[0, 1]
        return float(c) if np.isfinite(c) else 0.0

    point = spearman(a, b)
    n = len(a)
    boots = np.empty(n_boot)
    for i in range(n_boot):
        idx = rng.integers(0, n, size=n)
        boots[i] = spearman(a[idx], b[idx])
    lo, hi = np.percentile(boots, [2.5, 97.5])
    return point, float(lo), float(hi)


def _int8_compare(cfg, state, args) -> bool:
    """Float-vs-int8 scoring on a TRAINED checkpoint, PER STRATEGY: the
    evidence behind the TPU.INT8_SCORING default.  The AL metric only feeds
    frame selection (a ranking, reference strategy.py:945-949), so the bar
    is ranking agreement, not bitwise parity.

    THE BAR AND ITS RATIONALE: a strategy is int8-safe iff
      (a) the 95% bootstrap CI of the Spearman rank correlation lies
          entirely above 0.9, and
      (b) top-25% overlap >= 0.75.
    Selection consumes only the top AL.ITER_AMOUNT ranks of the pool
    (reference strategy.py:945-950 nlargest), so (b) demands that at least
    3 of every 4 frames the float pipeline would select are also selected
    under int8, and (a) demands the global ordering agree tightly enough
    that the remaining quarter are near-boundary swaps (frames of nearly
    equal metric), not inversions hoisted from deep in the pool.  The CI —
    not the point estimate — must clear the bar, so a small pool cannot
    pass on luck; a CI that straddles the bar FAILS.

    Arms per strategy: full int8, and for strategies that rank raw heatmap
    VALUES (MPE/BSB) also MIXED int8 (TPU.INT8_FLOAT_TAIL_STAGES=1 — last
    residual stage float).  The product gates
    (Engine.INT8_SAFE_STRATEGIES for full int8, Engine.INT8_MIXED_TAIL for
    mixed) are checked against the matching arm's evidence.  CORESET is
    compared by selected-set overlap (k-center greedy over the
    triangulated poses); eval-MKPE is compared for the TPU.INT8_EVAL
    (off-by-default) knob."""
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.ops import coreset as coreset_ops
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    if args.compare_pool:
        pool_tree = generate_panoptic_tree(
            os.path.join(args.workdir, "compare_pool_%d" % args.compare_pool),
            num_train_frames=args.compare_pool,
            num_val_frames=2,
            seed=7,
        )
        cfg = cfg.clone()
        cfg.DATA.SYNTHETIC_ROOT = pool_tree

    rng = np.random.default_rng(11)
    good = True
    sal = {}
    raw_ok = {}
    # (strategy, arm): arm None=float, 0=full int8, 1=mixed (1-stage tail).
    arms = [("TRIANGULATION", None), ("TRIANGULATION", 0),
            ("MPE", None), ("MPE", 0), ("MPE", 1),
            ("HP", None), ("HP", 0),
            ("BSB", None), ("BSB", 0), ("BSB", 1)]
    for strategy_name, arm in arms:
        c = cfg.clone()
        c.AL.STRATEGY = strategy_name
        c.TPU.INT8_SCORING = arm is not None
        # RAW behavior is the evidence; the per-strategy product gates
        # are checked against it below, so bypass them here.
        c.TPU.INT8_SCORING_FORCE = arm is not None
        c.TPU.INT8_FLOAT_TAIL_STAGES = arm or 0
        strat = ActiveLearningStrategy(c)
        pool = build_dataset(c, "train")
        pool.resample_unlabeled_data()
        sal[(strategy_name, arm)] = strat._compute_sal_dict(pool, state)

    for strategy_name, arm in arms:
        if arm is None:
            continue
        tag = "int8" if arm == 0 else "mixed(tail=%d)" % arm
        guids = list(sal[(strategy_name, None)]["al_metric"])
        a = np.asarray(
            [sal[(strategy_name, None)]["al_metric"][g] for g in guids]
        )
        b = np.asarray(
            [sal[(strategy_name, arm)]["al_metric"][g] for g in guids]
        )
        rank_corr, ci_lo, ci_hi = _spearman_ci(a, b, args.bootstrap, rng)
        k = max(len(guids) // 4, 1)
        topk_f32 = set(np.argsort(-a)[:k].tolist())
        topk_i8 = set(np.argsort(-b)[:k].tolist())
        overlap = len(topk_f32 & topk_i8) / k
        raw_ok[(strategy_name, arm)] = ci_lo > 0.9 and overlap >= 0.75
        print(
            "%s vs float [%s] (%d frames): rank_corr %.3f "
            "(95%% CI [%.3f, %.3f])  top-%d overlap %.2f  %s"
            % (tag, strategy_name, len(guids), rank_corr, ci_lo, ci_hi, k,
               overlap,
               "ok" if raw_ok[(strategy_name, arm)] else "unsafe")
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
        arm: {
            g: np.asarray(kp)
            for g, kp in sal[("TRIANGULATION", arm)][
                "pred_3d_keypoints"
            ].items()
            if np.isfinite(kp).all()
        }
        for arm in (None, 0)
    }
    common = [g for g in finite[None] if g in finite[0]]
    n_sel = min(k, len(common))
    picks = {}
    for arm in (None, 0):
        cs = coreset_ops.CoreSet(
            {g: finite[arm][g] for g in common}, {}, 2
        )
        picks[arm] = set(cs.select_batch(n_sel))
    coreset_overlap = len(picks[None] & picks[0]) / max(n_sel, 1)
    raw_ok[("CORESET", 0)] = coreset_overlap >= 0.75
    print(
        "int8 vs float [CORESET] top-%d selection overlap %.2f  %s"
        % (n_sel, coreset_overlap,
           "ok" if raw_ok[("CORESET", 0)] else "unsafe")
    )

    # The PRODUCT contract: every strategy the default runs int8 (full or
    # mixed) must have measured safe ON THAT ARM, and every measured-unsafe
    # strategy must be gated to float.
    for (name, arm), arm_ok in raw_ok.items():
        if arm == 0:
            gated_on = name in Engine.INT8_SAFE_STRATEGIES
            tag = "full int8"
        else:
            gated_on = Engine.INT8_MIXED_TAIL.get(name) == arm
            tag = "mixed int8 (tail=%d)" % arm
        if gated_on and not arm_ok:
            print("GATE VIOLATION: %s defaults to %s but measured unsafe"
                  % (name, tag))
            good = False
        if not gated_on and arm_ok:
            print("note: %s measured %s-safe here but the gate does not "
                  "use it" % (name, tag))

    tri_f, tri_i = sal[("TRIANGULATION", None)], sal[("TRIANGULATION", 0)]
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
