"""North-star benchmark: full AL scoring pass, frames/sec/chip.

Workload (BASELINE.json): 31-view Panoptic-shape heatmap inference
(PoseResNet-50, 256x256 crops, 19 joints) + batched RANSAC-DLT triangulation
+ TRIANGULATION AL metric for every frame, then k-center-greedy coreset
ranking over the scored pool — all on one chip.

vs_baseline: the reference implementation's scoring pass is CPU-bound —
per frame it runs 19 joints x 64 view-pair numpy SVD RANSAC plus 8
per-sample NCCL all_gathers (reference strategy.py:1004-1147,
utils/triangulation.py:260-338), which bounds it to roughly 8 frames/s on an
A100-class host regardless of GPU speed.  BASELINE_FPS below encodes that
estimate; the north-star target is >= 5x (BASELINE.json).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache, forced through the config API: a site hook
# pre-imports jax before this module runs, so an env var set here (or not
# exported by the caller — the driver runs plain `python bench.py`) would be
# read too late.  First-time compiles on this 1-core host cost minutes;
# cached runs start timing in seconds.
from multi_view_active_learning_tpu.utils import enable_compilation_cache

enable_compilation_cache(
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
)

BASELINE_FPS = 8.0
NUM_VIEWS = int(os.environ.get("BENCH_VIEWS", "31"))
NUM_JOINTS = 19
IMG = 256
MODEL = os.environ.get("BENCH_MODEL", "POSE_RESNET")  # or HRNET
# AL metric computed in the scoring step (TRIANGULATION | MPE | HP | BSB).
STRATEGY = os.environ.get("BENCH_STRATEGY", "TRIANGULATION")
# Mixed-precision float tail for the int8 backbone
# (TPU.INT8_FLOAT_TAIL_STAGES; the MPE/BSB compromise).
FLOAT_TAIL = int(os.environ.get("BENCH_FLOAT_TAIL", "0"))
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
# 50-step default: the tunneled backend shows transient slowdowns right
# after executable setup; longer timed windows are markedly more stable
# (round-1 note above the repeats table in BENCH_NOTES.md).
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
POOL_FOR_CORESET = 2048
CORESET_PICK = 100
# BENCH_MODE=pool: product-path sweep — synthetic pool through the real
# FrameLoader (host JPEG decode + crop) into strategy._compute_sal_dict.
MODE = os.environ.get("BENCH_MODE", "device")
POOL_FRAMES = int(os.environ.get("BENCH_POOL_FRAMES", "64"))
POOL_WORKERS = int(os.environ.get("BENCH_POOL_WORKERS", "2"))


def _apply_int8_env(cfg):
    """BENCH_INT8 semantics: unset = the PRODUCT defaults (PoseResNet int8,
    HRNet float — TPU.INT8_SCORING_HRNET measured a net loss, BENCH_NOTES
    round 3); "1"/"0" force int8/float for whichever model is benched."""
    v = os.environ.get("BENCH_INT8", "")
    cfg.TPU.INT8_FLOAT_TAIL_STAGES = FLOAT_TAIL
    if v == "":
        return
    # "force" bypasses the per-strategy selection-safety gate
    # (Engine.INT8_SAFE_STRATEGIES) so raw int8/mixed throughput of any
    # strategy can be measured.
    cfg.TPU.INT8_SCORING = v in ("1", "force")
    cfg.TPU.INT8_SCORING_HRNET = v in ("1", "force")
    cfg.TPU.INT8_SCORING_FORCE = v == "force"


def pool_mode():
    """End-to-end product-path scoring (reference: strategy.py:925-930 +
    1004-1147): host pipeline (JPEG decode, square-box crop, resize, uint8
    ship) feeding the jitted score path, over a real FramePool.

    Prints the same one-line JSON schema with the CACHE-WARM sweep rate —
    the steady state of the AL loop, where every iteration re-scores the
    same pool with a new model and the decoded-view cache is hot.  The
    cache-cold (first sweep, decode-bound) rate is printed on stderr as a
    diagnostic; on this 1-CPU-core host it measures libjpeg, not the
    framework."""
    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    tree_root = "/tmp/mval_bench_pool_v%d_f%d" % (NUM_VIEWS, POOL_FRAMES)
    if not os.path.isdir(tree_root):
        generate_panoptic_tree(
            tree_root, num_train_frames=POOL_FRAMES, num_val_frames=2,
            num_joints=NUM_JOINTS, num_cameras=NUM_VIEWS,
        )
    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = tree_root
    cfg.DATA.NUM_JOINTS = NUM_JOINTS
    cfg.POSE_ESTIMATOR.TYPE = MODEL
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 50
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    _apply_int8_env(cfg)
    cfg.AL.STRATEGY = STRATEGY
    cfg.AL.INFERENCE.BATCH_SIZE = BATCH
    cfg.AL.INFERENCE.NUM_WORKERS = POOL_WORKERS
    cfg.LOG_DIR = "/tmp/mval_bench_pool_logs"
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    pool.resample_unlabeled_data()
    state = strategy.new_state()

    t0 = time.perf_counter()
    sal = strategy._compute_sal_dict(pool, state)  # compile + cache-cold
    cold = len(sal["al_metric"]) / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    sal = strategy._compute_sal_dict(pool, state)  # cache-warm
    warm1 = len(sal["al_metric"]) / (time.perf_counter() - t0)
    # Second warm sweep = the AL loop's steady state: the first warm sweep
    # still pays the allocator churn the cold decode sweep left behind
    # (BENCH_NOTES round 3), every later sweep repeats this one.
    t0 = time.perf_counter()
    sal = strategy._compute_sal_dict(pool, state)
    warm_dt = time.perf_counter() - t0
    n = len(sal["al_metric"])
    fps = n / warm_dt
    sys.stderr.write(
        "pool sweep: %d frames x %d views; cache-cold %.2f fps "
        "(compile+decode-bound on this host), cache-warm %.2f then %.2f "
        "fps (steady state)\n" % (n, NUM_VIEWS, cold, warm1, fps)
    )
    print(
        json.dumps(
            {
                "metric": "al_scoring_product_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


def main():
    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.ops import coreset, triangulate
    from tests.helpers import make_ring_cameras

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = NUM_JOINTS
    cfg.POSE_ESTIMATOR.TYPE = MODEL
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 50
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.PALLAS_HEAD = os.environ.get("BENCH_PALLAS_HEAD", "0") == "1"
    # MXU-packed small-channel HRNet branch convs (ops/packed_conv.py);
    # e.g. BENCH_PACKED=32 packs the 32-channel high-res branch.
    cfg.TPU.HRNET_PACKED_MAX_CH = int(os.environ.get("BENCH_PACKED", "0"))
    # Unset BENCH_INT8 measures the PRODUCT defaults; see _apply_int8_env.
    _apply_int8_env(cfg)
    # Fused int8 Pallas phase-deconv head (TPU.INT8_DECONV).
    cfg.TPU.INT8_DECONV = os.environ.get("BENCH_INT8_DECONV", "0") == "1"
    # Space-to-depth stem (uint8 s2d before normalize; exact remap for both
    # float and int8 forwards — engine._normalize_flat).
    cfg.TPU.SPACE_TO_DEPTH_STEM = os.environ.get("BENCH_S2D", "0") == "1"
    cfg.AL.STRATEGY = STRATEGY
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 3))

    rng = np.random.default_rng(0)
    # Raw uint8 frames, like the real pipeline ships them; normalization is
    # fused into the scoring executable.
    images = jnp.asarray(
        rng.integers(0, 256, size=(BATCH, NUM_VIEWS, IMG, IMG, 3)).astype(np.uint8)
    )
    proj = jnp.asarray(
        np.broadcast_to(
            make_ring_cameras(NUM_VIEWS, radius=300.0, img=IMG),
            (BATCH, NUM_VIEWS, 3, 4),
        ).astype(np.float32)
    )
    valid = jnp.ones((BATCH, NUM_JOINTS), bool)
    gt = jnp.asarray(rng.normal(size=(BATCH, NUM_JOINTS, 3)).astype(np.float32))
    # Pair budget follows the product config (AL.RANSAC_N_ITERS; -1 = all
    # C(V,2) pairs).  BENCH_PAIRS overrides, e.g. 64 = the reference's own
    # default RANSAC budget (reference utils/triangulation.py:176).
    cfg.AL.RANSAC_N_ITERS = int(
        os.environ.get("BENCH_PAIRS", str(cfg.AL.RANSAC_N_ITERS))
    )
    pairs = jnp.asarray(engine.pairs(NUM_VIEWS))
    key = jax.random.PRNGKey(1)

    # Static activation scales for int8 scoring (None when BENCH_INT8 off).
    int8_scales = engine.int8_calibrate(state.params, state.batch_stats, images)

    def score(images_in):
        return engine.score_step(
            state.params, state.batch_stats, images_in, proj, valid, pairs, gt,
            key, al_strategy=STRATEGY, int8_scales=int8_scales,
        )

    # Warm up: compile, then run chained steps until throughput PLATEAUS.
    # An idle chip/tunnel session ramps over tens of seconds of sustained
    # work, not milliseconds: consecutive cold bench runs measured 260 ->
    # 279 -> 283 fps (BENCH_NOTES round-3 "tunnel restored" section), so a
    # fixed few-second warm-up under-reports steady state by ~8%.  Warm in
    # 20-step windows until the window rate stops improving (>0.5%) three
    # times in a row (and >= 60 s elapsed), capped at 150 s.  Host fetches
    # force real execution — block_until_ready is unreliable through the
    # tunnel.
    def chained_steps(n):
        carry = jnp.zeros((), jnp.uint8)
        for _ in range(n):
            out = score(images + carry)
            carry = (out["al_metric"][0] * 0.0).astype(jnp.uint8)
        float(np.asarray(carry))  # forces the whole chain transitively

    chained_steps(3)  # compile + executable setup
    t_warm = time.perf_counter()
    best_rate, flat_windows = 0.0, 0
    # Minimum 60 s of sustained work before trusting a plateau: the ramp
    # creeps <0.5%/window for tens of seconds (a 90 s cap with a 2-window
    # plateau still reported 273.7 on a cold chip vs 283 fully warm).
    while time.perf_counter() - t_warm < 150.0:
        t0 = time.perf_counter()
        chained_steps(20)
        rate = 20.0 / (time.perf_counter() - t0)
        if rate > best_rate * 1.005:
            best_rate, flat_windows = rate, 0
        else:
            flat_windows += 1
        if flat_windows >= 3 and time.perf_counter() - t_warm > 60.0:
            break

    # Steady state: median of three timed windows (the windows agree to
    # ~0.5% once warm; the median guards against a stray tunnel stall).
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        chained_steps(STEPS)
        times.append(time.perf_counter() - t0)
    scoring_time = sorted(times)[1]
    frames = BATCH * STEPS

    # Coreset ranking over a scored pool (amortized per scoring pass).
    feats = jnp.asarray(
        rng.normal(size=(POOL_FOR_CORESET, 3 * NUM_JOINTS)).astype(np.float32)
    )
    labeled = jnp.asarray(
        np.arange(POOL_FOR_CORESET) >= POOL_FOR_CORESET - 200
    )
    sel = coreset.k_center_greedy(feats, labeled, CORESET_PICK)
    np.asarray(sel)  # compile + force
    t0 = time.perf_counter()
    sel = coreset.k_center_greedy(feats, labeled, CORESET_PICK)
    np.asarray(sel)
    coreset_time = time.perf_counter() - t0
    # Amortize the coreset ranking over the pool it ranks.
    coreset_per_frame = coreset_time / POOL_FOR_CORESET

    per_frame = scoring_time / frames + coreset_per_frame
    fps = 1.0 / per_frame
    print(
        json.dumps(
            {
                "metric": "al_scoring_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    if MODE == "pool":
        pool_mode()
    else:
        main()
