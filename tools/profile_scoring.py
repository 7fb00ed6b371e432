"""Capture a jax.profiler trace of the north-star scoring step.

Runs a few chained score_step executions (the bench.py workload) inside
`utils.profiling.trace` and reports what the trace contains.  View with
TensorBoard's profile plugin or Perfetto.

  python tools/profile_scoring.py [--logdir /tmp/mval_trace] [--steps 5]

Note (tunneled axon backend): device-side TPU traces require the profiler
to reach the device runtime; through the tunnel the capture may degrade to
host-only Python/dispatch events.  The tool reports which event files were
produced either way — on a direct-attached TPU the same command yields the
full XLA op-level timeline.
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
    parser.add_argument("--logdir", default="/tmp/mval_trace")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--views", type=int, default=31)
    parser.add_argument("--model", default="POSE_RESNET",
                        choices=["POSE_RESNET", "HRNET"])
    parser.add_argument("--mode", default="score", choices=["score", "train"],
                        help="score = the AL scoring step (bench.py workload);"
                             " train = the fwd+bwd optimizer step at the"
                             " reference train config (B=2 x 8 views)")
    parser.add_argument("--packed", type=int, default=0,
                        help="TPU.HRNET_PACKED_MAX_CH for HRNET traces")
    parser.add_argument("--int8", action="store_true",
                        help="trace the TPU.INT8_SCORING path (score mode; "
                             "calibrates on the bench batch first)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multi_view_active_learning_tpu.utils import enable_compilation_cache

    # Via the config API — env vars are too late once jax is imported (a
    # site hook imports it at interpreter startup here).
    enable_compilation_cache()

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.ops import triangulate
    from multi_view_active_learning_tpu.utils import profiling
    from tests.helpers import make_ring_cameras

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 19
    cfg.POSE_ESTIMATOR.TYPE = args.model
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 50
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.INT8_SCORING = bool(args.int8)
    cfg.TPU.INT8_SCORING_HRNET = bool(args.int8)  # per-family gate
    cfg.TPU.HRNET_PACKED_MAX_CH = int(args.packed)
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), input_shape=(1, 256, 256, 3))

    rng = np.random.default_rng(0)

    if args.mode == "train":
        B, V = 2, 8  # reference train config (config.py:87, 8 train cams)
        images = jnp.asarray(
            rng.normal(size=(B, V, 256, 256, 3)).astype(np.float32)
        )
        gt = jnp.asarray(
            rng.random((B, V, 64, 64, 19)).astype(np.float32) * 0.1
        )
        pvjv = jnp.ones((B, V, 19), bool)
        fv = jnp.ones((B,), bool)

        def run_traced(n):
            nonlocal state
            for _ in range(n):
                state, metrics = engine.train_step(state, images, gt, pvjv, fv)
            float(jax.device_get(metrics["loss"]))

        run_traced(3)  # warm up
        t0 = time.perf_counter()
        with profiling.trace(args.logdir):
            run_traced(args.steps)
        _report(args, time.perf_counter() - t0)
        return

    B, V = args.batch, args.views
    images = jnp.asarray(
        rng.integers(0, 256, size=(B, V, 256, 256, 3)).astype(np.uint8)
    )
    proj = jnp.asarray(
        np.broadcast_to(
            make_ring_cameras(V, radius=300.0, img=256), (B, V, 3, 4)
        ).astype(np.float32)
    )
    valid = jnp.ones((B, 19), bool)
    gt = jnp.asarray(rng.normal(size=(B, 19, 3)).astype(np.float32))
    pairs = jnp.asarray(triangulate.all_view_pairs(V))
    key = jax.random.PRNGKey(1)

    int8_scales = engine.int8_calibrate(state.params, state.batch_stats, images)

    def score(images_in):
        return engine.score_step(
            state.params, state.batch_stats, images_in, proj, valid, pairs,
            gt, key, al_strategy="TRIANGULATION", int8_scales=int8_scales,
        )

    # Warm up (compile + executable setup) outside the trace.
    carry = jnp.zeros((), jnp.uint8)
    for _ in range(3):
        out = score(images + carry)
        carry = (out["al_metric"][0] * 0.0).astype(jnp.uint8)
    float(np.asarray(carry))

    t0 = time.perf_counter()
    with profiling.trace(args.logdir):
        carry = jnp.zeros((), jnp.uint8)
        for _ in range(args.steps):
            out = score(images + carry)
            carry = (out["al_metric"][0] * 0.0).astype(jnp.uint8)
        float(np.asarray(carry))
    _report(args, time.perf_counter() - t0)


def _report(args, wall: float) -> None:
    produced = sorted(
        glob.glob(os.path.join(args.logdir, "**", "*"), recursive=True)
    )
    print("traced %d steps in %.1f ms (%.2f ms/step)" % (
        args.steps, wall * 1e3, wall * 1e3 / args.steps))
    print("trace dir: %s" % args.logdir)
    for p in produced:
        if os.path.isfile(p):
            print("  %8d  %s" % (os.path.getsize(p), os.path.relpath(p, args.logdir)))
    kinds = {
        "device (xplane)": any(p.endswith(".xplane.pb") for p in produced),
        "trace.json": any("trace.json" in p for p in produced),
    }
    print("contents:", kinds)
    _summarize_device_events(args.logdir)


def _summarize_device_events(logdir: str) -> None:
    """Aggregate per-op device durations from the newest trace.json.gz."""
    import collections
    import gzip
    import json

    traces = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        return
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    names = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in names.items() if n and "TPU" in n}
    cat = collections.defaultdict(lambda: [0.0, 0.0])  # dur_us, flops
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids or "args" not in e:
            continue
        c = e["args"].get("hlo_category")
        if c is None:
            continue
        cat[c][0] += e["dur"]
        cat[c][1] += float(e["args"].get("model_flops", 0) or 0)
        total += e["dur"]
    if not total:
        return
    print("\ndevice time by HLO category:")
    for c, (d, f) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        tf = f / (d * 1e-6) / 1e12 if d else 0.0
        print("  %-28s %8.2f ms total %6.1f%%  %6.1f TFLOP/s"
              % (c, d / 1e3, 100 * d / total, tf))


if __name__ == "__main__":
    main()
