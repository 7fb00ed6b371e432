"""Serving latency/throughput benchmark for the frozen inference path.

Measures the `serving.build_serve_fn` contract (uint8 pixels + square
boxes in -> heatmaps/keypoints/confidences out) the way a serving tier
experiences it: per-request round-trip latency at B=1 (each request's
scalar result fetched back to the host before the next is issued — on the
tunneled axon backend this is also the only way to force execution), and
sustained batched throughput with chained requests.

  python tools/bench_serving.py [--model POSE_RESNET|HRNET] [--views 31]
      [--img 256] [--requests 50] [--batches 1,4] [--int8]

Prints one JSON line:
  {"latency_ms": {"p50": ..., "p90": ..., "p99": ...},
   "throughput_frames_per_sec": {"1": ..., "4": ...}, ...}

The reference has no serving path at all (its checkpoints require the
full torch training stack, reference strategy.py:697-745); this benchmarks
the replacement's production story end to end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="POSE_RESNET",
                        choices=["POSE_RESNET", "HRNET"])
    parser.add_argument("--views", type=int, default=31)
    parser.add_argument("--img", type=int, default=256)
    parser.add_argument("--joints", type=int, default=19)
    parser.add_argument("--requests", type=int, default=50)
    parser.add_argument("--batches", default="1,4")
    parser.add_argument("--int8", action="store_true",
                        help="bake the int8 backbone in (PoseResNet)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from multi_view_active_learning_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from multi_view_active_learning_tpu import serving
    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.engine import Engine

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = args.joints
    cfg.POSE_ESTIMATOR.TYPE = args.model
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 50
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.INT8_SCORING = bool(args.int8)
    cfg.TPU.INT8_SCORING_HRNET = bool(args.int8)
    engine = Engine(cfg)
    state = engine.init_state(
        jax.random.PRNGKey(0), input_shape=(1, args.img, args.img, 3)
    )

    rng = np.random.default_rng(0)
    V, IMG = args.views, args.img

    def request(B):
        images = rng.integers(
            0, 256, size=(B, V, IMG, IMG, 3)
        ).astype(np.uint8)
        box = np.tile(
            np.asarray([0.0, 0.0, IMG, IMG], np.float32), (B, V, 1)
        )
        return jnp.asarray(images), jnp.asarray(box)

    int8_scales = None
    if args.int8:
        int8_scales = engine.int8_calibrate(
            state.params, state.batch_stats, request(2)[0]
        )
    serve = jax.jit(
        serving.build_serve_fn(
            engine, state.params, state.batch_stats, int8_scales
        )
    )

    result = {"model": args.model, "views": V, "img": IMG,
              "int8": bool(args.int8)}

    # ---- per-request latency at B=1 (host round trip each request) ----
    images, box = request(1)
    for _ in range(3):  # compile + executable setup
        out = serve(images, box)
        float(np.asarray(out["confidence"][0, 0, 0]))
    # Ramp: sustained work before timing (the chip/tunnel ramps over tens
    # of seconds of idleness — bench.py's plateau note).
    t_warm = time.perf_counter()
    while time.perf_counter() - t_warm < 20.0:
        out = serve(images, box)
        float(np.asarray(out["confidence"][0, 0, 0]))
    lat = []
    for _ in range(args.requests):
        t0 = time.perf_counter()
        out = serve(images, box)
        float(np.asarray(out["confidence"][0, 0, 0]))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(sorted(lat))
    result["latency_ms"] = {
        "p50": round(float(np.percentile(lat, 50)), 2),
        "p90": round(float(np.percentile(lat, 90)), 2),
        "p99": round(float(np.percentile(lat, 99)), 2),
    }

    # ---- sustained throughput per batch size (chained requests) -------
    result["throughput_frames_per_sec"] = {}
    for B in [int(b) for b in args.batches.split(",")]:
        images, box = request(B)
        carry = jnp.zeros((), jnp.uint8)

        def chained(n):
            nonlocal carry
            for _ in range(n):
                out = serve(images + carry, box)
                carry = (out["confidence"][0, 0, 0] * 0.0).astype(jnp.uint8)
            float(np.asarray(carry))

        chained(3)  # compile this batch shape
        t_warm = time.perf_counter()
        while time.perf_counter() - t_warm < 20.0:
            chained(10)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            chained(20)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        result["throughput_frames_per_sec"][str(B)] = round(20 * B / dt, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
