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
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    import jax
    import jax.numpy as jnp

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.ops import triangulate
    from multi_view_active_learning_tpu.utils import profiling
    from tests.helpers import make_ring_cameras

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 19
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 50
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), input_shape=(1, 256, 256, 3))

    rng = np.random.default_rng(0)
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

    def score(images_in):
        return engine.score_step(
            state.params, state.batch_stats, images_in, proj, valid, pairs,
            gt, key, al_strategy="TRIANGULATION",
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
    wall = time.perf_counter() - t0

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


if __name__ == "__main__":
    main()
