"""MEASURED reference baseline: time the reference's scoring hot loop.

BENCH_NOTES' 8 fps/A100 baseline for the reference's AL scoring pass
(`/root/reference/strategy.py:1004-1147`) was a reasoned estimate (round-1
item 4); the round-3 verdict asked that its provenance stay explicit.  This
tool replaces reasoning with measurement where the environment allows: it
runs the reference's OWN code (via the import harness + oracle ports that
tools/make_sal_parity_goldens.py already uses) on the exact bench.py
workload shapes — 31 views, 19 joints, 256x256 crops, stride-4 64x64
heatmaps — and times, per frame:

  * the torch-CPU PoseResNet-50 forward (context only: an A100 would do
    this part fast, so it is EXCLUDED from the portable bound);
  * `utils.triangulation.triangulation()` — argmax decode + 19x RANSAC
    (64 shuffled pairs of C(31,2)=465, the reference default) + DLT +
    reprojection error + the per-sample `compute_mkpe`.  This work runs
    on the HOST CPU in the reference no matter what GPU serves the
    forward (`strategy.py:1036-1065`: `.cpu().numpy()` per sample);
  * the MPE / HP / BSB per-frame metric loops
    (`strategy.py:1149-1215`, skimage `peak_local_max` per view x joint).

The reciprocal of the per-frame CPU time is a hard per-process throughput
ceiling for the reference on ANY host: with an infinitely fast GPU and
the per-sample all_gathers free, one scoring process cannot exceed
1 / t_cpu frames/s.  Scale by your host's single-core advantage over this
box to bound an A100-class deployment.

Heatmaps are trained-net-like (one sigma=1.5px Gaussian peak per view x
joint at geometrically consistent reprojections of a random 3D pose,
plus 1% noise) — the CHEAPEST case for the reference's peak loops (fewer
peaks => fewer peak_local_max candidates), so the bound is conservative
in the reference's favor.

Run AFTER the test suite (1 CPU core — contention skews timings):
    python tools/bench_reference.py
Prints one JSON line with the per-frame costs and implied fps ceilings.
"""

import json
import random
import sys
import time
import types

import numpy as np

import make_sal_parity_goldens as harness  # installs reference stubs  # noqa: F401
import torch

NUM_VIEWS = 31
NUM_JOINTS = 19
IMG = 256
STRIDE = 4
HM = IMG // STRIDE
N_FRAMES_TRI = 16
N_FRAMES_PEAKS = 6  # MPE/BSB run peak_local_max 589x per frame — pricey


def _trained_like_heatmaps(proj, rng):
    """[V, K, HM, HM] float32: one Gaussian peak per view x joint at the
    reprojection of a random 3D pose (so RANSAC finds real inliers), plus
    low-amplitude noise."""
    pose_3d = rng.normal(0.0, 30.0, size=(NUM_JOINTS, 3))
    hom = np.concatenate([pose_3d, np.ones((NUM_JOINTS, 1))], axis=1)
    pts = np.einsum("vij,kj->vki", proj, hom)
    xy = pts[..., :2] / np.maximum(pts[..., 2:3], 1e-6) / STRIDE  # [V,K,2]
    ys, xs = np.mgrid[0:HM, 0:HM].astype(np.float32)
    d2 = (xs[None, None] - xy[..., 0, None, None]) ** 2 + (
        ys[None, None] - xy[..., 1, None, None]
    ) ** 2
    maps = np.exp(-d2 / (2.0 * 1.5**2))
    maps += rng.uniform(0.0, 0.01, size=maps.shape)
    return maps.astype(np.float32)


def main():
    # Keep jax (pre-imported by the site hook targeting the axon TPU) off
    # the chip: this is a pure-CPU torch/numpy measurement.
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, harness.REPO)
    sys.path.insert(0, harness.REFERENCE)

    from helpers import make_ring_cameras  # repo tests/helpers

    from config import get_default_configs as ref_configs
    from pose_estimators.pose_resnet import PoseResNet as RefPoseResNet
    from strategy import ActiveLearningStrategy as RefStrategy
    from utils import evaluation as ref_evaluation
    from utils import triangulation as ref_triangulation

    random.seed(0)
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    cfg = ref_configs()
    cfg.DATA.NUM_JOINTS = NUM_JOINTS

    # The metric helpers only read self.al_cfg (and _compute_mpe calls
    # self._compute_mpes) — bypass the heavy constructor.
    class _MetricsOnly(RefStrategy):
        def __init__(self, al_cfg):
            self.al_cfg = al_cfg

    stub = _MetricsOnly(cfg)

    proj_np = make_ring_cameras(NUM_VIEWS, radius=300.0, img=IMG).astype(
        np.float64
    )
    proj_t = torch.from_numpy(proj_np)
    valid = torch.ones(NUM_JOINTS, dtype=torch.bool)

    frames = [
        torch.from_numpy(_trained_like_heatmaps(proj_np, rng))
        for _ in range(N_FRAMES_TRI)
    ]

    # --- torch-CPU forward, context only (1 frame = 31 crops) ------------
    model = RefPoseResNet(NUM_JOINTS, num_layers=50).eval()
    x = torch.from_numpy(
        rng.normal(size=(NUM_VIEWS, 3, IMG, IMG)).astype(np.float32)
    )
    with torch.no_grad():
        t0 = time.perf_counter()
        model(x)
        fwd_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        model(x)
        fwd_s = time.perf_counter() - t0
    sys.stderr.write(
        "forward (31 views, torch-CPU, this host): %.1f s cold, %.1f s warm "
        "— context only, excluded from the CPU bound\n" % (fwd_cold, fwd_s)
    )

    # --- triangulation + mkpe: the per-sample CPU work of the
    # TRIANGULATION strategy (strategy.py:1036-1065,1074-1075,1135-1137) --
    # The reference stores GT keypoints as [4, K] (x,y,z,conf rows;
    # compute_mkpe slices gt[:3, :] — /root/reference/utils/evaluation.py:202).
    gt = torch.from_numpy(
        rng.normal(0.0, 30.0, size=(4, NUM_JOINTS)).astype(np.float32)
    )
    tri_times = []
    for hm in frames:
        t0 = time.perf_counter()
        results = ref_triangulation.triangulation(
            hm, proj_t, STRIDE, valid, False, False, None
        )
        ref_evaluation.compute_mkpe(
            [torch.Tensor(results["keypoints_3d"])], [gt], [valid]
        )
        tri_times.append(time.perf_counter() - t0)
    tri_s = float(np.median(tri_times))

    # --- MPE / HP / BSB per-frame metric loops (strategy.py:1149-1215) ---
    metric_s = {}
    for name, fn in (
        ("MPE", RefStrategy._compute_mpe),
        ("HP", RefStrategy._compute_hp),
        ("BSB", RefStrategy._compute_bsb),
    ):
        times = []
        for hm in frames[:N_FRAMES_PEAKS]:
            t0 = time.perf_counter()
            fn(stub, hm, valid)
            times.append(time.perf_counter() - t0)
        metric_s[name] = float(np.median(times))

    out = {
        "host": "1-core container (the repo's own bench host)",
        "workload": "%d views x %d joints, %dx%d crops, stride %d"
        % (NUM_VIEWS, NUM_JOINTS, IMG, IMG, STRIDE),
        "forward_torch_cpu_s_per_frame": round(fwd_s, 3),
        "triangulation_cpu_s_per_frame": round(tri_s, 4),
        "metric_cpu_s_per_frame": {
            k: round(v, 4) for k, v in metric_s.items()
        },
        # Per-process ceilings with a FREE forward and FREE all_gathers:
        "fps_ceiling_triangulation": round(1.0 / tri_s, 2),
        "fps_ceiling_mpe": round(1.0 / (tri_s + metric_s["MPE"]), 2),
        "fps_ceiling_bsb": round(1.0 / (tri_s + metric_s["BSB"]), 2),
        "fps_this_host_incl_forward": round(1.0 / (tri_s + fwd_s), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
