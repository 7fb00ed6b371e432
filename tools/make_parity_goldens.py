"""Generate numerical-parity golden vectors by RUNNING the reference
implementation (/root/reference) on deterministic fixtures.

Outputs tests/fixtures/parity_goldens.npz, consumed by
tests/test_parity_goldens.py.  The reference code never ships with the
repo — only the golden numbers do; this script exists so the goldens are
reproducible (it requires the reference checkout + torch, which the build
environment has).

Covered chains (reference citations):
  * decode -> RANSAC -> DLT -> 3D keypoints + reprojection metric +
    inlier_count on the reference's own test fixture
    (tests/test_triangulation.py:15-70, utils/triangulation.py:168-338)
  * the same with outlier-corrupted views (exercises inlier selection)
  * reprojection cross-entropy metric (utils/triangulation.py:236-257)
  * HP / BSB / MPE uncertainty values incl. the implicit-dim softmax quirk
    (strategy.py:1149-1215) — peak_local_max is reproduced with a
    scipy.ndimage maximum-filter implementation of skimage's documented
    algorithm (no plateaus/ties in the fixtures by construction)
  * MKPE / 3D-PCK / 3D-PCKh metrics (utils/evaluation.py:121-208)
"""

import math
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "fixtures", "parity_goldens.npz")

# The fixture paths never call kornia (no soft-argmax) — stub it so the
# reference module imports without the dependency.
kornia_stub = types.ModuleType("kornia")
kornia_stub.geometry = types.SimpleNamespace(
    spatial_soft_argmax2d=lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("kornia stub called")
    )
)
sys.modules.setdefault("kornia", kornia_stub)

# utils/__init__.py pulls in colorlog/tqdm-logging; stub colorlog (absent
# here) — only the logger cosmetics use it.
colorlog_stub = types.ModuleType("colorlog")


class _Formatter:
    def __init__(self, *a, **k):
        pass

    def format(self, record):
        return str(record)


colorlog_stub.ColoredFormatter = _Formatter
sys.modules.setdefault("colorlog", colorlog_stub)
sys.path.insert(0, REFERENCE)

import torch  # noqa: E402
from scipy import ndimage  # noqa: E402

from utils import evaluation as ref_eval  # noqa: E402
from utils import triangulation as ref_tri  # noqa: E402

torch.manual_seed(0)

# _compute_xe calls .cuda() unconditionally (utils/triangulation.py:255);
# run it on CPU — the arithmetic is device-independent.
torch.Tensor.cuda = lambda self, *a, **k: self


def fixture_proj_matrices() -> torch.Tensor:
    """The 8 literal Panoptic projection matrices from the reference's own
    test (tests/test_triangulation.py:15-58)."""
    return torch.Tensor(
        [
            [
                [-3.4295e02, 6.8706e-01, 2.7159e02, 2.3787e04],
                [-4.6607e01, 4.3164e02, -2.0346e01, 7.8610e04],
                [-7.8969e-01, 1.1833e-01, -6.0199e-01, 2.9049e02],
            ],
            [
                [-3.3046e02, 6.6025e01, 4.2674e02, 3.2056e04],
                [2.5996e02, 4.6107e02, 1.6285e02, 9.8670e04],
                [-5.6597e-01, 7.5490e-01, -3.3136e-01, 3.7961e02],
            ],
            [
                [-4.5085e02, 2.6791e01, 1.0916e02, 2.2007e04],
                [5.7573e01, 4.2051e02, 1.9940e02, 8.7025e04],
                [-2.9529e-01, 6.2227e-01, -7.2497e-01, 3.6151e02],
            ],
            [
                [4.4427e02, 1.2182e02, 2.6364e02, 6.7640e04],
                [5.1922e01, 4.4883e02, -2.4331e02, 8.9032e04],
                [-2.5639e-01, 6.2335e-01, 7.3871e-01, 3.5767e02],
            ],
            [
                [-3.9666e02, 3.8124e01, -7.0161e01, 2.4880e04],
                [1.2124e01, 4.1112e02, 7.6234e01, 7.8864e04],
                [8.3997e-02, 4.5241e-01, -8.8784e-01, 3.3700e02],
            ],
            [
                [3.8276e02, 1.5859e02, -4.3537e02, 6.9321e04],
                [-3.1722e02, 4.7013e02, -1.2831e02, 7.6926e04],
                [6.2258e-01, 6.5737e-01, 4.2456e-01, 3.6126e02],
            ],
            [
                [-2.6491e02, 4.5420e01, -4.2691e02, 3.0369e04],
                [-2.0931e02, 4.2484e02, 1.5935e02, 7.6858e04],
                [5.7460e-01, 6.4258e-01, -5.0688e-01, 3.6323e02],
            ],
            [
                [-7.5390e01, 5.6447e01, 4.6836e02, 4.3622e04],
                [1.3967e01, 4.6652e02, -3.0601e01, 8.7342e04],
                [-9.7148e-01, 2.2094e-01, 8.6076e-02, 3.0445e02],
            ],
        ]
    )


def fixture_heatmaps(num_views=8, num_joints=19) -> torch.Tensor:
    """The reference test's hand-placed peak at (11, 11) with neighbors
    (tests/test_triangulation.py:60-69)."""
    h = torch.zeros([num_views, num_joints, 64, 64])
    h[:, :, 11, 11] = 1.0
    h[:, :, 10, 11] = 0.5
    h[:, :, 11, 10] = 0.5
    h[:, :, 11, 12] = 0.5
    h[:, :, 12, 11] = 0.5
    h[:, :, 12, 12] = 0.3
    h[:, :, 10, 10] = 0.3
    h[:, :, 10, 12] = 0.3
    h[:, :, 12, 10] = 0.3
    return h


def project(proj: np.ndarray, pts3d: np.ndarray) -> np.ndarray:
    homo = np.concatenate([pts3d, np.ones_like(pts3d[..., :1])], axis=-1)
    img = homo @ proj.T
    return img[..., :2] / img[..., 2:3]


def ransac_case(proj: torch.Tensor, stride: int = 8):
    """Distinct per-joint peaks from real 3D points; two views corrupted so
    RANSAC must reject them.  Returns (heatmaps, gt3d, corrupted_views)."""
    rng = np.random.default_rng(42)
    # Base point consistent with the rig: the fixture triangulates (11,11)*8
    # in all views; points near it stay in frame.
    base = ref_tri._triangulate_dlt(
        proj.numpy().astype(np.float64),
        np.tile(np.array([[11.0 * stride, 11.0 * stride]]), (8, 1)),
    )
    num_views, num_joints = proj.shape[0], 19
    gt3d = base[None, :] + rng.normal(scale=8.0, size=(num_joints, 3))
    heat = np.zeros((num_views, num_joints, 64, 64), np.float32)
    corrupted = [2, 5]
    for v in range(num_views):
        kp2d = project(proj[v].numpy().astype(np.float64), gt3d) / stride
        for k in range(num_joints):
            x, y = kp2d[k]
            xi, yi = int(round(x)), int(round(y))
            if v in corrupted:
                xi, yi = (xi + 9) % 60 + 2, (yi + 13) % 60 + 2
            assert 0 <= xi < 64 and 0 <= yi < 64, (v, k, xi, yi)
            heat[v, k, yi, xi] = 1.0
    return torch.from_numpy(heat), gt3d, corrupted


def peak_local_max(image: np.ndarray, min_distance: int, num_peaks=None):
    """skimage.feature.peak_local_max for tie-free images: local maxima of a
    (2*min_distance+1)^2 footprint, border-excluded by min_distance, sorted
    by descending intensity (strategy.py:1168-1170, 1206-1208 call it with
    exactly these arguments).  Fixtures are built with no plateaus so the
    plateau-handling corner of skimage never triggers."""
    size = 2 * min_distance + 1
    is_peak = image == ndimage.maximum_filter(image, size=size, mode="constant")
    is_peak &= image > image.min()
    mask = np.zeros_like(is_peak)
    mask[min_distance:-min_distance or None, min_distance:-min_distance or None] = True
    is_peak &= mask
    coords = np.argwhere(is_peak)
    order = np.argsort(-image[coords[:, 0], coords[:, 1]], kind="stable")
    coords = coords[order]
    if num_peaks is not None:
        coords = coords[:num_peaks]
    return coords


def uncertainty_heatmaps(num_views=3, num_joints=4, size=64) -> torch.Tensor:
    """Smooth multi-peak heatmaps with unique values (no ties)."""
    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[0:size, 0:size]
    out = np.zeros((num_views, num_joints, size, size), np.float64)
    for v in range(num_views):
        for k in range(num_joints):
            n_peaks = 2 + (v + k) % 3
            centers = rng.uniform(8, size - 8, size=(n_peaks, 2))
            amps = rng.uniform(0.4, 1.0, size=n_peaks)
            hm = np.zeros((size, size))
            for (cy, cx), a in zip(centers, amps):
                hm += a * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * 2.0**2))
            hm += rng.uniform(0, 1e-6, size=(size, size))  # break any ties
            out[v, k] = hm
    return torch.from_numpy(out.astype(np.float32))


def ref_mpes(heatmaps: torch.Tensor, joint_valid) -> list:
    """strategy.py:1160-1176, verbatim formula."""
    hm = heatmaps.cpu().numpy()
    num_views, num_kp = hm.shape[:2]
    ents = []
    for view in range(num_views):
        for kp in range(num_kp):
            if not joint_valid[kp]:
                continue
            coords = peak_local_max(hm[view][kp], min_distance=2)
            peaks = [hm[view][kp][c[0]][c[1]] for c in coords]
            probs = np.exp(peaks) / sum(np.exp(peaks))
            ents.append(sum(-p * math.log(p) for p in probs))
    return ents


def ref_hps(heatmaps: torch.Tensor, joint_valid) -> list:
    """strategy.py:1178-1193 incl. the implicit-dim softmax quirk."""
    num_views, num_kp = heatmaps.shape[:2]
    hps = []
    for view in range(num_views):
        for kp in range(num_kp):
            if not joint_valid[kp]:
                continue
            joint_hm = torch.nn.functional.softmax(heatmaps[view][kp], dim=1)
            hps.append((1 - torch.max(joint_hm)).item())
    return hps


def ref_bsbs(heatmaps: torch.Tensor, joint_valid) -> list:
    """strategy.py:1195-1215."""
    num_views, num_kp = heatmaps.shape[:2]
    bsbs = []
    for view in range(num_views):
        for kp in range(num_kp):
            if not joint_valid[kp]:
                continue
            joint_hm = (
                torch.nn.functional.softmax(heatmaps[view][kp], dim=1)
                .cpu()
                .numpy()
            )
            coords = peak_local_max(joint_hm, min_distance=2, num_peaks=2)
            probs = [joint_hm[c[0]][c[1]] for c in coords]
            bsbs.append(abs(probs[0] - probs[1]))
    return bsbs


def main():
    goldens = {}
    proj = fixture_proj_matrices()
    stride = 8
    valid = torch.ones([19]).bool()

    # --- reference fixture: decode -> RANSAC -> DLT ---
    heat = fixture_heatmaps()
    res = ref_tri.triangulation(heat, proj, stride, valid)
    goldens["fixture_heatmaps"] = heat.numpy()
    goldens["fixture_proj"] = proj.numpy()
    goldens["fixture_stride"] = np.array(stride)
    goldens["fixture_keypoints_3d"] = np.asarray(res["keypoints_3d"], np.float64)
    goldens["fixture_keypoints_2d"] = np.asarray(res["keypoints_2d"], np.float64)
    goldens["fixture_metric"] = np.float64(res["metric"])
    goldens["fixture_inlier_count"] = np.float64(res["inlier_count"])

    # --- the same chain with the XE metric ---
    res_xe = ref_tri.triangulation(
        heat, proj, stride, valid, use_reprojection_xe=True, sigma=1.0
    )
    goldens["fixture_xe_metric"] = np.float64(res_xe["metric"])

    # --- outlier-corrupted views: RANSAC must reject them ---
    rheat, gt3d, corrupted = ransac_case(proj, stride)
    rres = ref_tri.triangulation(rheat, proj, stride, valid)
    goldens["ransac_heatmaps"] = rheat.numpy()
    goldens["ransac_gt3d"] = gt3d
    goldens["ransac_corrupted_views"] = np.array(corrupted)
    goldens["ransac_keypoints_3d"] = np.asarray(rres["keypoints_3d"], np.float64)
    goldens["ransac_keypoints_2d"] = np.asarray(rres["keypoints_2d"], np.float64)
    goldens["ransac_metric"] = np.float64(rres["metric"])
    goldens["ransac_inlier_count"] = np.float64(rres["inlier_count"])

    # --- HP / BSB / MPE ---
    uheat = uncertainty_heatmaps()
    joint_valid = [True, True, False, True]
    goldens["unc_heatmaps"] = uheat.numpy()
    goldens["unc_joint_valid"] = np.array(joint_valid)
    mpes = ref_mpes(uheat, joint_valid)
    hps = ref_hps(uheat, joint_valid)
    bsbs = ref_bsbs(uheat, joint_valid)
    goldens["unc_mpe_values"] = np.asarray(mpes, np.float64)
    goldens["unc_mpe_avg"] = np.float64(sum(mpes) / len(mpes))
    goldens["unc_mpe_std"] = np.float64(np.std(np.array(mpes)))
    goldens["unc_hp_values"] = np.asarray(hps, np.float64)
    goldens["unc_hp_avg"] = np.float64(sum(hps) / len(hps))
    goldens["unc_hp_std"] = np.float64(np.std(np.array(hps)))
    goldens["unc_bsb_values"] = np.asarray(bsbs, np.float64)
    goldens["unc_bsb_avg"] = np.float64(sum(bsbs) / len(bsbs))
    goldens["unc_bsb_std"] = np.float64(np.std(np.array(bsbs)))

    # --- MKPE / 3D-PCK / 3D-PCKh ---
    rng = np.random.default_rng(3)
    N, K = 4, 19
    gt = rng.normal(scale=20.0, size=(N, 3, K))  # reference gt layout [N,3,K]
    pred = np.transpose(gt, (0, 2, 1)) + rng.normal(scale=2.0, size=(N, K, 3))
    jv = rng.random((N, K)) > 0.2
    jv[:, 0] = True  # keep every joint valid somewhere
    mkpe = ref_eval.compute_mkpe(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(jv.astype(np.int64))
    )
    _, pcks = ref_eval.compute_3d_pck_figure(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(jv), K
    )
    _, pckhs = ref_eval.compute_3d_pckh_figure(
        torch.from_numpy(pred), torch.from_numpy(gt), K
    )
    goldens["metrics_pred"] = pred
    goldens["metrics_gt"] = gt
    goldens["metrics_joint_valid"] = jv
    goldens["metrics_mkpe"] = np.float64(mkpe.item())
    goldens["metrics_pcks"] = np.asarray(pcks, np.float64)
    goldens["metrics_pckhs"] = np.asarray(pckhs, np.float64)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **goldens)
    print("wrote %s (%d arrays)" % (OUT, len(goldens)))
    print("fixture inliers=%s metric=%.6f" % (res["inlier_count"], res["metric"]))
    print("ransac inliers=%s metric=%.6f" % (rres["inlier_count"], rres["metric"]))
    print("mkpe=%.6f" % mkpe.item())


if __name__ == "__main__":
    main()
