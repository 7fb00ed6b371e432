"""Shared synthetic-geometry fixtures for tests."""

import numpy as np

from multi_view_active_learning_tpu.ops import geometry


def golden_fill_values(names, shapes, seed):
    """Deterministic synthetic weights for the model-forward parity goldens.

    Both tools/make_model_goldens.py (which loads them into the REFERENCE
    torch models) and tests/test_model_forward_parity.py (which feeds them
    through models/convert.py into the Flax models) regenerate the same
    {torch state_dict name: array} from this one function, so the golden
    .npz only needs to store names/shapes/outputs — not 100+ MB of weights.

    Scaling keeps eval-mode activations O(1) through 50+ conv/BN layers:
    conv weights ~ N(0, 1/sqrt(fan_in)), BN scale ~ U(0.8, 1.2), BN
    running_var ~ U(0.5, 1.5).
    """
    rng = np.random.default_rng(seed)
    out = {}
    for name, shape in zip(names, shapes):
        shape = tuple(int(s) for s in shape)
        if name.endswith("running_var"):
            arr = rng.uniform(0.5, 1.5, size=shape)
        elif name.endswith("running_mean"):
            arr = rng.normal(0.0, 0.1, size=shape)
        elif name.endswith("bias"):
            arr = rng.normal(0.0, 0.05, size=shape)
        elif len(shape) == 1:  # BN weight
            arr = rng.uniform(0.8, 1.2, size=shape)
        else:  # conv / deconv weight
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0.0, 1.0 / np.sqrt(fan_in), size=shape)
        out[name] = arr.astype(np.float32)
    return out


def make_ring_cameras(num_views, radius=300.0, img=256, focal=260.0, jitter=0.1):
    """Cameras on a ring looking at the origin; returns [V, 3, 4] projections."""
    projs = []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views + jitter
        pos = np.array(
            [radius * np.cos(ang), 50.0 + 10 * np.sin(3 * ang), radius * np.sin(ang)]
        )
        z = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ pos
        K = np.array([[focal, 0, img / 2], [0, focal, img / 2], [0, 0, 1.0]])
        projs.append(geometry.Camera(R, t, K).projection)
    return np.stack(projs).astype(np.float32)


def render_peak_heatmaps(grid_xy, num_views, num_joints, hm_size):
    """One-hot peak heatmaps [V, hm, hm, K] from integer grid coords
    grid_xy [V, K, 2]."""
    heatmaps = np.zeros((num_views, hm_size, hm_size, num_joints), np.float32)
    for v in range(num_views):
        for k in range(num_joints):
            x, y = grid_xy[v, k]
            heatmaps[v, y, x, k] = 1.0
    return heatmaps


def synthetic_multiview_problem(
    batch=2, num_views=8, num_joints=19, hm_size=64, stride=4, seed=0
):
    """Random 3D points observed by a camera ring, rendered as grid-snapped
    peak heatmaps.  Returns (heatmaps [B,V,h,w,K], proj [B,V,3,4],
    pts3d [B,K,3], grid [B,V,K,2])."""
    rng = np.random.default_rng(seed)
    proj = np.broadcast_to(
        make_ring_cameras(num_views), (batch, num_views, 3, 4)
    ).astype(np.float32)
    pts3d = rng.normal(scale=30.0, size=(batch, num_joints, 3))
    kp2d = np.stack(
        [
            geometry.project_points_np(proj[b, v], pts3d[b])
            for b in range(batch)
            for v in range(num_views)
        ]
    ).reshape(batch, num_views, num_joints, 2)
    grid = np.round(kp2d / stride).astype(int)
    assert (grid >= 0).all() and (grid < hm_size).all()
    heatmaps = np.stack(
        [render_peak_heatmaps(grid[b], num_views, num_joints, hm_size) for b in range(batch)]
    )
    return heatmaps, proj, pts3d, grid
