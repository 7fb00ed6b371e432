"""Batched RANSAC-DLT triangulation, fully on device.

The reference triangulates with nested Python loops — per frame, per joint,
per RANSAC view-pair — calling numpy SVD each time and bouncing heatmaps
GPU->CPU (reference: utils/triangulation.py:168-338, driven from
strategy.py:1004-1147).  That loop is the dominant cost of an AL scoring
pass.

TPU-native redesign (no dynamic shapes anywhere):
  * The RANSAC pair set is a *static* [P, 2] array of view-index pairs
    (all C(V, 2) combinations by default; optionally a seeded subset to
    mirror the reference's shuffle-truncate at utils/triangulation.py:279-282).
  * Every pair is triangulated at once: DLT row vectors are built for all
    views in one einsum, pair systems are 4x4, and the null vector comes
    from closed-form adjugate inverse iteration on A^T A (method="power",
    the default — see _null_vector_power), with eigh/SVD parity paths.
  * Inlier sets are boolean masks [P, V]; "largest inlier set wins, first on
    ties" is an argmax — identical selection semantics to the reference's
    strictly-greater update over combination order
    (utils/triangulation.py:293-307).
  * The final re-triangulation over the winning inlier set is a masked DLT:
    a zero row contributes nothing to A^T A, so masking rows is exactly
    equivalent to removing them.
  * vmap over joints and frames; shard over the ('data',) mesh axis upstream.

Everything is float32.  For Panoptic-scale projection matrices (entries up
to ~1e5) the normal-equations paths square the conditioning; measured
against float64 SVD ground truth the "power" solver is as accurate as
eigh/svd on realistic rigs (see BENCH_NOTES.md), and `svd` remains the
fallback when bit-level agreement with float64 references matters
(see TPUConfig.DLT_METHOD).
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry, heatmap


def all_view_pairs(num_views: int, n_iters: int = -1, seed: int = 0) -> np.ndarray:
    """Static RANSAC pair set: all C(V, 2) pairs in combination order.

    When 0 < n_iters < C(V, 2), a seeded permutation picks n_iters pairs,
    mirroring the reference's shuffle-truncate (utils/triangulation.py:279-282)
    but deterministically.
    """
    pairs = np.array(list(itertools.combinations(range(num_views), 2)), dtype=np.int32)
    if 0 < n_iters < len(pairs):
        rng = np.random.default_rng(seed)
        pairs = pairs[rng.permutation(len(pairs))[:n_iters]]
    return pairs


def _dlt_rows(proj: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Build DLT rows for all views at once.

    proj: [V, 3, 4]; points: [V, 2] -> rows [V, 2, 4] where
    rows[v, 0] = x_v * P_v[2] - P_v[0], rows[v, 1] = y_v * P_v[2] - P_v[1]
    (reference: utils/triangulation.py:341-368).
    """
    ax = points[:, 0:1] * proj[:, 2, :] - proj[:, 0, :]  # [V, 4]
    ay = points[:, 1:2] * proj[:, 2, :] - proj[:, 1, :]
    return jnp.stack([ax, ay], axis=1)  # [V, 2, 4]


def _det3(m) -> jnp.ndarray:
    """Determinant of [..., 3, 3]."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def _adjugate4(M: jnp.ndarray) -> jnp.ndarray:
    """Adjugate of [..., 4, 4]: adj(M) = det(M) * inv(M), in closed form
    (16 3x3 cofactors — pure elementwise math, no linalg)."""
    idx = (0, 1, 2, 3)
    cof_rows = []
    for i in idx:
        rows = [r for r in idx if r != i]
        cof_row = []
        for j in idx:
            cols = [c for c in idx if c != j]
            minor = M[..., rows, :][..., :, cols]
            cof_row.append(((-1.0) ** (i + j)) * _det3(minor))
        cof_rows.append(jnp.stack(cof_row, axis=-1))
    cof = jnp.stack(cof_rows, axis=-2)  # [..., 4, 4] cofactor matrix
    return jnp.swapaxes(cof, -2, -1)


def _null_vector_power(M: jnp.ndarray) -> jnp.ndarray:
    """Smallest eigenvector of a PSD [..., 4, 4] via adjugate inverse
    iteration — the TPU-fast replacement for batched tiny eigh/svd (whose
    QDWH/Jacobi lowering costs ~200 ms per 35k-matrix batch on a v5e and
    dominates scoring).

    adj(M) = det(M) inv(M) shares eigenvectors with M with eigenvalues
    det/lambda_i, so its dominant eigenvector IS M's smallest; each multiply
    contracts by lambda_min/lambda_next regardless of the (huge) spread at
    the top of DLT normal-matrix spectra.  For exactly-singular M (noise-free
    pair systems) adj is rank-1 on the null space: one multiply is exact.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(M), axis=(-2, -1), keepdims=True), 1e-30)
    Mn = M / scale
    # Ridge keeps adj nonzero for rank<=2 degeneracies (coincident views).
    # 1e-6 of the normalized scale: resolvable in float32, and for genuine
    # near-null systems (lambda_min << 1e-6 * lambda_max) it leaves the
    # dominant adj eigen-gap intact.
    Mn = Mn + 1e-6 * jnp.eye(4, dtype=M.dtype)
    adj = _adjugate4(Mn)
    v = jnp.full(M.shape[:-2] + (4,), 0.5, M.dtype)
    for _ in range(3):
        v = jnp.einsum("...ij,...j->...i", adj, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def _gram(A: jnp.ndarray) -> jnp.ndarray:
    """A^T A for [..., R, 4] -> [..., 4, 4], as an elementwise
    multiply+reduce rather than an einsum/dot_general.

    The contraction dims (R<=2V rows, 4 cols) are tiny, so XLA's MXU
    lowering of the batched dot_general tiles catastrophically: in the
    int8 headline trace the [B, J, 465-pair, 4, 4] Gram ran 515 us/step
    at ~0 TFLOP/s and 9 GB/s — 3.7% of device time doing nothing — plus
    two layout copies feeding the MXU operand format (BENCH_NOTES round
    5).  The broadcast-multiply-reduce form lowers to a VPU loop fusion
    with no relayouts.  f32 accumulation regardless of A's dtype (same
    as dot_general's f32 accumulator for bf16 operands)."""
    Af = A.astype(jnp.float32)
    return jnp.sum(Af[..., :, :, None] * Af[..., :, None, :], axis=-3)


def _null_vector(A: jnp.ndarray, method: str) -> jnp.ndarray:
    """Smallest right-singular vector of A: [..., R, 4] -> [..., 4]."""
    if method == "eigh":
        M = _gram(A)  # A^T A, [..., 4, 4]
        _, vecs = jnp.linalg.eigh(M)  # ascending eigenvalues
        return vecs[..., :, 0]
    elif method == "power":
        M = _gram(A)
        return _null_vector_power(M)
    elif method == "svd":
        _, _, vh = jnp.linalg.svd(A, full_matrices=False)
        return vh[..., 3, :]
    raise ValueError("Unknown DLT method: %s" % method)


def dlt_triangulate(
    proj: jnp.ndarray,
    points: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    method: str = "power",
) -> jnp.ndarray:
    """Weighted/masked DLT for one 3D point from V views.

    proj: [V, 3, 4]; points: [V, 2]; weights: [V] (None = all ones).
    Masking a view with weight 0 zeroes its rows — exactly equivalent to
    dropping it from the system.  Returns [3].
    """
    rows = _dlt_rows(proj, points)  # [V, 2, 4]
    if weights is not None:
        rows = rows * weights[:, None, None]
    A = rows.reshape(-1, 4)  # [2V, 4]
    h = _null_vector(A, method)
    return geometry.homogeneous_to_euclidean(h[None, :])[0]


def _solve3(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the 3x3 system H x = b in closed form (Cramer via cofactors —
    no batched linalg, so it stays cheap under vmap on TPU)."""
    det = _det3(H)
    # Cramer: x_j = det(H with column j replaced by b) / det(H).
    cols = [_det3(H.at[..., :, j].set(b)) for j in range(3)]
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack(cols, axis=-1) / det[..., None]


def _huber_refine(
    x0: jnp.ndarray,
    proj: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    n_iters: int,
) -> jnp.ndarray:
    """Direct reprojection-error minimization with a Huber loss — the
    TPU-native equivalent of the reference's optional refinement stage
    (utils/triangulation.py:319-337: `scipy.optimize.least_squares(
    residual, x0, loss="huber", method="trf")` over the inlier views'
    half-L2 reprojection errors).

    scipy's trf is a dynamic trust-region loop; a compiled fixed-shape
    program wants a fixed iteration count, so this is Levenberg-Marquardt
    with IRLS Huber weights and per-step accept/reject damping — the same
    stationary point (the problem is 3-parameter and locally convex around
    the DLT init), reached in a static number of steps.  Matches scipy's
    cost C(x) = 1/2 sum_v rho(r_v^2) with rho(z) = z for z <= 1 else
    2 sqrt(z) - 1 (f_scale = 1, scipy's default), r_v the half-L2 error of
    inlier view v.  Agreement with scipy is pinned by
    tests/test_triangulation.py::test_direct_optimization_matches_scipy.

    x0: [3] DLT solution; proj: [V, 3, 4]; points: [V, 2];
    mask: [V] 1.0 for inlier views.  Returns the refined [3].
    """
    eps = 1e-12

    def residuals_2d(x):
        # Full 2D residual per view, e_v = proj_v(x) - obs_v: GN on these
        # keeps the 2x3 per-view Jacobian structure (a scalar-norm residual
        # formulation collapses it to rank 1 and crawls along the lost
        # direction — measured: 3x the iterations to the same optimum).
        return geometry.project_points(proj, x[None, None, :])[:, 0, :] - points

    def cost(x):
        # scipy's objective: C = 1/2 sum_v rho(r_v^2), r_v = 0.5 ||e_v||.
        z = 0.25 * jnp.sum(jnp.square(residuals_2d(x)), axis=-1)
        rho = jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(jnp.maximum(z, eps)) - 1.0)
        return 0.5 * jnp.sum(rho * mask)

    jac = jax.jacfwd(residuals_2d)  # [V, 2, 3]

    def step(carry, _):
        x, lam = carry
        e = residuals_2d(x)  # [V, 2]
        J = jac(x)  # [V, 2, 3]
        # IRLS weight rho'(z) at z = r^2: 1 in the quadratic zone, 1/r
        # beyond the Huber knee — masked to the inlier set.  (dC/dx =
        # 1/4 sum rho' J_v^T e_v; the common 1/4 cancels between H and g.)
        z = 0.25 * jnp.sum(jnp.square(e), axis=-1)
        w = jnp.where(z <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(z, eps)))
        w = w * mask  # [V]
        g = jnp.einsum("vri,vr->i", J, e * w[:, None])  # [3]
        H = jnp.einsum("vri,vrj,v->ij", J, J, w)  # [3, 3]
        # Damping scaled by the mean diagonal so lambda is unit-free
        # (projection matrices span ~1e5 across rigs).
        diag_scale = jnp.maximum(jnp.trace(H) / 3.0, eps)
        delta = _solve3(H + lam * diag_scale * jnp.eye(3, dtype=H.dtype), -g)
        x_new = x + delta
        better = cost(x_new) < cost(x)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, lam * 0.1, lam * 10.0)
        return (x, lam), None

    (x, _), _ = jax.lax.scan(
        step, (x0, jnp.asarray(1e-3, x0.dtype)), None, length=n_iters
    )
    return x


def _ransac_single_joint(
    proj: jnp.ndarray,
    points: jnp.ndarray,
    pairs: jnp.ndarray,
    epsilon: float,
    method: str,
    confidence: Optional[jnp.ndarray] = None,
    direct_optimization: bool = False,
    direct_opt_iters: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape RANSAC for one joint.

    proj: [V, 3, 4]; points: [V, 2]; pairs: [P, 2] static view indices.
    Returns (keypoint_3d [3], mean inlier reprojection error [], inlier
    count []).  Selection semantics match reference
    utils/triangulation.py:284-316: sampled views always count as inliers,
    largest set wins, first (in pair order) wins ties, final estimate and
    error are recomputed on the winning set.

    `confidence` [V] (optional, beyond-reference): weighted-least-squares
    refit — rows scaled by sqrt(conf) so residuals are weighted by each
    view's heatmap peak confidence.  Inlier selection and the reported
    error/count are unaffected.

    `direct_optimization` (reference: utils/triangulation.py:178,319-337):
    Huber-robust direct minimization of the inlier reprojection errors from
    the DLT solution (`_huber_refine`); the reported mean error is then the
    refined point's, exactly as the reference recomputes it post-refinement
    (utils/triangulation.py:332-336).
    """
    num_views = proj.shape[0]
    rows = _dlt_rows(proj, points)  # [V, 2, 4]

    # --- hypothesis stage: triangulate every pair at once -------------------
    pair_rows = rows[pairs]  # [P, 2, 2, 4]
    A_pairs = pair_rows.reshape(pairs.shape[0], 4, 4)
    h = _null_vector(A_pairs, method)  # [P, 4]
    x_pairs = geometry.homogeneous_to_euclidean(h)  # [P, 3]

    # --- scoring stage: reproject every hypothesis into every view ----------
    err = geometry.reprojection_error(
        x_pairs[:, None, :], points[None, :, None, :], proj[None]
    )[..., 0]  # [P, V]
    sampled = (
        jax.nn.one_hot(pairs[:, 0], num_views, dtype=jnp.bool_)
        | jax.nn.one_hot(pairs[:, 1], num_views, dtype=jnp.bool_)
    )  # [P, V]
    inliers = (err < epsilon) | sampled  # [P, V]
    counts = jnp.sum(inliers, axis=-1)  # [P]
    best = jnp.argmax(counts)  # first max == reference tie-break
    best_mask = inliers[best].astype(jnp.float32)  # [V]

    # --- refit stage: masked DLT over the winning inlier set ----------------
    refit_w = best_mask
    if confidence is not None:
        refit_w = best_mask * jnp.sqrt(jnp.maximum(confidence, 1e-3))
    keypoint_3d = dlt_triangulate(proj, points, weights=refit_w, method=method)
    if direct_optimization:
        keypoint_3d = _huber_refine(
            keypoint_3d, proj, points, best_mask, direct_opt_iters
        )
    final_err = geometry.reprojection_error(
        keypoint_3d[None, :], points[:, None, :], proj
    )[..., 0]  # [V]
    inlier_total = jnp.sum(best_mask)
    mean_err = jnp.sum(final_err * best_mask) / inlier_total
    return keypoint_3d, mean_err, inlier_total


@partial(
    jax.jit,
    static_argnames=(
        "stride",
        "use_soft_argmax",
        "use_reprojection_xe",
        "sigma",
        "epsilon",
        "method",
        "use_pallas",
        "confidence_weighted",
        "direct_optimization",
        "direct_opt_iters",
    ),
)
def triangulate_frames(
    heatmaps: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    valid_joints: jnp.ndarray,
    pairs: jnp.ndarray,
    stride: int = 4,
    use_soft_argmax: bool = False,
    use_reprojection_xe: bool = False,
    sigma: float = 1.0,
    epsilon: float = 5.0,
    method: str = "power",
    use_pallas: bool = False,
    confidence_weighted: bool = False,
    direct_optimization: bool = False,
    direct_opt_iters: int = 32,
) -> Dict[str, jnp.ndarray]:
    """Triangulate a whole batch of multi-view frames in one compiled call.

    Args:
      heatmaps: [B, V, h, w, K] (NHWC per view — the model's native layout).
      proj_matrices: [B, V, 3, 4].
      valid_joints: [B, K] bool.
      pairs: [P, 2] static RANSAC pair set from `all_view_pairs`.
      stride: heatmap-to-image stride.

    Returns dict with:
      keypoints_3d: [B, K, 3] (zeros at invalid joints),
      keypoints_2d: [B, V, K, 2] image-space decodes,
      metric: [B] mean reprojection error over valid joints, or the
        reprojection-XE score when use_reprojection_xe,
      inlier_count: [B] min inlier count over valid joints,
      per_joint_error: [B, K], per_joint_inliers: [B, K].

    Reference contract: utils/triangulation.py:168-233.
    """
    B, V, h, w, K = heatmaps.shape
    hm_vk = jnp.moveaxis(heatmaps, -1, 2)  # [B, V, K, h, w]
    peaks = None
    if use_pallas:
        from .pallas import decode as pallas_decode

        if confidence_weighted:
            # The kernel computes the peak anyway; take it here instead of
            # a second full-heatmap argmax pass (a separate decode cannot
            # be CSE'd with the Pallas call).
            keypoints_2d, peaks = pallas_decode.decode_keypoints_pallas(
                hm_vk, float(stride), valid_joints[:, None, :],
                use_soft_argmax, with_peak=True,
            )
        else:
            keypoints_2d = pallas_decode.decode_keypoints_pallas(
                hm_vk, float(stride), valid_joints[:, None, :], use_soft_argmax
            )
    else:
        keypoints_2d = heatmap.decode_keypoints(
            hm_vk, float(stride), valid_joints[:, None, :], use_soft_argmax
        )  # [B, V, K, 2]

    points_kv = jnp.swapaxes(keypoints_2d, 1, 2)  # [B, K, V, 2]
    if confidence_weighted:
        # Per-view heatmap peak as WLS weight, normalized per joint so the
        # weighting is scale-invariant across joints/frames.
        if peaks is None:
            # XLA CSEs this with decode_keypoints' argmax on the same input.
            _, peaks = heatmap.decode_argmax(hm_vk)  # [B, V, K]
        conf = jnp.swapaxes(peaks, 1, 2)  # [B, K, V]
        conf = conf / jnp.maximum(jnp.max(conf, axis=-1, keepdims=True), 1e-6)
        per_joint = jax.vmap(
            jax.vmap(
                lambda pts, pr, cf: _ransac_single_joint(
                    pr, pts, pairs, epsilon, method, confidence=cf,
                    direct_optimization=direct_optimization,
                    direct_opt_iters=direct_opt_iters,
                ),
                in_axes=(0, None, 0),
            ),
            in_axes=(0, 0, 0),
        )
        kp3d, err, inlier = per_joint(points_kv, proj_matrices, conf)
    else:
        per_joint = jax.vmap(  # over batch
            jax.vmap(  # over joints
                lambda pts, pr: _ransac_single_joint(
                    pr, pts, pairs, epsilon, method,
                    direct_optimization=direct_optimization,
                    direct_opt_iters=direct_opt_iters,
                ),
                in_axes=(0, None),
            ),
            in_axes=(0, 0),
        )
        kp3d, err, inlier = per_joint(points_kv, proj_matrices)
    # kp3d: [B, K, 3]; err, inlier: [B, K]

    validf = valid_joints.astype(jnp.float32)
    kp3d = kp3d * validf[..., None]
    n_valid = jnp.maximum(jnp.sum(validf, axis=-1), 1.0)
    mean_err = jnp.sum(jnp.where(valid_joints, err, 0.0), axis=-1) / n_valid
    inlier_count = jnp.min(
        jnp.where(valid_joints, inlier, jnp.float32(V + 1)), axis=-1
    )

    if use_reprojection_xe:
        metric = reprojection_xe(kp3d, proj_matrices, heatmaps, sigma)
    else:
        metric = mean_err

    return {
        "keypoints_3d": kp3d,
        "keypoints_2d": keypoints_2d,
        "metric": metric,
        "inlier_count": inlier_count,
        "per_joint_error": err,
        "per_joint_inliers": inlier,
    }


def reprojection_xe(
    keypoints_3d: jnp.ndarray,
    proj_matrices: jnp.ndarray,
    heatmaps: jnp.ndarray,
    sigma: float,
) -> jnp.ndarray:
    """Reprojection cross-entropy-style metric: MSE between predicted
    heatmaps and Gaussians re-rendered at the reprojected 2D keypoints,
    summed over views and joints (reference: utils/triangulation.py:236-257).

    keypoints_3d: [B, K, 3]; proj_matrices: [B, V, 3, 4];
    heatmaps: [B, V, h, w, K] -> [B].

    Quirk replicated: like the reference, the reprojected keypoints are in
    *image* coordinates while the Gaussian grid is heatmap-sized — there is
    no stride division (reference renders the grid at (h, w) but centers it
    at full-resolution coordinates).  The metric is OFF by default
    (config.py:50) and kept bit-compatible.
    """
    B, V, h, w, K = heatmaps.shape
    kp2d = geometry.project_points(
        proj_matrices, keypoints_3d[:, None, :, :]
    )  # [B, V, K, 2]
    gauss = heatmap.render_gaussian_heatmaps(kp2d, h, w, sigma)  # [B, V, K, h, w]
    pred = jnp.moveaxis(heatmaps, -1, 2)  # [B, V, K, h, w]
    sq = jnp.square(pred - gauss)
    return jnp.sum(sq, axis=(1, 2, 3, 4)) / (h * w)
