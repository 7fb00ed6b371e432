"""Pin the jitted uncertainty/decode primitives to the third-party
semantics the reference depends on, via the line-faithful oracle ports in
tests/oracle_ports.py (skimage 0.19.3 peak_local_max, kornia 0.6
spatial_soft_argmax2d — neither library is installable in this image).

Two layers of evidence:
  1. primitive level — ops/uncertainty.local_peak_mask vs the oracle
     peak_local_max on random, plateau-heavy, and quantized images
     (plateau thinning is where naive max-filter emulations diverge);
     ops/heatmap.soft_argmax vs the torch kornia port.
  2. metric level — multi_peak_entropy / highest_probability /
     best_vs_second_best vs straight re-executions of the reference's
     per-(view, joint) loops (strategy.py:1149-1215) built on the oracle.

tests/test_sal_parity.py closes the loop end to end: the goldens there
were produced by the REFERENCE running against these same oracle ports.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from oracle_ports import peak_local_max, spatial_soft_argmax2d
from multi_view_active_learning_tpu.ops import heatmap as heatmap_ops
from multi_view_active_learning_tpu.ops import uncertainty

H, W = 24, 32  # one static shape -> one compile per min_distance


def _image_suite(rng, n_random=8, n_plateau=8, n_quant=8):
    """Random floats, few-level plateau fields, and quantized blob maps
    (int8-style quantization is exactly what creates plateau ties)."""
    imgs = [rng.random((H, W), dtype=np.float32) for _ in range(n_random)]
    for _ in range(n_plateau):
        imgs.append(rng.integers(0, 4, (H, W)).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(n_quant):
        img = np.zeros((H, W), np.float32)
        for _ in range(int(rng.integers(1, 5))):
            cy, cx = rng.integers(0, H), rng.integers(0, W)
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
        imgs.append(np.round(img * 8) / 8)
    # Hand-built worst cases: adjacent ties, an L-shaped plateau, a ridge.
    tie = np.zeros((H, W), np.float32)
    tie[5, 5] = tie[5, 6] = 1.0  # adjacent equal pair
    tie[10, 10] = tie[12, 12] = 0.5  # diagonal pair at distance 2
    imgs.append(tie)
    ell = np.zeros((H, W), np.float32)
    ell[8, 8:12] = 1.0
    ell[9:12, 8] = 1.0  # L-shaped plateau
    imgs.append(ell)
    ridge = np.zeros((H, W), np.float32)
    ridge[6, 4:20] = 2.0  # long flat ridge
    imgs.append(ridge)
    return np.stack(imgs)


@pytest.mark.parametrize("min_distance", [1, 2, 3])
def test_local_peak_mask_matches_skimage_oracle(min_distance):
    rng = np.random.default_rng(min_distance)
    imgs = _image_suite(rng)
    got = np.asarray(
        uncertainty.local_peak_mask(jnp.asarray(imgs), min_distance)
    )
    for i, img in enumerate(imgs):
        coords = peak_local_max(img, min_distance=min_distance, indices=True)
        want = np.zeros((H, W), bool)
        for r, c in coords:
            want[r, c] = True
        np.testing.assert_array_equal(
            got[i], want, err_msg="image %d min_distance %d" % (i, min_distance)
        )


def test_local_peak_mask_flat_image_has_no_peaks():
    flat = jnp.full((1, H, W), 3.25)
    assert not np.asarray(uncertainty.local_peak_mask(flat, 2)).any()
    assert peak_local_max(np.full((H, W), 3.25), min_distance=2).size == 0


def test_soft_argmax_matches_kornia_oracle():
    import torch

    rng = np.random.default_rng(7)
    hm = rng.standard_normal((2, 5, 16, 16)).astype(np.float32) * 3.0
    want = (
        spatial_soft_argmax2d(
            torch.from_numpy(hm), normalized_coordinates=False
        )
        .numpy()
    )
    got = np.asarray(heatmap_ops.soft_argmax(jnp.asarray(hm), stride=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # And the reference's usage scales by the model stride
    # (utils/triangulation.py:192-199).
    got4 = np.asarray(heatmap_ops.soft_argmax(jnp.asarray(hm), stride=4.0))
    np.testing.assert_allclose(got4, want * 4.0, rtol=1e-4, atol=1e-4)


# ---- reference metric loops re-executed on the oracle --------------------


def _ref_mpe(heatmaps_vk, joint_valid, aggregate):
    """strategy.py:1149-1176 verbatim semantics (numpy)."""
    import math

    ents = []
    V, K = heatmaps_vk.shape[:2]
    for v in range(V):
        for k in range(K):
            if not joint_valid[k]:
                continue
            coords = peak_local_max(
                heatmaps_vk[v][k], min_distance=2, indices=True
            )
            peaks = [heatmaps_vk[v][k][c[0]][c[1]] for c in coords]
            probs = np.exp(peaks) / sum(np.exp(peaks))
            ents.append(sum(-p * math.log(p) for p in probs))
    return (
        sum(ents) / len(ents) if aggregate == "AVG" else float(np.std(ents))
    )


def _row_softmax_np(m):
    """torch F.softmax(x) on 2D resolves to dim=1 — per-row softmax."""
    e = np.exp(m - m.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _ref_hp(heatmaps_vk, joint_valid, aggregate):
    """strategy.py:1178-1193 verbatim semantics (numpy)."""
    hps = []
    V, K = heatmaps_vk.shape[:2]
    for v in range(V):
        for k in range(K):
            if not joint_valid[k]:
                continue
            sm = _row_softmax_np(heatmaps_vk[v][k])
            hps.append(1.0 - sm.max())
    return sum(hps) / len(hps) if aggregate == "AVG" else float(np.std(hps))


def _ref_bsb(heatmaps_vk, joint_valid, aggregate):
    """strategy.py:1195-1215 verbatim semantics (numpy)."""
    bsbs = []
    V, K = heatmaps_vk.shape[:2]
    for v in range(V):
        for k in range(K):
            if not joint_valid[k]:
                continue
            sm = _row_softmax_np(heatmaps_vk[v][k])
            coords = peak_local_max(
                sm, min_distance=2, indices=True, num_peaks=2
            )
            assert len(coords) >= 2, "degenerate map in test generator"
            probs = [sm[c[0], c[1]] for c in coords]
            bsbs.append(abs(probs[0] - probs[1]))
    return sum(bsbs) / len(bsbs) if aggregate == "AVG" else float(np.std(bsbs))


@pytest.fixture(scope="module")
def metric_inputs():
    rng = np.random.default_rng(11)
    B, V, K = 2, 3, 4
    hm = rng.standard_normal((B, V, 16, 16, K)).astype(np.float32)
    # Quantize one frame's maps so MPE/BSB cross the plateau-thinning path.
    hm[1] = np.round(hm[1] * 4) / 4
    valid = np.ones((B, K), bool)
    valid[0, 2] = False  # exercise the joint_valid skip
    return hm, valid


@pytest.mark.parametrize("aggregate", ["AVG", "STD"])
def test_mpe_matches_reference_loop(metric_inputs, aggregate):
    hm, valid = metric_inputs
    got = np.asarray(
        uncertainty.multi_peak_entropy(
            jnp.asarray(hm), jnp.asarray(valid), aggregate
        )
    )
    for b in range(hm.shape[0]):
        want = _ref_mpe(np.moveaxis(hm[b], -1, 1), valid[b], aggregate)
        assert got[b] == pytest.approx(want, rel=1e-4, abs=1e-5), b


@pytest.mark.parametrize("aggregate", ["AVG", "STD"])
def test_hp_matches_reference_loop(metric_inputs, aggregate):
    hm, valid = metric_inputs
    got = np.asarray(
        uncertainty.highest_probability(
            jnp.asarray(hm), jnp.asarray(valid), aggregate
        )
    )
    for b in range(hm.shape[0]):
        want = _ref_hp(np.moveaxis(hm[b], -1, 1), valid[b], aggregate)
        assert got[b] == pytest.approx(want, rel=1e-4, abs=1e-5), b


@pytest.mark.parametrize("aggregate", ["AVG", "STD"])
def test_bsb_matches_reference_loop(metric_inputs, aggregate):
    hm, valid = metric_inputs
    got = np.asarray(
        uncertainty.best_vs_second_best(
            jnp.asarray(hm), jnp.asarray(valid), aggregate
        )
    )
    for b in range(hm.shape[0]):
        want = _ref_bsb(np.moveaxis(hm[b], -1, 1), valid[b], aggregate)
        assert got[b] == pytest.approx(want, rel=1e-4, abs=1e-5), b
