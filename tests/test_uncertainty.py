"""Uncertainty metrics vs hand-computed references
(reference: strategy.py:1149-1215)."""

import numpy as np
import jax.numpy as jnp

from multi_view_active_learning_tpu.ops import uncertainty


def _f(x):
    """Scalar from a [B]-shaped device array (B == 1 in these tests)."""
    import numpy as _np
    return float(_np.asarray(x).reshape(-1)[0])


def _softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def test_local_peak_mask_finds_separated_peaks():
    hm = np.zeros((16, 16), np.float32)
    hm[4, 4] = 1.0
    hm[10, 12] = 0.8
    mask = np.asarray(uncertainty.local_peak_mask(jnp.array(hm)))
    assert mask[4, 4] and mask[10, 12]
    assert mask.sum() == 2


def test_local_peak_mask_excludes_border_and_dominated():
    hm = np.zeros((16, 16), np.float32)
    hm[0, 5] = 1.0  # on border -> excluded (skimage exclude_border default)
    hm[8, 8] = 1.0
    hm[8, 9] = 0.9  # within min_distance of a larger peak -> not a peak
    mask = np.asarray(uncertainty.local_peak_mask(jnp.array(hm)))
    assert not mask[0, 5]
    assert mask[8, 8] and not mask[8, 9]
    assert mask.sum() == 1


def test_mpe_single_peak_is_zero_entropy():
    hm = np.zeros((1, 1, 16, 16, 1), np.float32)
    hm[0, 0, 8, 8, 0] = 1.0
    valid = np.ones((1, 1), bool)
    mpe = _f(uncertainty.multi_peak_entropy(jnp.array(hm), jnp.array(valid)))
    assert abs(mpe) < 1e-5


def test_mpe_matches_hand_computed_two_peaks():
    hm = np.zeros((1, 1, 16, 16, 1), np.float32)
    hm[0, 0, 4, 4, 0] = 1.0
    hm[0, 0, 10, 10, 0] = 0.5
    valid = np.ones((1, 1), bool)
    got = _f(uncertainty.multi_peak_entropy(jnp.array(hm), jnp.array(valid)))
    p = _softmax(np.array([1.0, 0.5]))
    expected = float(-(p * np.log(p)).sum())
    assert abs(got - expected) < 1e-5


def test_hp_matches_row_softmax_semantics():
    rng = np.random.default_rng(0)
    hm = rng.random((1, 2, 8, 8, 3)).astype(np.float32)
    valid = np.ones((1, 3), bool)
    got = _f(uncertainty.highest_probability(jnp.array(hm), jnp.array(valid)))
    hps = []
    for v in range(2):
        for k in range(3):
            m = hm[0, v, :, :, k]
            sm = np.stack([_softmax(row) for row in m])  # torch dim=1 quirk
            hps.append(1.0 - sm.max())
    assert abs(got - np.mean(hps)) < 1e-5


def test_bsb_two_peak_map():
    hm = np.full((1, 1, 16, 16, 1), 0.0, np.float32)
    hm[0, 0, 4, 4, 0] = 6.0
    hm[0, 0, 10, 10, 0] = 5.0
    valid = np.ones((1, 1), bool)
    got = _f(uncertainty.best_vs_second_best(jnp.array(hm), jnp.array(valid)))
    sm = np.stack([_softmax(row) for row in hm[0, 0, :, :, 0]])
    p0, p1 = sm[4, 4], sm[10, 10]
    assert abs(got - abs(p0 - p1)) < 1e-5


def test_std_aggregation():
    rng = np.random.default_rng(1)
    hm = rng.random((1, 2, 16, 16, 4)).astype(np.float32) * 5
    valid = np.ones((1, 4), bool)
    avg = _f(uncertainty.highest_probability(jnp.array(hm), jnp.array(valid), "AVG"))
    std = _f(uncertainty.highest_probability(jnp.array(hm), jnp.array(valid), "STD"))
    hps = []
    for v in range(2):
        for k in range(4):
            sm = np.stack([_softmax(row) for row in hm[0, v, :, :, k]])
            hps.append(1.0 - sm.max())
    assert abs(avg - np.mean(hps)) < 1e-5
    assert abs(std - np.std(hps)) < 1e-5


def test_invalid_joints_excluded():
    rng = np.random.default_rng(2)
    hm = rng.random((1, 1, 16, 16, 2)).astype(np.float32)
    valid = np.array([[True, False]])
    got = _f(uncertainty.highest_probability(jnp.array(hm), jnp.array(valid)))
    sm = np.stack([_softmax(row) for row in hm[0, 0, :, :, 0]])
    assert abs(got - (1.0 - sm.max())) < 1e-5
