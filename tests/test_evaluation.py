"""Evaluation metrics vs loop-based float64 references
(reference: utils/evaluation.py:61-208)."""

import numpy as np

from multi_view_active_learning_tpu.utils import evaluation


def _data(seed=0, n=6, k=5):
    rng = np.random.default_rng(seed)
    pred = rng.normal(scale=10, size=(n, k, 3))
    gt = pred + rng.normal(scale=2, size=(n, k, 3))
    valid = rng.random((n, k)) > 0.2
    valid[:, 0] = True  # keep every joint represented at least once
    valid[0, :] = True
    return pred, gt, valid.astype(np.float64)


def test_mkpe_matches_loop_reference():
    pred, gt, valid = _data()
    n, k = valid.shape
    kpe = np.zeros(k)
    count = np.zeros(k)
    for i in range(n):
        d = np.square(pred[i] - gt[i])
        d = np.where(valid[i][:, None] > 0, d, 0.0)
        d = np.sqrt(d.sum(axis=-1))
        kpe += d
        count += valid[i]
    expected = np.mean(kpe / count)
    got = float(evaluation.compute_mkpe(pred, gt, valid))
    assert abs(got - expected) < 1e-5


def test_pck_matches_loop_reference():
    pred, gt, valid = _data(1)
    n, k = valid.shape
    thr = 3.0
    pck = np.zeros(k)
    count = np.zeros(k)
    for i in range(n):
        for j in range(k):
            if not valid[i, j]:
                continue
            count[j] += 1
            if np.linalg.norm(pred[i, j] - gt[i, j]) < thr:
                pck[j] += 1
    expected = pck / count
    got = evaluation.compute_3d_pck(pred, gt, valid, thr)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_pckh_matches_loop_reference():
    pred, gt, valid = _data(2)
    n, k = valid.shape
    thr = 0.5
    pck = np.zeros(k)
    for i in range(n):
        scale = np.linalg.norm(gt[i, 0] - gt[i, 1]) * thr
        for j in range(k):
            if np.linalg.norm(pred[i, j] - gt[i, j]) < scale:
                pck[j] += 1
    expected = pck / n
    got = evaluation.compute_3d_pckh(pred, gt, thr)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_pck_figure_thresholds():
    pred, gt, valid = _data(3)
    thresholds, pcks = evaluation.compute_3d_pck_figure(pred, gt, valid)
    assert tuple(thresholds) == (1, 2, 3, 4, 5)
    assert len(pcks) == 5 and len(pcks[0]) == valid.shape[1]
    # PCK is monotone in the threshold
    means = [np.mean(p) for p in pcks]
    assert all(a <= b + 1e-9 for a, b in zip(means, means[1:]))


def test_pckh_2d():
    rng = np.random.default_rng(4)
    gt = rng.normal(scale=50, size=(4, 6, 2))
    pred = gt + rng.normal(scale=5, size=(4, 6, 2))
    got = evaluation.compute_pckh_2d(pred, gt, 0.5)
    pck = np.zeros(6)
    for i in range(4):
        scale = np.linalg.norm(gt[i, 0] - gt[i, 1]) * 0.5
        for j in range(6):
            if np.linalg.norm(pred[i, j] - gt[i, j]) < scale:
                pck[j] += 1
    np.testing.assert_allclose(got, pck / 4, atol=1e-6)


def test_perfect_prediction():
    pred, gt, valid = _data(5)
    assert float(evaluation.compute_mkpe(gt, gt, valid)) == 0.0
    np.testing.assert_array_equal(
        evaluation.compute_3d_pck(gt, gt, valid, 1.0), np.ones(valid.shape[1])
    )
