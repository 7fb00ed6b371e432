"""jnp KMeans (reference dependency: sklearn KMeans at strategy.py:38-52)."""

import numpy as np

from multi_view_active_learning_tpu.utils.kmeans import KMeans


def _blobs(seed=0, k=4, per=50, d=6, spread=20.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=spread, size=(k, d))
    pts = np.concatenate(
        [c + rng.normal(size=(per, d)) for c in centers], axis=0
    ).astype(np.float32)
    labels = np.repeat(np.arange(k), per)
    return pts, labels


def test_recovers_well_separated_blobs():
    pts, labels = _blobs()
    km = KMeans(4, random_state=1307).fit(pts)
    pred = km.predict(pts)
    # Each true blob maps to exactly one predicted cluster.
    for b in range(4):
        assert len(set(pred[labels == b].tolist())) == 1
    assert len(set(pred.tolist())) == 4


def test_predict_single_sample():
    pts, _ = _blobs(1)
    km = KMeans(4, random_state=0).fit(pts)
    single = km.predict(pts[0])
    assert single.shape == (1,)


def test_deterministic_in_seed():
    pts, _ = _blobs(2)
    p1 = KMeans(4, random_state=7).fit(pts).predict(pts)
    p2 = KMeans(4, random_state=7).fit(pts).predict(pts)
    np.testing.assert_array_equal(p1, p2)


def test_degenerate_pool_duplicate_points():
    """All-identical (or fewer-distinct-than-k) pools must seed without
    crashing: once every point coincides with a chosen center the D^2
    mass is zero and rng.choice(p=all-zeros) would raise (sklearn, the
    reference's KMeans, handles this gracefully)."""
    pts = np.ones((6, 5), np.float32)
    km = KMeans(4, random_state=0).fit(pts)
    assert km.predict(pts).shape == (6,)

    # Two distinct points, four clusters.
    pts2 = np.concatenate([np.zeros((3, 5)), np.ones((3, 5))]).astype(np.float32)
    pred = KMeans(4, random_state=0).fit(pts2).predict(pts2)
    assert len(set(pred[:3].tolist())) == 1
    assert len(set(pred[3:].tolist())) == 1
    assert set(pred[:3].tolist()) != set(pred[3:].tolist())
