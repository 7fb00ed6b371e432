"""k-center-greedy coreset vs a loop-based numpy oracle
(reference: utils/coreset.py:13-95, tests/test_coreset.py:14-20)."""

import numpy as np
import jax.numpy as jnp

from multi_view_active_learning_tpu.ops import coreset


def _greedy_oracle(features, labeled_mask, n):
    """Straight numpy transcription of k-center greedy semantics."""
    min_d = np.full(len(features), np.inf)
    for i in np.where(labeled_mask)[0]:
        min_d = np.minimum(min_d, np.linalg.norm(features - features[i], axis=-1))
    out = []
    for _ in range(n):
        ind = int(np.argmax(min_d))
        out.append(ind)
        min_d = np.minimum(min_d, np.linalg.norm(features - features[ind], axis=-1))
    return out


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(200, 16)).astype(np.float32)
    labeled = np.zeros(200, bool)
    labeled[150:] = True
    got = np.asarray(
        coreset.k_center_greedy(jnp.asarray(feats), jnp.asarray(labeled), 10)
    )
    expected = _greedy_oracle(feats, labeled, 10)
    np.testing.assert_array_equal(got, expected)


def test_selects_only_unlabeled():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(64, 8)).astype(np.float32)
    labeled = np.zeros(64, bool)
    labeled[48:] = True
    got = np.asarray(
        coreset.k_center_greedy(jnp.asarray(feats), jnp.asarray(labeled), 16)
    )
    assert (got < 48).all()
    assert len(set(got.tolist())) == 16  # no duplicates


def test_coreset_class_returns_pool_keys():
    rng = np.random.default_rng(2)
    sal = {f"guid-{i}": rng.normal(size=(19, 3)) for i in range(30)}
    al = {i: rng.normal(size=(19, 3)) for i in range(10)}
    cs = coreset.CoreSet(sal, al, joint_root_index=2)
    batch = cs.select_batch(5)
    assert len(batch) == 5
    assert all(k in sal for k in batch)
    assert len(set(batch)) == 5


def test_center_poses_root_centering():
    poses = np.zeros((2, 4, 3))
    poses[0, 2] = [1.0, 2.0, 3.0]  # root joint
    poses[0, 0] = [2.0, 2.0, 3.0]
    feats = coreset.center_poses(poses, root_index=2)
    assert feats.shape == (2, 12)
    # feature layout is (3, K) flattened: joint 0 x-offset = 1 at position 0
    assert feats[0, 0] == 1.0
    assert feats[0, 2] == 0.0  # root x zero


def test_chunked_min_distance_exceeds_chunk_size():
    rng = np.random.default_rng(3)
    n = 2100  # > 2 chunks of 1024
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    labeled = np.zeros(n, bool)
    labeled[-50:] = True
    got = np.asarray(
        coreset.k_center_greedy(jnp.asarray(feats), jnp.asarray(labeled), 3)
    )
    expected = _greedy_oracle(feats, labeled, 3)
    np.testing.assert_array_equal(got, expected)


def test_duplicate_pool_never_selects_labeled():
    # Degenerate pool: every unlabeled pose identical, n_select > unique
    # points.  The chunked ||x||^2+||c||^2-2x.c expansion leaves labeled
    # points at a tiny positive self-distance (cancellation); the greedy
    # argmax must still never pick them once unlabeled distances hit 0.
    rng = np.random.default_rng(7)
    dup = rng.normal(size=(19, 3))
    sal = {f"s{i}": dup for i in range(3)}
    al = {f"a{i}": rng.normal(size=(19, 3)) for i in range(2)}
    batch = coreset.CoreSet(sal, al, joint_root_index=2).select_batch(3)
    assert len(batch) == 3
    assert all(k in sal for k in batch)


def test_coreset_features_override():
    """Explicit `features` (the AL.CORESET_FEATURES=EMBEDDING path) replaces
    the pose feature space: with IDENTICAL poses everywhere, selection is
    driven purely by the override matrix — greedy must pick the unlabeled
    row farthest from the labeled center, and never the near-duplicate."""
    rng = np.random.default_rng(11)
    pose = rng.normal(size=(19, 3))  # same pose for every frame
    sal = {f"s{i}": pose for i in range(3)}
    al = {"a0": pose}
    # 1-D embeddings: labeled at 0; s0 at 0.01 (duplicate), s1 at 5, s2 at 9.
    feats = np.asarray([[0.01], [5.0], [9.0], [0.0]], np.float32)
    cs = coreset.CoreSet(sal, al, joint_root_index=2, features=feats)
    assert cs.select_batch(2) == ["s2", "s1"]

    # Row-count mismatch is a hard error, not silent misalignment.
    try:
        coreset.CoreSet(sal, al, joint_root_index=2, features=feats[:3])
    except AssertionError:
        pass
    else:
        raise AssertionError("shape mismatch not caught")
