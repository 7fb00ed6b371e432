"""Guard-rail semantics in ActiveLearningStrategy that need no compiled
scoring pass: CORESET non-finite-candidate filtering, random-sampling
overdraw, and SAL KMeans cluster-file validation."""

import json

import numpy as np
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.data.pools import FramePool
from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy


def _pool(n=10):
    frames = {
        f"g{i}": {
            "guid": f"g{i}",
            "pose": 1,
            "frame_id": i,
            "3d_keypoints": np.random.default_rng(i).normal(size=(4, 3)),
            "joint_valid": np.ones(4, bool),
            "views": {},
        }
        for i in range(n)
    }
    return FramePool(frames, split="train")


def _cfg(**overrides):
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    for k, v in overrides.items():
        node, leaf = cfg, k.split(".")
        for part in leaf[:-1]:
            node = getattr(node, part)
        setattr(node, leaf[-1], v)
    return cfg


def test_coreset_drops_nonfinite_candidates(monkeypatch):
    """A NaN-triangulated frame must not poison k-center-greedy (a NaN
    feature row wins every argmax, then NaNs the whole min-distance
    vector -> duplicate selections -> label_by_frame_guids KeyError)."""
    cfg = _cfg(**{"EXPR_TYPE": "AL", "AL.STRATEGY": "CORESET"})
    strategy = ActiveLearningStrategy(cfg)
    pool = _pool(8)
    pool.label_by_frame_guids(["g0"])  # coreset needs initial centers

    candidates = [f"g{i}" for i in range(1, 8)]
    sal_dict = {
        "al_metric": {g: 0.0 for g in candidates},
        "sal_metric": {g: 0.0 for g in candidates},
        "inlier_count": {g: 4.0 for g in candidates},
        "mkpe": {g: 0.0 for g in candidates},
        "pred_3d_keypoints": {
            g: (
                np.full((4, 3), np.nan).tolist()
                if g in ("g2", "g5")
                else np.random.default_rng(hash(g) % 100).normal(size=(4, 3)).tolist()
            )
            for g in candidates
        },
    }
    monkeypatch.setattr(
        strategy, "_compute_sal_dict", lambda *a, **k: sal_dict
    )
    al_guids, sal_guids, _ = strategy._sal_pseudo_labeling(
        pool, 4, 0, state=None, iteration=1
    )
    assert len(al_guids) == 4
    assert len(set(al_guids)) == 4, "duplicate selection"
    assert not {"g2", "g5"} & set(al_guids), "NaN frame selected"

    # More requested than finite candidates: select all finite, no dups.
    pool2 = _pool(8)
    pool2.label_by_frame_guids(["g0"])
    al_guids2, _, _ = strategy._sal_pseudo_labeling(
        pool2, 7, 0, state=None, iteration=1
    )
    assert sorted(al_guids2) == sorted(set(candidates) - {"g2", "g5"})


def test_random_sample_overdraw_selects_all():
    cfg = _cfg(**{"EXPR_TYPE": "AL", "AL.STRATEGY": "RANDOM"})
    strategy = ActiveLearningStrategy(cfg)
    pool = _pool(5)
    picked = strategy._random_sample_frames(pool, 50)
    assert sorted(picked) == [f"g{i}" for i in range(5)]
    assert len(pool.unlabeled_data) == 0


def test_sal_kmeans_rejects_loss_cluster_file(tmp_path):
    """A LOSS-type cluster dump ({guid: scalar}) cannot seed the pose
    KMeans; the init must say so instead of the reference's bare
    IndexError (reference: strategy.py:38-52)."""
    path = tmp_path / "clusters.json"
    path.write_text(json.dumps({"g0": 0.5, "g1": 1.25}))
    cfg = _cfg(
        **{"EXPR_TYPE": "SAL", "SAL.CLUSTER_FILE_PATH": str(path)}
    )
    with pytest.raises(ValueError, match="POSE-type"):
        ActiveLearningStrategy(cfg)
