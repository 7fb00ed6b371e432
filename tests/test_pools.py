"""FramePool semantics (reference: dataset/dataset.py:25-110)."""

import numpy as np
import pytest

from multi_view_active_learning_tpu.data.pools import FramePool


def _pool(n=10, split="train"):
    frames = {
        f"g{i}": {
            "guid": f"g{i}",
            "pose": 1,
            "frame_id": i,
            "3d_keypoints": np.full((4, 3), float(i)),
            "joint_valid": np.ones(4, bool),
            "views": {},
        }
        for i in range(n)
    }
    return FramePool(frames, split=split)


def test_label_by_guids_moves_frames():
    p = _pool()
    p.label_by_frame_guids(["g2", "g5"])
    assert len(p.labeled_data) == 2
    assert "g2" not in p.unlabeled_data and "g5" not in p.unlabeled_data
    assert len(p.unlabeled_data) == 8


def test_label_all():
    p = _pool()
    p.label_all()
    assert len(p.labeled_data) == 10 and len(p.unlabeled_data) == 0


def test_pseudo_label_attaches_keypoints():
    p = _pool()
    pseudo = {"g1": np.ones((4, 3)), "g3": 2 * np.ones((4, 3))}
    p.pseudo_label_by_frame_guids(["g1", "g3"], pseudo)
    assert p.pseudo_label_guids == ["g1", "g3"]
    assert len(p.pseudo_labeled_data) == 2
    np.testing.assert_array_equal(
        p.pseudo_labeled_data[1]["pseudo_3d_keypoints"], 2 * np.ones((4, 3))
    )
    # original pool untouched
    assert "g1" in p.unlabeled_data


def test_resample_frames_duplicates_to_epoch_size():
    p = _pool()
    p.label_by_frame_guids(["g0", "g1", "g2"])
    rng = np.random.default_rng(0)
    p.resample_frames(-1, epoch_size=10, rng=rng)
    # 3 + 3 * (10 // 3) = 12 entries
    assert len(p.data) == 12


def test_resample_frames_val_split_no_duplication():
    p = _pool(split="val")
    p.label_all()
    p.resample_frames(-1, epoch_size=100, rng=np.random.default_rng(0))
    assert len(p.data) == 10


def test_resample_fixed_count_and_overdraw_raises():
    p = _pool()
    p.label_by_frame_guids(["g0", "g1", "g2"])
    p.resample_frames(2, rng=np.random.default_rng(0))
    assert len(p.data) == 2
    with pytest.raises(ArithmeticError):
        p.resample_frames(5, rng=np.random.default_rng(0))


def test_resample_unlabeled():
    p = _pool()
    p.label_by_frame_guids(["g0"])
    p.resample_unlabeled_data()
    assert len(p.data) == 9


def test_coreset_dict_shapes():
    p = _pool()
    p.label_by_frame_guids(["g0", "g7"])
    d = p.get_al_dict_for_coreset()
    assert set(d.keys()) == {0, 1}
    assert d[0].shape == (4, 3)
    np.testing.assert_array_equal(d[1], np.full((4, 3), 7.0))
