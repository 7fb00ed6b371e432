"""Dataset indexers + host/device pipeline on hermetic synthetic trees
(reference dataset contracts: tests/test_panoptics_dataset.py:16-78,
tests/test_ih26m_dataset.py:16-108 — which require real data; ours don't)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.data import build_dataset
from multi_view_active_learning_tpu.data.ih26m import (
    InterHand26MDataset,
    select_common_cameras,
)
from multi_view_active_learning_tpu.data.pipeline import (
    FrameLoader,
    device_prepare,
    prepare_views_host,
)
from multi_view_active_learning_tpu.data.synthetic import (
    generate_ih26m_tree,
    generate_panoptic_tree,
)
from multi_view_active_learning_tpu.ops import geometry

NUM_JOINTS, NUM_CAMS, IMG = 19, 4, 256


@pytest.fixture(scope="module")
def panoptic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("panoptic")
    return generate_panoptic_tree(
        str(root), num_train_frames=4, num_val_frames=2,
        num_joints=NUM_JOINTS, num_cameras=NUM_CAMS,
    )


@pytest.fixture(scope="module")
def cfg(panoptic_root):
    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = panoptic_root
    cfg.DATA.NUM_JOINTS = NUM_JOINTS
    cfg.TRAIN.BATCH_SIZE = 2
    return cfg


def test_panoptic_indexer(cfg):
    ds = build_dataset(cfg, "train")
    assert len(ds.unlabeled_data) == 4
    assert ds.get_num_view_per_frame() == NUM_CAMS
    frame = next(iter(ds.unlabeled_data.values()))
    assert frame["3d_keypoints"].shape == (NUM_JOINTS, 3)
    assert len(frame["views"]) == NUM_CAMS
    assert "-" in frame["guid"]


def test_host_prepare_shapes_and_projection_consistency(cfg):
    ds = build_dataset(cfg, "train")
    frame = next(iter(ds.unlabeled_data.values()))
    out = prepare_views_host(frame, cfg.DATA, gt_stride=4)
    assert out["images"].shape == (NUM_CAMS, IMG, IMG, 3)
    assert out["images"].dtype == np.uint8
    assert out["proj_matrices"].shape == (NUM_CAMS, 3, 4)
    assert out["2d_keypoints"].shape == (NUM_CAMS, NUM_JOINTS, 2)
    # The emitted projection matrix must reproduce the emitted 2D keypoints
    # (camera crop/resize updates are consistent with the distortion-free
    # projection for zero-distortion synthetic cameras).
    kp3d = frame["3d_keypoints"]
    for v in range(NUM_CAMS):
        reproj = geometry.project_points_np(
            out["proj_matrices"][v].astype(np.float64), kp3d
        )
        np.testing.assert_allclose(reproj, out["2d_keypoints"][v], atol=1e-3)
    # keypoints land inside the crop
    assert (out["2d_keypoints"] >= 0).all()
    assert (out["2d_keypoints"] < IMG).all()


def test_frame_loader_batches_and_padding(cfg):
    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    loader = FrameLoader(ds, cfg.DATA, 4, batch_size=3, prefetch=0)
    batches = list(loader)
    assert len(batches) == 2  # 4 frames / batch 3 -> 2 (padded tail)
    b = batches[-1]
    assert b["images"].shape == (3, NUM_CAMS, IMG, IMG, 3)
    np.testing.assert_array_equal(b["frame_valid"], [True, False, False])
    assert len(b["guid"]) == 3


def test_frame_loader_sharding(cfg):
    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, rng=np.random.default_rng(0))
    per_shard = []
    for shard in range(2):
        loader = FrameLoader(
            ds, cfg.DATA, 4, batch_size=2, num_shards=2, shard_index=shard,
            prefetch=0,
        )
        got = set()
        for b in loader:
            for g, v in zip(b["guid"], b["frame_valid"]):
                if v:
                    got.add(g)
        per_shard.append(got)
    # shards are disjoint and together cover the pool exactly
    assert not per_shard[0] & per_shard[1]
    assert len(per_shard[0] | per_shard[1]) == 4


def test_frame_loader_equalized_shards_and_global_layout(cfg):
    """Multi-process contract: every shard emits the SAME batch count (a
    short shard pads whole frame_valid=False batches — each batch is one
    collective step), and global_batch_layout reconstructs every shard's
    guid rows in the strategy._put process-contiguous order."""
    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    assert len(ds.data) == 4
    # 3 shards of a 4-frame pool: lengths 2/1/1; B=2 -> every shard must
    # emit ceil(ceil(4/3)/2) = 1 batch... use B=1 for a sharper split:
    # shard 0 has 2 frames -> 2 batches; shards 1, 2 must pad to 2.
    loaders = [
        FrameLoader(
            ds, cfg.DATA, 4, batch_size=1, num_shards=3, shard_index=s,
            prefetch=0,
        )
        for s in range(3)
    ]
    assert [len(ld) for ld in loaders] == [2, 2, 2]
    batch_lists = [list(ld) for ld in loaders]
    assert all(len(bl) == 2 for bl in batch_lists)
    # Shards 1 and 2's second batch is pure padding.
    for s in (1, 2):
        np.testing.assert_array_equal(
            batch_lists[s][1]["frame_valid"], [False]
        )
    # global_batch_layout row order == concat of the shards' batch rows.
    for b in range(2):
        guids, valid = loaders[0].global_batch_layout(b)
        expect_guids = [
            g for s in range(3) for g in batch_lists[s][b]["guid"]
        ]
        expect_valid = np.concatenate(
            [batch_lists[s][b]["frame_valid"] for s in range(3)]
        )
        assert guids == expect_guids
        np.testing.assert_array_equal(valid, expect_valid)


def test_shard_layout_cache_follows_pool_rebind(cfg):
    """The memoized per-shard guid lists must refresh when pool.data is
    rebound (resample builds a fresh permuted list).  Regression guard for
    the id()-keyed cache: CPython reuses a freed list's id, so a same-length
    rebind could silently serve the OLD layout and mis-key every score —
    the cache now validates with an `is` check on the held snapshot."""
    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    loader = FrameLoader(
        ds, cfg.DATA, 4, batch_size=2, num_shards=2, shard_index=0, prefetch=0
    )
    first_guids, _ = loader.global_batch_layout(0)
    snapshot = loader._shard_guids_cache[0]
    assert snapshot is ds.data  # the cache pins the exact snapshot object
    # Same length, different permutation: only the rebind distinguishes it.
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(7))
    assert ds.data is not snapshot
    order = [f["guid"] for f in ds.data]
    expect = order[0::2][:2]  # shard 0's first batch after the rebind
    new_guids, _ = loader.global_batch_layout(0)
    assert new_guids[:2] == expect
    assert loader._shard_guids_cache[0] is ds.data


def test_device_prepare_heatmaps_peak_at_keypoints(cfg):
    ds = build_dataset(cfg, "train")
    frame = next(iter(ds.unlabeled_data.values()))
    out = prepare_views_host(frame, cfg.DATA, gt_stride=4)
    images = jnp.array(out["images"][None])
    kp2d = jnp.array(out["2d_keypoints"][None])
    sigma = jnp.array([1.0])
    imgs, heat = device_prepare(
        images, kp2d, sigma, jax.random.PRNGKey(0), stride=4, train=False
    )
    assert imgs.shape == (1, NUM_CAMS, IMG, IMG, 3)
    assert heat.shape == (1, NUM_CAMS, IMG // 4, IMG // 4, NUM_JOINTS)
    # heatmap argmax should be the grid-rounded keypoint
    hm = np.asarray(heat)[0, 0, :, :, 0]
    y, x = np.unravel_index(hm.argmax(), hm.shape)
    expect = np.asarray(out["2d_keypoints"])[0, 0] / 4.0
    assert abs(x - expect[0]) <= 0.5 + 1e-6
    assert abs(y - expect[1]) <= 0.5 + 1e-6
    # normalization: mean-ish ImageNet range
    assert np.asarray(imgs).min() > -3.0 and np.asarray(imgs).max() < 3.0


def test_ih26m_indexer(tmp_path):
    root = generate_ih26m_tree(str(tmp_path), num_frames=3, num_cameras=4)
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 42
    cfg.DATA.IH26M.HOME = root
    cfg.DATA.IH26M.CAPTURE_RANGE = [0, 1]
    cfg.DATA.IH26M.NUM_VIEW_PER_FRAME = 3
    ds = InterHand26MDataset(cfg.DATA, 4, split="train", root=root)
    assert len(ds.unlabeled_data) == 3
    assert ds.get_num_view_per_frame() == 3
    frame = next(iter(ds.unlabeled_data.values()))
    assert frame["3d_keypoints"].shape == (42, 3)
    assert frame["joint_valid"].shape == (42,)
    # host prep works on ih26m frames too
    out = prepare_views_host(frame, cfg.DATA, gt_stride=4)
    assert out["images"].shape == (3, 256, 256, 3)


def test_select_common_cameras_spread():
    # 6 cameras on a line; greedy max-min spread from cam 0 picks the ends
    # before the middle.
    all_cam = {
        "0": {"campos": {f"c{i}": [float(i), 0.0, 0.0] for i in range(6)}}
    }
    picked = select_common_cameras(all_cam, ["0"], 3)
    assert "c0" in picked and "c5" in picked
    assert len(picked) == 3


def test_select_common_cameras_reference_compat():
    # Compat mode reproduces the reference's degenerate pick
    # (ih26m_common_cams.py:47): the first N common cameras in capture-0
    # JSON insertion order — NOT the spread ends.
    all_cam = {
        "0": {"campos": {f"c{i}": [float(i), 0.0, 0.0] for i in (3, 1, 4, 0, 5, 2)}},
        "1": {"campos": {f"c{i}": [float(i), 0.0, 0.0] for i in range(6) if i != 4}},
    }
    picked = select_common_cameras(
        all_cam, ["0", "1"], 3, reference_compat=True
    )
    assert picked == ["c3", "c1", "c0"]
    import pytest as _pytest
    with _pytest.raises(ArithmeticError):
        select_common_cameras(all_cam, ["0", "1"], 99, reference_compat=True)
    assert select_common_cameras(
        all_cam, ["0", "1"], -1, reference_compat=True
    ) == ["c3", "c1", "c0", "c5", "c2"]


def test_view_cache_hits_across_epochs(cfg):
    from multi_view_active_learning_tpu.data import pipeline

    pipeline.VIEW_CACHE.clear()
    pipeline.VIEW_CACHE.hits = pipeline.VIEW_CACHE.misses = 0
    ds = build_dataset(cfg, "train")
    frame = next(iter(ds.unlabeled_data.values()))
    out1 = prepare_views_host(frame, cfg.DATA, gt_stride=4)
    assert pipeline.VIEW_CACHE.misses == NUM_CAMS
    out2 = prepare_views_host(frame, cfg.DATA, gt_stride=4)
    assert pipeline.VIEW_CACHE.hits == NUM_CAMS
    np.testing.assert_array_equal(out1["images"], out2["images"])
    np.testing.assert_array_equal(out1["proj_matrices"], out2["proj_matrices"])


def test_view_cache_disabled(cfg):
    from multi_view_active_learning_tpu.data import pipeline

    cfg2 = cfg.clone()
    cfg2.DATA.VIEW_CACHE_SIZE = 0
    pipeline.VIEW_CACHE.clear()
    pipeline.VIEW_CACHE.hits = pipeline.VIEW_CACHE.misses = 0
    ds = build_dataset(cfg2, "train")
    frame = next(iter(ds.unlabeled_data.values()))
    prepare_views_host(frame, cfg2.DATA, gt_stride=4)
    prepare_views_host(frame, cfg2.DATA, gt_stride=4)
    assert pipeline.VIEW_CACHE.hits == 0


def test_frame_loader_prefetch_thread_stops_on_break(cfg):
    import threading
    import time as _time

    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=32, rng=np.random.default_rng(0))
    before = threading.active_count()
    loader = FrameLoader(ds, cfg.DATA, 4, batch_size=1, prefetch=1)
    for batch in loader:
        break  # abandon mid-epoch
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_frame_loader_process_workers_match_inprocess(cfg):
    """num_workers>0 decodes in forked worker processes (the torch DataLoader
    num_workers analog, reference: strategy.py:747-760) and must yield
    byte-identical batches in the same order as in-process decode."""
    from multi_view_active_learning_tpu.data import pipeline

    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    ref_loader = FrameLoader(ds, cfg.DATA, 4, batch_size=3, prefetch=0)
    mp_loader = FrameLoader(
        ds, cfg.DATA, 4, batch_size=3, prefetch=1, num_workers=2
    )
    try:
        ref_batches = list(ref_loader)
        # The in-process pass warmed the parent VIEW_CACHE; clear it so the
        # mp pass actually exercises the worker processes rather than the
        # all-views-hot inline fast path.
        pipeline.VIEW_CACHE.clear()
        mp_batches = list(mp_loader)
        assert len(ref_batches) == len(mp_batches)
        for a, b in zip(ref_batches, mp_batches):
            assert a["guid"] == b["guid"]
            np.testing.assert_array_equal(a["frame_valid"], b["frame_valid"])
            for key in a:
                if key == "guid":
                    continue
                np.testing.assert_array_equal(a[key], b[key])
        # Pool reuse across epochs: a second pass works on the same executor.
        again = list(mp_loader)
        assert [b2["guid"] for b2 in again] == [b2["guid"] for b2 in mp_batches]
    finally:
        mp_loader.close()


def test_shared_executor_grows_and_loaders_refetch(cfg):
    """One process-wide decode pool, grown to the largest worker count
    ever requested: a bigger request retires the old pool (in-flight
    futures stay valid), and existing loaders re-fetch the current pool
    each sweep instead of submitting to the retired one."""
    from multi_view_active_learning_tpu.data import pipeline

    pipeline.shutdown_shared_executors()  # order-independence: fresh pool
    small = pipeline._shared_executor(1)
    again = pipeline._shared_executor(1)
    assert small is again  # same count -> same pool
    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    loader = FrameLoader(
        ds, cfg.DATA, 4, batch_size=2, prefetch=0, num_workers=1
    )
    assert loader._ensure_executor() is small
    big = pipeline._shared_executor(2)
    assert big is not small
    assert pipeline._shared_executor(1) is big  # smaller requests reuse it
    assert loader._ensure_executor() is big  # loader re-fetched
    # The re-fetch released the loader's ref on the retired pool — its last
    # holder — so it was shut down (workers + warmed caches reclaimed),
    # not left idling until process exit.
    with pytest.raises(RuntimeError):
        small.submit(int, 0)
    assert small not in pipeline._RETIRED_EXECUTORS
    pipeline.VIEW_CACHE.clear()
    batches = list(loader)  # decodes through the grown pool
    assert sum(int(v) for b in batches for v in b["frame_valid"]) == 4


def test_retired_executor_reclaimed_without_holders():
    """Growth while NO loader holds the old pool shuts it down immediately
    (previously it idled until process exit, pinning every worker's warmed
    VIEW_CACHE copy)."""
    from multi_view_active_learning_tpu.data import pipeline

    pipeline.shutdown_shared_executors()
    small = pipeline._acquire_shared_executor(1)
    pipeline._release_shared_executor(small)  # no live holders remain
    big = pipeline._shared_executor(2)  # growth reclaims the old pool NOW
    assert big is not small
    with pytest.raises(RuntimeError):
        small.submit(int, 0)
    assert not pipeline._RETIRED_EXECUTORS


def test_decode_workers_never_initialize_jax(cfg):
    """Decode workers must never initialize an XLA backend: they fork from
    a server that already imported jax (the preload), and fork-inherited
    jax state initializing XLA deadlocked scoring sweeps intermittently
    (the trigger was a module logger calling jax.process_index() at
    native_loader import time inside the worker)."""
    from multi_view_active_learning_tpu.data import pipeline

    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    pipeline.VIEW_CACHE.clear()
    loader = FrameLoader(
        ds, cfg.DATA, 4, batch_size=2, prefetch=0, num_workers=2
    )
    try:
        list(loader)  # full decode pass through the worker pool
        ex = pipeline._shared_executor(2)
        flags = [
            ex.submit(pipeline._jax_backend_initialized).result()
            for _ in range(8)
        ]
        assert not any(flags), "a decode worker initialized an XLA backend"
    finally:
        loader.close()


def test_device_crop_mode_matches_host_crop(cfg):
    """DATA.DEVICE_CROP: the host emits full frames + identical camera math;
    the on-device crop+resize reproduces the host crop up to resampling
    filter differences (device bilinear vs host Lanczos)."""
    from multi_view_active_learning_tpu.ops import image as image_ops

    ds = build_dataset(cfg, "train")
    frame = next(iter(ds.unlabeled_data.values()))
    host = prepare_views_host(frame, cfg.DATA, gt_stride=4)

    dc = cfg.clone()
    dc.DATA.DEVICE_CROP = True
    full = prepare_views_host(frame, dc.DATA, gt_stride=4)
    # Camera math is pixel-independent: projections/keypoints identical.
    np.testing.assert_array_equal(full["proj_matrices"], host["proj_matrices"])
    np.testing.assert_array_equal(full["2d_keypoints"], host["2d_keypoints"])
    np.testing.assert_array_equal(full["square_box"], host["square_box"])
    assert full["images"].dtype == np.uint8

    crops = np.asarray(
        image_ops.crop_resize_uint8(
            jnp.asarray(full["images"][None]),
            jnp.asarray(full["square_box"][None]),
            cfg.DATA.INPUT_HEIGHT,
            cfg.DATA.INPUT_WIDTH,
        )
    )[0]
    assert crops.shape == host["images"].shape
    # Same content, different resampling filter: mean abs error stays small.
    mae = np.mean(
        np.abs(crops.astype(np.float32) - host["images"].astype(np.float32))
    )
    assert mae < 8.0, mae


def test_frame_loader_warm_sweep_skips_workers(cfg):
    """Second sweep over the same pool: worker results back-filled the
    parent VIEW_CACHE, so every frame takes the inline all-views-hot fast
    path — zero executor submissions, byte-identical batches (the AL
    loop re-scores the full pool every iteration; this is its steady
    state, BENCH_NOTES round 3)."""
    from unittest import mock

    from multi_view_active_learning_tpu.data import pipeline

    ds = build_dataset(cfg, "train")
    ds.label_all()
    ds.resample_frames(-1, epoch_size=0, rng=np.random.default_rng(0))
    loader = FrameLoader(
        ds, cfg.DATA, 4, batch_size=3, prefetch=0, num_workers=1
    )
    try:
        pipeline.VIEW_CACHE.clear()
        first = list(loader)
        ex = loader._ensure_executor()
        with mock.patch.object(
            ex, "submit", side_effect=AssertionError("warm sweep hit a worker")
        ):
            second = list(loader)
        for a, b in zip(first, second):
            assert a["guid"] == b["guid"]
            np.testing.assert_array_equal(a["images"], b["images"])
    finally:
        loader.close()


def test_heterogeneous_tree_schema_and_distractors(tmp_path):
    """generate_heterogeneous_tree: loads through the panoptic indexer,
    meta.json partitions the train pool, and hard views carry extra
    (distractor) discs that common views lack — the confusion mechanism
    the AL-vs-RANDOM experiment (tools/validate_al_gain.py) rests on."""
    import json
    import os

    from PIL import Image

    from multi_view_active_learning_tpu.data.synthetic import (
        generate_heterogeneous_tree,
    )

    root = generate_heterogeneous_tree(
        str(tmp_path / "het"), num_common=5, num_hard=4, num_hard_clusters=2,
        num_val_common=2, num_val_hard=2, num_joints=NUM_JOINTS,
        num_cameras=2, num_distractors=8,
    )
    with open(os.path.join(root, "meta.json")) as f:
        meta = json.load(f)
    assert len(meta["common_guids"]) == 5
    assert len(meta["hard_guids"]) == 4
    assert len(meta["val_hard_guids"]) == 2

    c = get_default_configs()
    c.DATA.TYPE = "synthetic"
    c.DATA.SYNTHETIC_ROOT = root
    c.DATA.NUM_JOINTS = NUM_JOINTS
    train = build_dataset(c, "train")
    assert set(meta["common_guids"]) | set(meta["hard_guids"]) == set(
        train.unlabeled_data
    )
    val = build_dataset(c, "val")
    assert set(meta["val_hard_guids"]) <= set(val.unlabeled_data)
    # test split reuses the val poses (panoptic_dataset.py:31 semantics)
    test = build_dataset(c, "test")
    assert set(test.unlabeled_data) == set(val.unlabeled_data)

    def bright_px(frame):
        view = next(iter(frame["views"].values()))
        img = np.asarray(Image.open(view["path"]))
        return int((img.max(axis=-1) > 120).sum())

    hard_px = np.mean(
        [bright_px(train.unlabeled_data[g]) for g in meta["hard_guids"]]
    )
    common_px = np.mean(
        [bright_px(train.unlabeled_data[g]) for g in meta["common_guids"]]
    )
    # ~8 extra discs per hard view: materially more bright pixels.
    assert hard_px > common_px + 200
