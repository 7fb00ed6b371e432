"""Aux subsystems: metrics writer, visualization, profiling, logger."""

import json
import os

import numpy as np

from multi_view_active_learning_tpu.utils import get_logger
from multi_view_active_learning_tpu.utils.metrics_writer import MetricsWriter
from multi_view_active_learning_tpu.utils import visualization as viz
from multi_view_active_learning_tpu.utils.profiling import StepTimer, device_memory_stats


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.add_scalar("loss/train", 0.5, 10)
    w.add_histogram("sal/mkpe", [1.0, 2.0, 3.0], 1)
    w.add_text("comment", "hello", 0)
    w.add_pck_curves("3DPCK", 5, [1, 2], [[0.1, 0.2], [0.3, 0.4]])
    w.close()
    records = [json.loads(l) for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    tags = {r["tag"] for r in records}
    assert "loss/train" in tags and "sal/mkpe" in tags and "comment" in tags
    assert "3DPCK@1.0/average" in tags
    assert "3DPCK-AVG/keypoint-1" in tags
    hist = next(r for r in records if r["tag"] == "sal/mkpe")
    assert hist["count"] == 3 and abs(hist["mean"] - 2.0) < 1e-9


def test_heatmap_grid_and_overlay():
    hm = np.random.default_rng(0).random((5, 8, 8)).astype(np.float32)
    grid = viz.heatmap_grid(hm)
    assert grid.dtype == np.uint8 and grid.shape[-1] == 3
    assert grid.shape[0] == 8 and grid.shape[1] == 40

    img = np.zeros((32, 32, 3), np.uint8)
    out = viz.overlay_keypoints(img, [[5, 5], [100, 100]], color=(255, 0, 0))
    assert out[5, 5, 0] == 255  # drawn
    assert out.sum() == np.count_nonzero(out) * 255  # only red channel boxes
    # out-of-bounds keypoint ignored, original untouched
    assert img.sum() == 0


def test_pred_vs_gt_heatmaps_stacks():
    pred = np.random.default_rng(1).random((3, 4, 4))
    gt = np.random.default_rng(2).random((3, 4, 4))
    out = viz.pred_vs_gt_heatmaps(pred, gt)
    assert out.shape[0] == 8  # two stacked 4-row grids


def test_plot_pckh_figure_returns_image():
    fig = viz.plot_pckh_figure([0.1, 0.2, 0.3], [0.5, 0.7, 0.9])
    assert fig.ndim == 3 and fig.shape[-1] == 3 and fig.dtype == np.uint8


def test_step_timer():
    t = StepTimer()
    assert t.summary() == {}
    for _ in range(5):
        t.tick()
    s = t.summary()
    assert "steps_per_sec" in s and s["steps_per_sec"] > 0
    t.reset()
    assert t.summary() == {}


def test_device_memory_stats_no_crash():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_logger_singleton():
    a = get_logger("x")
    b = get_logger("x")
    assert a is b


def test_rate_logger_periodic_lines():
    """utils.RateLogger (the reference's tqdm-to-logger role): emits rate
    lines no more often than `interval`, and never a completion line (the
    sweep's own summary owns that)."""
    import logging
    import time

    from multi_view_active_learning_tpu.utils import RateLogger

    logs = []

    class _H(logging.Handler):
        def emit(self, record):
            logs.append(record.getMessage())

    logger = logging.getLogger("test_rate_logger")
    logger.addHandler(_H())
    logger.setLevel(logging.INFO)

    r = RateLogger(logger, "scored", 100, interval=0.05)
    r.tick(10)  # within interval: silent
    assert not logs
    time.sleep(0.06)
    r.tick(10)
    assert any("scored 20/100 frames (20.0%" in m for m in logs), logs

    done = RateLogger(logger, "scored", 10, interval=0.0)
    done.tick(10)
    assert not any("scored 10/10" in m for m in logs), logs


def test_check_dataset_validator(tmp_path, capsys):
    """tools/check_dataset.py: green on schema-exact synthetic trees, red
    on a corrupted one (MIGRATION.md's pre-parity fail-fast step)."""
    import json
    import os
    import sys

    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import check_dataset

    root = generate_panoptic_tree(
        str(tmp_path / "tree"), num_train_frames=3, num_val_frames=2,
        num_joints=5, num_cameras=2,
    )
    def run(argv):
        old = sys.argv
        sys.argv = ["check_dataset.py"] + argv
        try:
            return check_dataset.main()
        finally:
            sys.argv = old

    assert run(["--type", "panoptic", "--root", root]) == 0

    # Corrupt: drop one camera from a pose's camera dict.
    with open(os.path.join(root, "labels.json")) as f:
        labels = json.load(f)
    pose = next(iter(labels["train"]))
    victim = next(iter(labels["train"][pose]["cameras"]))
    del labels["train"][pose]["cameras"][victim]
    with open(os.path.join(root, "labels.json"), "w") as f:
        json.dump(labels, f)
    assert run(["--type", "panoptic", "--root", root]) == 1
