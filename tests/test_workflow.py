"""End-to-end experiments on the synthetic dataset: SUPERVISED training with
eval, and the full AL/SAL loop with scoring, selection, pseudo-labeling,
checkpoints, and guid-log resume (reference call stacks: SURVEY.md §3).

Tiny shapes keep single-core CPU compiles tolerable: PoseResNet-18,
64x64 inputs, 4 cameras, a handful of frames.
"""

import glob
import json
import os

import numpy as np
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.data import build_dataset
from multi_view_active_learning_tpu.data.synthetic import generate_panoptic_tree
from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy
from multi_view_active_learning_tpu.utils import checkpoint as ckpt
from multi_view_active_learning_tpu import workflow

pytestmark = pytest.mark.heavy  # full experiments: fresh jit compiles

NUM_JOINTS, NUM_CAMS = 19, 4


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return generate_panoptic_tree(
        str(root), num_train_frames=8, num_val_frames=2,
        num_joints=NUM_JOINTS, num_cameras=NUM_CAMS,
    )


def _tiny_cfg(tree, log_dir):
    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = tree
    cfg.DATA.NUM_JOINTS = NUM_JOINTS
    cfg.DATA.INPUT_WIDTH = 64
    cfg.DATA.INPUT_HEIGHT = 64
    cfg.DATA.EPOCH_SIZE = 4
    cfg.POSE_ESTIMATOR.TYPE = "POSE_RESNET"
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # Float scoring keeps these CPU compiles fast; the int8-default
    # path has dedicated coverage (test_quantize, the int8 AL test
    # below, dryrun_multichip).
    cfg.TPU.INT8_SCORING = False
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.VAL_SIZE = 2
    cfg.TRAIN.OPTIM.TOTAL_STEPS = 4
    cfg.TRAIN.LOG_EVERY_ITER = 4
    cfg.AL.INFERENCE.BATCH_SIZE = 2
    cfg.LOG_DIR = log_dir
    cfg.EXPR_NAME = "TEST"
    return cfg


def test_supervised_training_end_to_end(tree, tmp_path):
    from multi_view_active_learning_tpu.data import pipeline

    cfg = _tiny_cfg(tree, str(tmp_path))
    strategy = ActiveLearningStrategy(cfg)
    train_pool = build_dataset(cfg, "train")
    val_pool = build_dataset(cfg, "val")
    refs_before = dict(pipeline._EXECUTOR_REFS)
    strategy.run_fully_supervised_training(
        strategy.new_state(), train_pool, val_pool
    )
    # Every strategy-created loader released its decode-pool ref
    # (_acquire_shared_executor's MUST-pair contract).
    assert pipeline._EXECUTOR_REFS == refs_before
    # checkpoints + config dump + metrics written
    ckpt_dir = os.path.join(
        str(tmp_path), "TEST", "FULLY_SUPERVISED", "checkpoints"
    )
    assert os.path.isdir(os.path.join(ckpt_dir, "CKPT-FINAL"))
    assert glob.glob(os.path.join(ckpt_dir, "CKPT-E4-MKPE*"))
    assert os.path.isfile(
        os.path.join(str(tmp_path), "TEST", "FULLY_SUPERVISED", "config.yaml")
    )
    metrics = [
        json.loads(line)
        for line in open(
            os.path.join(
                str(tmp_path), "TEST", "FULLY_SUPERVISED", "summary", "metrics.jsonl"
            )
        )
    ]
    tags = {m["tag"] for m in metrics}
    assert {"lr", "3D MKPE", "loss/train"} <= tags
    assert any(t.startswith("3DPCK@") for t in tags)

    # rendered figures land as image records + PNG artifacts
    # (reference: strategy.py:808-848 PCK-curve images; visualization.py grids)
    images = [m for m in metrics if m.get("kind") == "image"]
    image_tags = {m["tag"] for m in images}
    assert "train/pred_vs_gt_heatmaps" in image_tags
    assert "train/keypoints_2d" in image_tags
    assert "3DPCK/average" in image_tags
    summary_dir = os.path.join(str(tmp_path), "TEST", "FULLY_SUPERVISED", "summary")
    for m in images[:3]:
        assert m["file"] and os.path.isfile(os.path.join(summary_dir, m["file"]))
    # perf + step-timer scalars are wired (SURVEY.md §5 profiling requirement)
    assert "perf/steps_per_sec" in tags

    # EVAL restores the final checkpoint and reports finite metrics.
    eval_cfg = cfg.clone()
    eval_cfg.EXPR_TYPE = "EVAL"
    eval_cfg.AL.INFERENCE.RESTORE_FROM = os.path.join(ckpt_dir, "CKPT-FINAL")
    result = ActiveLearningStrategy(eval_cfg).run_eval(
        ActiveLearningStrategy(eval_cfg).new_state(), build_dataset(eval_cfg, "test")
    )
    assert np.isfinite(result[-1]["mkpe"])
    assert len(result[-1]["pcks"]) == 5


def test_sal_loop_end_to_end(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "SAL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.ITERATIONS = 2
    cfg.AL.INITIAL_AMOUNT = 2
    cfg.AL.ITER_AMOUNT = 2
    cfg.SAL.NUM_FRAMES = [0, 2]
    cfg.SAL.INLIER_THRESHOLD = 0  # synthetic rigs have few views
    strategy = ActiveLearningStrategy(cfg)
    strategy.prepare_al_experiments()
    for iteration in range(cfg.AL.ITERATIONS):
        workflow.run_al_iteration(cfg, None, iteration)

    expr = os.path.join(str(tmp_path), "TEST")
    # guid logs exist and replay correctly
    for i in range(2):
        assert os.path.isfile(os.path.join(expr, "SAMPLED-GUID-ITER-%d" % i))
    sampled0 = json.load(open(os.path.join(expr, "SAMPLED-GUID-ITER-0")))
    sampled1 = json.load(open(os.path.join(expr, "SAMPLED-GUID-ITER-1")))
    assert len(sampled0) == 2 and len(sampled1) == 2
    assert not set(sampled0) & set(sampled1)
    sal_dict = json.load(open(os.path.join(expr, "SAL-DICT-ITER-1")))
    assert set(sal_dict.keys()) == {
        "al_metric", "sal_metric", "inlier_count", "pred_3d_keypoints", "mkpe",
    }
    # scored exactly the 6 frames still unlabeled at iteration 1
    assert len(sal_dict["al_metric"]) == 6
    # pseudo labels were attached (inlier threshold 0 admits everything)
    sal_guids = json.load(open(os.path.join(expr, "SAL-GUID-ITER-1")))
    assert 0 < len(sal_guids) <= 2
    assert not set(sal_guids) & set(sampled1)
    # per-iteration checkpoints exist
    for i in range(2):
        assert os.path.isdir(
            os.path.join(expr, "ITER-%d" % i, "checkpoints", "CKPT-FINAL")
        )

    # replay: a fresh pool restored to iteration 2 has 4 labeled frames
    pool = build_dataset(cfg, "train")
    pool = strategy.restore_dataset(pool, 2)
    assert len(pool.labeled_data) == 4
    assert len(pool.unlabeled_data) == 4


def test_al_eval_over_iterations(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "RANDOM"
    cfg.AL.ITERATIONS = 1
    cfg.AL.INITIAL_AMOUNT = 2
    strategy = ActiveLearningStrategy(cfg)
    strategy.prepare_al_experiments()
    workflow.run_al_iteration(cfg, None, 0)
    eval_cfg = cfg.clone()
    eval_cfg.EXPR_TYPE = "AL_EVAL"
    eval_cfg.AL.INFERENCE.TRAINING_EXPR_NAME = cfg.EXPR_NAME
    result = workflow.run_experiment_eval(eval_cfg, None)
    # True labeled size after iteration 0 = INITIAL_AMOUNT (the reference's
    # (1+i)*ITER_AMOUNT would claim 100 here — quirk fixed).
    assert list(result.keys()) == [2]
    assert np.isfinite(result[2]["mkpe"])


def test_sal_histograms_written_per_iteration(tree, tmp_path):
    """The per-iteration AL writer must receive sal/* histograms
    (reference: strategy.py:83-109)."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "SAL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.ITERATIONS = 2
    cfg.AL.INITIAL_AMOUNT = 2
    cfg.AL.ITER_AMOUNT = 2
    cfg.SAL.NUM_FRAMES = [0, 2]
    cfg.SAL.INLIER_THRESHOLD = 0
    strategy = ActiveLearningStrategy(cfg)
    strategy.prepare_al_experiments()
    for iteration in range(2):
        workflow.run_al_iteration(cfg, None, iteration)
    records = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path), "TEST", "AL", "metrics.jsonl"))
    ]
    tags = {r["tag"] for r in records}
    assert "sal/al_metric" in tags
    assert "sal/sal_metric" in tags
    assert "sal/al_num_frames" in tags


def _run_sal_loop(tree, log_dir, mesh):
    cfg = _tiny_cfg(tree, log_dir)
    cfg.EXPR_TYPE = "SAL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.ITERATIONS = 2
    cfg.AL.INITIAL_AMOUNT = 2
    cfg.AL.ITER_AMOUNT = 2
    cfg.SAL.NUM_FRAMES = [0, 2]
    cfg.SAL.INLIER_THRESHOLD = 0
    strategy = ActiveLearningStrategy(cfg, mesh)
    strategy.prepare_al_experiments()
    for iteration in range(2):
        workflow.run_al_iteration(cfg, mesh, iteration)
    return os.path.join(log_dir, "TEST")


def test_sal_loop_on_mesh(tree, tmp_path):
    """Full SAL iteration with batches sharded over a ('data'=2, 'view'=2)
    mesh: sharded training steps + sharded pool scoring end to end — and
    the mesh must not CHANGE the scoring: the trained checkpoint from the
    mesh run, scored over the same pool with and without the mesh, must
    produce the same sal_dict (same guids, same scores).

    Scoring is compared from ONE set of weights because training itself is
    not bit-reproducible across layouts (GSPMD psum reduction order drifts
    the weights; a hard-argmax decode then flips discontinuously), but
    scoring — loader sharding, batch padding, device placement, result
    gathering — must be layout-invariant (reference all_gather contract:
    strategy.py:1106-1147).  Components are pinned one level down
    (test_sharding.py::test_sharded_score_step_matches_single_device);
    this asserts the equality at the product level."""
    from multi_view_active_learning_tpu import parallel
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.utils import checkpoint as ckpt

    mesh = parallel.make_mesh(2, 2, devices=__import__("jax").devices()[:4])
    expr_mesh = _run_sal_loop(tree, str(tmp_path / "mesh"), mesh)

    sal_dict = json.load(open(os.path.join(expr_mesh, "SAL-DICT-ITER-1")))
    assert len(sal_dict["al_metric"]) == 6
    vals = np.asarray(list(sal_dict["al_metric"].values()))
    assert np.isfinite(vals).all()
    final = os.path.join(expr_mesh, "ITER-1", "checkpoints", "CKPT-FINAL")
    assert os.path.isdir(final)

    cfg = _tiny_cfg(tree, str(tmp_path / "score"))
    cfg.AL.STRATEGY = "TRIANGULATION"
    sal_by_layout = {}
    for label, m in (("mesh", mesh), ("single", None)):
        strategy = ActiveLearningStrategy(cfg, m)
        pool = build_dataset(cfg, "train")
        pool.resample_unlabeled_data()
        state = ckpt.restore_params_only(final, strategy.new_state())
        sal_by_layout[label] = strategy._compute_sal_dict(pool, state)
    got, want = sal_by_layout["mesh"], sal_by_layout["single"]
    assert list(got["al_metric"]) == list(want["al_metric"])
    for key in ("al_metric", "sal_metric", "inlier_count", "mkpe"):
        for guid, v in want[key].items():
            assert got[key][guid] == pytest.approx(
                v, rel=1e-4, abs=1e-4
            ), (key, guid)


def test_restore_from_resumes_optimizer_and_step(tree, tmp_path):
    """TRAIN.RESTORE_FROM is a true mid-training resume: params + optimizer
    state + step all continue (the reference saved but never restored the
    optimizer, strategy.py:713-721 — fixed here)."""
    import jax

    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.TRAIN.OPTIM.TOTAL_STEPS = 2
    cfg.TRAIN.LOG_EVERY_ITER = 2
    strategy = ActiveLearningStrategy(cfg)
    train_pool = build_dataset(cfg, "train")
    val_pool = build_dataset(cfg, "val")
    strategy.run_fully_supervised_training(
        strategy.new_state(), train_pool, val_pool
    )
    first_ckpt = os.path.join(
        str(tmp_path), "TEST", "FULLY_SUPERVISED", "checkpoints", "CKPT-FINAL"
    )
    assert os.path.isdir(first_ckpt)

    cfg2 = _tiny_cfg(tree, str(tmp_path))
    cfg2.EXPR_NAME = "TEST-RESUMED"
    cfg2.TRAIN.RESTORE_FROM = first_ckpt
    cfg2.TRAIN.OPTIM.TOTAL_STEPS = 4
    cfg2.TRAIN.LOG_EVERY_ITER = 2
    strategy2 = ActiveLearningStrategy(cfg2)
    strategy2.run_fully_supervised_training(
        strategy2.new_state(), build_dataset(cfg2, "train"), build_dataset(cfg2, "val")
    )
    run2 = os.path.join(str(tmp_path), "TEST-RESUMED", "FULLY_SUPERVISED")
    ckpts = os.listdir(os.path.join(run2, "checkpoints"))
    # resumed at step 2 -> the step-2 checkpoint belongs to run 1 only
    assert any(c.startswith("CKPT-E4-") for c in ckpts)
    assert not any(c.startswith("CKPT-E2-") for c in ckpts)
    # the saved final state carries the continued step counter
    restored = ckpt.restore_checkpoint(
        os.path.join(run2, "checkpoints", "CKPT-FINAL"),
        strategy2.new_state(),
    )
    assert int(jax.device_get(restored.step)) == 4
    # metrics only contain steps > 2 (no restart from zero)
    metrics = [
        json.loads(line)
        for line in open(os.path.join(run2, "summary", "metrics.jsonl"))
    ]
    steps = {m["step"] for m in metrics if m["tag"] == "loss/train"}
    assert steps == {4}


def test_final_checkpoint_saved_at_non_log_multiple(tree, tmp_path):
    """TOTAL_STEPS not a LOG_EVERY_ITER multiple: the trailing steps must
    still land in CKPT-FINAL (the reference saves only at log points and
    silently drops them, strategy.py:488-510)."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_NAME = "TESTFINAL"
    cfg.TRAIN.OPTIM.TOTAL_STEPS = 5  # LOG_EVERY_ITER is 4
    strategy = ActiveLearningStrategy(cfg)
    strategy.run_fully_supervised_training(
        strategy.new_state(), build_dataset(cfg, "train"), build_dataset(cfg, "val")
    )
    ckpt_dir = os.path.join(
        str(tmp_path), "TESTFINAL", "FULLY_SUPERVISED", "checkpoints"
    )
    assert glob.glob(os.path.join(ckpt_dir, "CKPT-E5-MKPE*"))
    import jax

    restored = ckpt.restore_checkpoint(
        os.path.join(ckpt_dir, "CKPT-FINAL"), strategy.new_state()
    )
    assert int(jax.device_get(restored.step)) == 5


def test_train_raises_on_empty_pool(tree, tmp_path):
    """An empty labeled pool must fail loudly, not spin forever."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.TRAIN.FULLY_SUPERVISED_FRAME_COUNT = 0
    strategy = ActiveLearningStrategy(cfg)
    with pytest.raises(RuntimeError, match="no batches"):
        strategy.run_fully_supervised_training(
            strategy.new_state(), build_dataset(cfg, "train"),
            build_dataset(cfg, "val"),
        )
