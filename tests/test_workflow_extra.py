"""Additional experiment types end-to-end: CLUSTER, CORESET selection,
MPE scoring, SAL with KMeans cluster-balanced pseudo-labeling, and an
InterHand2.6M-schema run (42 joints, per-joint validity)."""

import json
import os

import numpy as np
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.data import build_dataset
from multi_view_active_learning_tpu.data.ih26m import InterHand26MDataset
from multi_view_active_learning_tpu.data.synthetic import (
    generate_ih26m_tree,
    generate_panoptic_tree,
)
from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

pytestmark = pytest.mark.heavy  # full experiments: fresh jit compiles

NUM_JOINTS, NUM_CAMS = 19, 4


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_extra")
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
    cfg.EXPR_NAME = "TESTX"
    return cfg


def test_cluster_pose_and_loss(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "CLUSTER"
    # POSE clustering: dump per-frame 3D keypoints.
    cfg.AL.CLUSTER.TYPE = "POSE"
    cfg.AL.CLUSTER.SAVE_PATH = os.path.join(str(tmp_path), "pose_clusters.json")
    strategy = ActiveLearningStrategy(cfg)
    strategy.cluster(strategy.new_state(), build_dataset(cfg, "train"))
    clusters = json.load(open(cfg.AL.CLUSTER.SAVE_PATH))
    assert len(clusters) == 8
    first = np.asarray(next(iter(clusters.values())))
    assert first.shape == (NUM_JOINTS, 3)

    # LOSS clustering: per-frame heatmap MSE.
    cfg2 = _tiny_cfg(tree, str(tmp_path))
    cfg2.EXPR_TYPE = "CLUSTER"
    cfg2.AL.CLUSTER.TYPE = "LOSS"
    cfg2.AL.CLUSTER.SAVE_PATH = os.path.join(str(tmp_path), "loss_clusters.json")
    s2 = ActiveLearningStrategy(cfg2)
    s2.cluster(s2.new_state(), build_dataset(cfg2, "train"))
    losses = json.load(open(cfg2.AL.CLUSTER.SAVE_PATH))
    assert len(losses) == 8
    assert all(np.isfinite(v) and v > 0 for v in losses.values())


def test_coreset_strategy_selection(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "CORESET"
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    state = strategy.new_state()
    # iteration 0 random seeding
    strategy.sample_next_batch(pool, 2, 0, state, 0)
    assert len(pool.labeled_data) == 2
    # iteration 1 uses coreset over predicted poses
    strategy.sample_next_batch(pool, 2, 0, state, 1)
    assert len(pool.labeled_data) == 4
    sampled = json.load(open(strategy._expr_dir("SAMPLED-GUID-ITER-1")))
    assert len(sampled) == 2


def test_coreset_embedding_features_avoid_duplicates(tree, tmp_path):
    """AL.CORESET_FEATURES=EMBEDDING selects by pooled CNN trunk features
    (engine.embed_step / score_step's shared forward): a frame whose
    images DUPLICATE an already-labeled frame has ~zero embedding distance
    to the covered set, so k-center greedy must leave it for last — even
    though its triangulated POSE (the default feature space) stays distinct
    because the duplicate keeps its own cameras."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "CORESET"
    cfg.AL.CORESET_FEATURES = "EMBEDDING"
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")

    guids = list(pool.unlabeled_data)
    labeled_guid, dup_guid = guids[0], guids[3]
    # Make dup_guid's views pixel-identical to the labeled frame's (path
    # AND crop box; cameras stay its own, so its triangulated POSE — the
    # default coreset feature — remains distinct from the labeled frame's).
    for cam, view in pool.unlabeled_data[dup_guid]["views"].items():
        src = pool.unlabeled_data[labeled_guid]["views"][cam]
        view["path"] = src["path"]
        view["box"] = src["box"]
    pool.label_by_frame_guids([labeled_guid])
    state = strategy.new_state()

    n_unlabeled = len(pool.unlabeled_data)
    al_guids, _, sal_dict = strategy._sal_pseudo_labeling(
        pool, n_unlabeled - 1, 0, state, 1
    )
    assert len(al_guids) == n_unlabeled - 1
    assert dup_guid not in al_guids  # the covered duplicate is left behind
    assert "embedding" not in sal_dict  # popped before any JSON dump


def test_coreset_embedding_candidacy_ignores_triangulation_nans(tree, tmp_path):
    """EMBEDDING-coreset candidacy filters in the feature space k-center
    actually runs in: a frame whose TRIANGULATION diverged (non-finite
    keypoints) but whose pooled embedding is finite stays a valid
    candidate (regression: the finiteness filter used to guard the unused
    pose array and over-dropped such frames)."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "CORESET"
    cfg.AL.CORESET_FEATURES = "EMBEDDING"
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    guids = list(pool.unlabeled_data)
    pool.label_by_frame_guids([guids[0]])
    state = strategy.new_state()

    poisoned = guids[1]
    real_compute = strategy._compute_sal_dict

    def poisoning(*args, **kwargs):
        sal = real_compute(*args, **kwargs)
        kp = np.asarray(sal["pred_3d_keypoints"][poisoned], dtype=np.float64)
        sal["pred_3d_keypoints"][poisoned] = np.full_like(kp, np.nan)
        return sal

    strategy._compute_sal_dict = poisoning
    n = len(pool.unlabeled_data)
    al_guids, _, _ = strategy._sal_pseudo_labeling(pool, n, 0, state, 1)
    assert poisoned in al_guids  # selecting ALL candidates must include it
    assert len(al_guids) == n


def test_mpe_strategy_scoring(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "MPE"
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    pool.resample_unlabeled_data()
    sal_dict = strategy._compute_sal_dict(pool, strategy.new_state())
    assert len(sal_dict["al_metric"]) == 8
    vals = np.asarray(list(sal_dict["al_metric"].values()))
    assert np.isfinite(vals).all() and (vals >= 0).all()


def test_sal_cluster_balanced_pseudo_labeling(tree, tmp_path):
    # Build a cluster file from GT poses, then run the KMeans-quota branch.
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "SAL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.SAL.INLIER_THRESHOLD = 0
    cfg.SAL.NUM_CLUSTERS = 2
    pool = build_dataset(cfg, "train")
    clusters = {
        f["guid"]: np.asarray(f["3d_keypoints"]).tolist()
        for f in pool.unlabeled_data.values()
    }
    cluster_path = os.path.join(str(tmp_path), "clusters.json")
    json.dump(clusters, open(cluster_path, "w"))
    cfg.SAL.CLUSTER_FILE_PATH = cluster_path

    strategy = ActiveLearningStrategy(cfg)
    assert strategy.kmeans is not None
    # The cluster assignment must be ONE batched predict over all candidate
    # poses, not a per-guid dispatch loop (the reference loops per guid,
    # strategy.py:973-991 — on a remote device that is minutes of dispatch
    # for a real pool).
    calls = []
    real_predict = strategy.kmeans.predict
    strategy.kmeans.predict = lambda feats: (
        calls.append(np.asarray(feats).shape), real_predict(feats)
    )[1]
    state = strategy.new_state()
    pool2 = build_dataset(cfg, "train")
    al_guids, sal_guids, sal_dict = strategy._sal_pseudo_labeling(
        pool2, 2, 2, state, iteration=1
    )
    assert len(calls) <= 1
    if calls:
        assert calls[0][0] > 1  # all candidates in one call
    assert len(al_guids) == 2
    assert 0 <= len(sal_guids) <= 2
    assert pool2.pseudo_label_guids == sal_guids
    for g in sal_guids:
        assert g not in al_guids


def test_ih26m_sal_round(tmp_path):
    root = generate_ih26m_tree(
        os.path.join(str(tmp_path), "ih"), num_frames=6, num_joints=42,
        num_cameras=4,
    )
    cfg = get_default_configs()
    cfg.DATA.TYPE = "ih26m"
    cfg.DATA.NUM_JOINTS = 42
    cfg.DATA.INPUT_WIDTH = 64
    cfg.DATA.INPUT_HEIGHT = 64
    cfg.DATA.IH26M.HOME = root
    cfg.DATA.IH26M.CAPTURE_RANGE = [0, 1]
    cfg.DATA.IH26M.NUM_VIEW_PER_FRAME = 4
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.AL.INFERENCE.BATCH_SIZE = 2
    cfg.LOG_DIR = str(tmp_path)
    cfg.EXPR_NAME = "IH"
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    strategy = ActiveLearningStrategy(cfg)
    assert strategy.joint_root_index == 21
    pool = build_dataset(cfg, "train")
    assert len(pool.unlabeled_data) == 6
    pool.resample_unlabeled_data()
    sal_dict = strategy._compute_sal_dict(pool, strategy.new_state())
    assert len(sal_dict["al_metric"]) == 6
    kp = np.asarray(next(iter(sal_dict["pred_3d_keypoints"].values())))
    assert kp.shape == (42, 3)


def test_evaluate_2d_pckh(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    strategy = ActiveLearningStrategy(cfg)
    val = build_dataset(cfg, "val")
    loader = strategy._prepare_val_dataset_for_eval(val)
    thresholds, pcks = strategy.evaluate_2d_pckh(strategy.new_state(), loader)
    assert len(thresholds) == 10
    assert len(pcks) == 10 and len(pcks[0]) == NUM_JOINTS
    flat = np.asarray(pcks)
    assert ((flat >= 0) & (flat <= 1)).all()


def test_save_init_weights_for_al(tree, tmp_path):
    cfg = _tiny_cfg(tree, str(tmp_path))
    strategy = ActiveLearningStrategy(cfg)
    path = strategy.save_init_weights_for_al(strategy.new_state())
    assert os.path.isdir(path)
    from multi_view_active_learning_tpu.utils import checkpoint as ckpt_utils

    restored = ckpt_utils.restore_params_only(path, strategy.new_state(salt=9))
    assert restored is not None


def test_previous_al_log_dir_restore(tree, tmp_path):
    """Elastic recovery: copy checkpoints + guid logs from a previous
    experiment and resume at START_ITER (reference: strategy.py:338-389,
    workflow.py:235-244)."""
    import glob as globlib

    from multi_view_active_learning_tpu import workflow

    # Run a 1-iteration SAL experiment to produce artifacts.
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "SAL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.ITERATIONS = 1
    cfg.AL.INITIAL_AMOUNT = 2
    cfg.SAL.NUM_FRAMES = [0]
    cfg.SAL.INLIER_THRESHOLD = 0
    strategy = ActiveLearningStrategy(cfg)
    strategy.prepare_al_experiments()
    workflow.run_al_iteration(cfg, None, 0)
    prev_dir = os.path.join(str(tmp_path), "TESTX")

    # New experiment resuming from the old artifacts at START_ITER=1.
    cfg2 = _tiny_cfg(tree, str(tmp_path))
    cfg2.EXPR_TYPE = "SAL"
    cfg2.EXPR_NAME = "RESUMED"
    cfg2.AL.START_ITER = 1
    cfg2.AL.PREVIOUS_AL_LOG_DIR = prev_dir
    s2 = ActiveLearningStrategy(cfg2)
    s2.prepare_al_experiments()
    s2._copy_previous_checkpoints()
    assert os.path.isdir(
        os.path.join(str(tmp_path), "RESUMED", "ITER-0", "checkpoints", "CKPT-FINAL")
    )
    assert os.path.isfile(os.path.join(str(tmp_path), "RESUMED", "SAMPLED-GUID-ITER-0"))
    # Pool replay picks up the copied guid log.
    pool = build_dataset(cfg2, "train")
    pool = s2.restore_dataset(pool, 1)
    assert len(pool.labeled_data) == 2
    # The copied checkpoint restores into a fresh state.
    from multi_view_active_learning_tpu.utils import checkpoint as ckpt_utils

    restored = ckpt_utils.restore_params_only(
        os.path.join(str(tmp_path), "RESUMED", "ITER-0", "checkpoints", "CKPT-FINAL"),
        s2.new_state(),
    )
    assert restored is not None


def test_hp_and_bsb_strategies_scoring(tree, tmp_path):
    for strat, agg_field in (("HP", "HP_CONFIG"), ("BSB", "BSB_CONFIG")):
        cfg = _tiny_cfg(tree, str(tmp_path))
        cfg.EXPR_TYPE = "AL"
        cfg.AL.STRATEGY = strat
        setattr(cfg.AL, agg_field, "STD")
        strategy = ActiveLearningStrategy(cfg)
        pool = build_dataset(cfg, "train")
        pool.resample_unlabeled_data()
        sal_dict = strategy._compute_sal_dict(pool, strategy.new_state())
        vals = np.asarray(list(sal_dict["al_metric"].values()))
        assert len(vals) == 8 and np.isfinite(vals).all(), strat


def test_random_strategy_within_sal_scores_pool(tree, tmp_path):
    """SAL + RANDOM still runs inference (unlike AL + RANDOM which
    shortcuts, reference strategy.py:918-923)."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "SAL"
    cfg.AL.STRATEGY = "RANDOM"
    cfg.SAL.INLIER_THRESHOLD = 0
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    al_guids, sal_guids, sal_dict = strategy._sal_pseudo_labeling(
        pool, 2, 2, strategy.new_state(), iteration=1
    )
    assert len(sal_dict["al_metric"]) == 8  # inference DID run
    vals = np.asarray(list(sal_dict["al_metric"].values()))
    assert ((vals >= 0) & (vals <= 1)).all()  # uniform randoms
    assert len(al_guids) == 2


def test_guid_format_matches_reference(cfg=None):
    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data.synthetic import generate_panoptic_tree
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        generate_panoptic_tree(td, num_train_frames=2, num_val_frames=2)
        c = get_default_configs()
        c.DATA.TYPE = "synthetic"
        c.DATA.SYNTHETIC_ROOT = td
        pool = build_dataset(c, "train")
        guid = next(iter(pool.unlabeled_data))
        # reference format: f"{pose[:6]}{pose[-1]}-{frame_id}"
        # (panoptic_dataset.py:67) for pose "171026_pose1"
        assert guid == "1710261-0"
        frame = pool.unlabeled_data[guid]
        assert frame["pose"] == 1710261


def test_device_crop_scoring_close_to_host_crop(tree, tmp_path):
    """DATA.DEVICE_CROP end to end: the scoring pass over full frames with
    on-device crop+resize produces per-frame metrics close to the host-crop
    pipeline (same weights, same pool; only the resampling filter differs)."""
    cfg = _tiny_cfg(tree, str(tmp_path))
    cfg.EXPR_TYPE = "AL"
    cfg.AL.STRATEGY = "TRIANGULATION"
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    pool.resample_unlabeled_data()
    state = strategy.new_state()
    host_dict = strategy._compute_sal_dict(pool, state)

    dc = _tiny_cfg(tree, str(tmp_path))
    dc.EXPR_TYPE = "AL"
    dc.AL.STRATEGY = "TRIANGULATION"
    dc.DATA.DEVICE_CROP = True
    strategy_dc = ActiveLearningStrategy(dc)
    pool_dc = build_dataset(dc, "train")
    pool_dc.resample_unlabeled_data()
    dc_dict = strategy_dc._compute_sal_dict(pool_dc, state)

    assert set(dc_dict["al_metric"]) == set(host_dict["al_metric"])
    a = np.asarray(list(host_dict["sal_metric"].values()))
    b = np.asarray(
        [dc_dict["sal_metric"][g] for g in host_dict["sal_metric"]]
    )
    assert np.isfinite(b).all()
    # Untrained-model heatmaps are nearly flat, so per-frame reprojection
    # metrics are noisy — demand agreement in scale, not bitwise equality.
    assert np.median(np.abs(a - b)) <= 0.35 * (np.median(np.abs(a)) + 1e-6)


def test_int8_scoring_product_path(tree, tmp_path):
    """TPU.INT8_SCORING through the product AL entry point: the scoring
    sweep calibrates on its first batch and scores every frame finite;
    agreement with the float path on the pool's top pick."""
    base = _tiny_cfg(tree, str(tmp_path))
    base.EXPR_TYPE = "AL"
    base.AL.STRATEGY = "TRIANGULATION"

    dicts = {}
    state = None
    for int8 in (False, True):
        cfg = base.clone()
        cfg.TPU.INT8_SCORING = int8
        strategy = ActiveLearningStrategy(cfg)
        pool = build_dataset(cfg, "train")
        pool.resample_unlabeled_data()
        if state is None:
            state = strategy.new_state()
        dicts[int8] = strategy._compute_sal_dict(pool, state)
    f32, i8 = dicts[False], dicts[True]
    assert set(i8["al_metric"]) == set(f32["al_metric"])
    vals = np.asarray(list(i8["al_metric"].values()))
    assert np.isfinite(vals).all()
    top_f32 = max(f32["al_metric"], key=f32["al_metric"].get)
    top_i8 = max(i8["al_metric"], key=i8["al_metric"].get)
    assert top_f32 == top_i8, (f32["al_metric"], i8["al_metric"])
