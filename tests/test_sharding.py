"""Multi-device sharding on the 8-device virtual CPU mesh: the dry-run
entry point, sharded-vs-unsharded scoring equivalence, and mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu import parallel
from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.engine import Engine
from multi_view_active_learning_tpu.ops import triangulate


def test_eight_virtual_devices_present():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = parallel.make_mesh(-1, 2)
    assert dict(mesh.shape) == {"data": 4, "view": 2}
    mesh = parallel.make_mesh(8, 1)
    assert dict(mesh.shape) == {"data": 8, "view": 1}
    with pytest.raises(ValueError):
        parallel.make_mesh(3, 2)  # 6 != 8


@pytest.mark.heavy
def test_dryrun_multichip():
    """The driver's multi-chip gate, in-suite.

    Inside pytest the backend is frozen, so dryrun_multichip re-execs an
    8-virtual-device subprocess WHILE the parent's own 8-device backend
    (plus suite worker threads) stays alive — on this 1-core box that
    oversubscription can starve an XLA:CPU collective past its hard 40 s
    rendezvous termination and SIGABRT the subprocess (observed once per
    ~2 cold-cache suite runs; the driver's standalone run of the same
    entry point is not oversubscribed and passes).  One retry: attempt 1
    populated the persistent compile cache, so attempt 2's execution
    window is far inside the rendezvous budget."""
    import subprocess

    import __graft_entry__ as graft

    try:
        graft.dryrun_multichip(8)
    except subprocess.CalledProcessError as e:
        if e.returncode != -6:  # anything but the rendezvous SIGABRT is real
            raise
        graft.dryrun_multichip(8)


def test_sharded_triangulation_matches_single_device():
    """The triangulation+metric stage produces identical decisions under a
    ('data', 'view') mesh.  Heatmaps are deterministic synthetic peaks so
    hard-argmax decode is unambiguous; a conv forward with sharded batches
    may legitimately differ in f32 reduction order, which would make a
    bitwise comparison of a full score_step flaky."""
    from helpers import synthetic_multiview_problem

    B, V, K, HM = 4, 4, 8, 64  # helper cameras assume a 256px image plane
    heatmaps, proj, pts3d, _ = synthetic_multiview_problem(
        B, V, K, HM, stride=4, seed=2
    )
    valid = np.ones((B, K), bool)
    pairs = jnp.asarray(triangulate.all_view_pairs(V))

    def run(hm_in, proj_in, valid_in):
        out = triangulate.triangulate_frames(
            hm_in, proj_in, valid_in, pairs, stride=4, method="power"
        )
        return jax.device_get(out)

    ref = run(*(jnp.asarray(a) for a in (heatmaps, proj, valid)))

    mesh = parallel.make_mesh(4, 2)
    sharded = run(
        jax.device_put(heatmaps, parallel.batch_sharding(mesh, 5)),
        jax.device_put(proj, parallel.batch_sharding(mesh, 4)),
        jax.device_put(valid, parallel.data_sharding(mesh, 2)),
    )
    np.testing.assert_array_equal(ref["inlier_count"], sharded["inlier_count"])
    np.testing.assert_allclose(ref["metric"], sharded["metric"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        ref["keypoints_3d"], sharded["keypoints_3d"], rtol=1e-3, atol=1e-2
    )
    err = np.linalg.norm(sharded["keypoints_3d"] - pts3d, axis=-1)
    assert err.max() < 5.0


@pytest.mark.heavy
def test_sharded_score_step_matches_single_device():
    """Full score_step (conv forward + triangulation + AL metric) compared
    between an unsharded run and a ('data'=4, 'view'=2) mesh run on the SAME
    params/inputs.  The conv forward may differ within f32 reduction-order
    noise, so comparisons use tolerances; the discrete decisions
    (inlier counts) must agree exactly."""
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    # Pin float: this test's contract is exact conv-forward equivalence
    # under the mesh (dryrun_multichip covers the int8-default path).
    cfg.TPU.INT8_SCORING = False
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    B, V, K = 4, 4, 4
    rng = np.random.default_rng(0)
    images = rng.normal(size=(B, V, 32, 32, 3)).astype(np.float32)
    proj = np.tile(
        np.array(
            [[300.0, 0, 16, 10], [0, 300.0, 16, 10], [0, 0, 1, 300.0]], np.float32
        ),
        (B, V, 1, 1),
    )
    valid = np.ones((B, K), bool)
    gt = rng.normal(size=(B, K, 3)).astype(np.float32)
    pairs = jnp.asarray(triangulate.all_view_pairs(V))
    key = jax.random.PRNGKey(3)

    def run(put):
        out = engine.score_step(
            state.params,
            state.batch_stats,
            put(images, parallel.batch_sharding(mesh, 5)),
            put(proj, parallel.batch_sharding(mesh, 4)),
            put(valid, parallel.data_sharding(mesh, 2)),
            pairs,
            put(gt, parallel.data_sharding(mesh, 3)),
            key,
            al_strategy="TRIANGULATION",
        )
        return jax.device_get(out)

    mesh = parallel.make_mesh(4, 2)
    ref = run(lambda a, _s: jnp.asarray(a))  # single-device
    sharded = run(jax.device_put)

    # The conv forward itself must be equivalent under the mesh: tight
    # tolerance on the heatmaps (only f32 reduction-order noise allowed).
    hm_ref = jax.device_get(
        engine.forward(state.params, state.batch_stats, jnp.asarray(images))
    )
    hm_sharded = jax.device_get(
        engine.forward(
            state.params,
            state.batch_stats,
            jax.device_put(images, parallel.batch_sharding(mesh, 5)),
        )
    )
    np.testing.assert_allclose(hm_ref, hm_sharded, rtol=1e-4, atol=1e-5)

    # Downstream decisions: discrete outcomes must agree exactly; continuous
    # metrics within the amplification an untrained-net argmax decode allows
    # (noise inputs make borderline peaks move by a cell).
    np.testing.assert_array_equal(ref["inlier_count"], sharded["inlier_count"])
    np.testing.assert_allclose(
        ref["keypoints_3d"], sharded["keypoints_3d"], rtol=0.05, atol=1.0
    )
    np.testing.assert_allclose(
        ref["al_metric"], sharded["al_metric"], rtol=0.15, atol=1e-3
    )
    assert np.isfinite(sharded["al_metric"]).all()
    assert (sharded["inlier_count"] >= 2).all()


def test_default_config_batches_shard_on_mesh():
    """Reference-default batch sizes must engage the mesh: BATCH_SIZE is
    per-device (DDP per-GPU semantics, reference workflow.py:133-138), the
    loader scales the global batch by the 'data' axis, and the placed batch
    carries a ('data', 'view') sharding — no silent single-device runs."""
    from jax.sharding import SingleDeviceSharding

    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    cfg = get_default_configs()  # TRAIN.BATCH_SIZE == 2 == reference default
    mesh = parallel.make_mesh(4, 2)
    strat = ActiveLearningStrategy(cfg, mesh)

    class _Pool:
        data = [None] * 32

    loader = strat._get_loader(_Pool(), cfg.TRAIN.BATCH_SIZE)
    assert loader.batch_size == cfg.TRAIN.BATCH_SIZE * 4  # x data axis
    B = loader.batch_size

    placed = strat._put(np.zeros((B, 4, 8, 8, 3), np.uint8), view_axis=True)
    assert placed.sharding.spec[:2] == ("data", "view")
    placed = strat._put(np.ones((B, 19), bool))
    assert placed.sharding.spec[0] == "data"
    # A view count that does not divide 'view' (e.g. 31 Panoptic cams on a
    # view=2 mesh) still shards the batch dim instead of going unsharded.
    placed = strat._put(np.zeros((B, 31, 8, 8, 3), np.uint8), view_axis=True)
    assert placed.sharding.spec[0] == "data"
    assert len(placed.sharding.spec) == 1 or placed.sharding.spec[1] is None
    # An indivisible batch dim is the loud-warning fallback.
    placed = strat._put(np.zeros((3, 19), np.float32))
    assert isinstance(placed.sharding, SingleDeviceSharding)
    assert strat._warned_shardings


def test_shard_batch_places_arrays():
    mesh = parallel.make_mesh(8, 1)
    batch = {
        "images": np.zeros((8, 2, 4, 4, 3), np.float32),
        "joint_valid": np.ones((8, 3), bool),
        "guid": ["a"] * 8,
    }
    out = parallel.shard_batch(mesh, batch, view_keys=("images",))
    assert out["guid"] == ["a"] * 8
    assert out["images"].sharding.spec[0] == "data"


def test_sharded_triangulation_view_major_mesh():
    """Same equivalence on a view-major ('data'=2, 'view'=4) mesh — the
    deployment shape for rigs where cameras outnumber frames per batch
    (e.g. 31-view Panoptic scoring on a pod slice)."""
    from helpers import synthetic_multiview_problem

    B, V, K, HM = 2, 8, 8, 64
    heatmaps, proj, pts3d, _ = synthetic_multiview_problem(
        B, V, K, HM, stride=4, seed=5
    )
    valid = np.ones((B, K), bool)
    pairs = jnp.asarray(triangulate.all_view_pairs(V))

    def run(hm_in, proj_in, valid_in):
        out = triangulate.triangulate_frames(
            hm_in, proj_in, valid_in, pairs, stride=4, method="power"
        )
        return jax.device_get(out)

    ref = run(*(jnp.asarray(a) for a in (heatmaps, proj, valid)))
    mesh = parallel.make_mesh(2, 4)
    assert dict(mesh.shape) == {"data": 2, "view": 4}
    sharded = run(
        jax.device_put(heatmaps, parallel.batch_sharding(mesh, 5)),
        jax.device_put(proj, parallel.batch_sharding(mesh, 4)),
        jax.device_put(valid, parallel.data_sharding(mesh, 2)),
    )
    np.testing.assert_array_equal(ref["inlier_count"], sharded["inlier_count"])
    np.testing.assert_allclose(ref["metric"], sharded["metric"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        ref["keypoints_3d"], sharded["keypoints_3d"], rtol=1e-3, atol=1e-2
    )
    err = np.linalg.norm(sharded["keypoints_3d"] - pts3d, axis=-1)
    assert err.max() < 5.0
