"""Two-process `jax.distributed` smoke: the multi-host bring-up path
(parallel.initialize_distributed) actually executes.

The reference rendezvouses NCCL ranks through a temp-file init_method
(reference: workflow.py:228-230) and shards data with DistributedSampler
(strategy.py:753).  The TPU-native equivalents are jax.distributed +
FrameLoader's num_shards/shard_index; this test runs BOTH across two real
processes (CPU platform, one device each, local TCP coordinator):

  * initialize_distributed(...) returns True, process_count() == 2;
  * a psum-style global reduction over the 2-device mesh agrees on every
    process (the DDP-gradient-all-reduce stand-in);
  * FrameLoader shards are disjoint and cover the pool exactly.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # spawns 2 jax processes, fresh compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["MVAL_REPO"])

    from multi_view_active_learning_tpu import parallel

    pid = int(os.environ["MVAL_PROC_ID"])
    ok = parallel.initialize_distributed(
        coordinator_address=os.environ["MVAL_COORD"],
        num_processes=2,
        process_id=pid,
    )
    assert ok, "initialize_distributed returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

    # Global reduction across both processes' devices (the psum the mesh
    # inserts for gradients).  Each process contributes process_id + 1;
    # the replicated sum must be 3 everywhere.
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), (parallel.DATA_AXIS,))
    x = jax.make_array_from_callback(
        (2,),
        NamedSharding(mesh, P(parallel.DATA_AXIS)),
        lambda idx: np.asarray([pid + 1.0], np.float32),
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(x)
    total = float(np.asarray(jax.device_get(total)))
    assert total == 3.0, total

    # Host-side coordination helpers: process 0's value wins on every
    # process (run-name agreement), and the KV barrier rendezvouses
    # without any device collective (checkpoint-write fencing).
    assert parallel.broadcast_string("smoke/stamp", "p%d" % pid) == "p0"
    # Re-broadcast under the SAME key: the per-key invocation counter must
    # hand out a fresh wire key (a second workflow.main() in one session
    # previously crashed on the write-once KV or read run 1's stale stamp).
    assert parallel.broadcast_string("smoke/stamp", "q%d" % pid) == "q0"
    parallel.process_barrier("smoke/barrier")

    # FrameLoader process-sharding (the DistributedSampler equivalent):
    # each process loads its strided subset of the same pool.
    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import FrameLoader

    class _Pool:
        data = [{"guid": "g%02d" % i} for i in range(7)]

    cfg = get_default_configs()
    loader = FrameLoader(
        _Pool(), cfg.DATA, 4, batch_size=2,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        prefetch=0,
    )
    shard_guids = [f["guid"] for f in _Pool.data[pid::2]]
    with open(os.environ["MVAL_OUT"], "w") as f:
        json.dump({"total": total, "guids": shard_guids,
                   "n_batches": len(loader)}, f)
    print("proc %d ok" % pid)
    """
)


_SCORING_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["MVAL_REPO"])

    from multi_view_active_learning_tpu.utils import enable_compilation_cache
    enable_compilation_cache("/tmp/jax_cache")

    from multi_view_active_learning_tpu import parallel

    pid = int(os.environ["MVAL_PROC_ID"])
    nprocs = int(os.environ.get("MVAL_NPROCS", "2"))
    assert parallel.initialize_distributed(
        coordinator_address=os.environ["MVAL_COORD"],
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs and len(jax.devices()) == nprocs

    # The XLA:CPU gloo collectives context does a ~30 s key-value exchange
    # on FIRST use, so the first collective must run while the processes
    # are still ALIGNED — i.e. right here, straight out of the
    # initialize_distributed rendezvous, BEFORE any of the minutes-long
    # per-process compiles this 1-core box serializes (at 4 workers the
    # model-init skew alone blows the 30 s window; observed, round 4).
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # One ('data'=nprocs, 'view'=1) mesh over EVERY process's device: each
    # process loads B=1 local batches from its own pool shard; _put
    # assembles the global B=nprocs batch; _fetch_global all-gathers
    # results.
    mesh = parallel.make_mesh(nprocs, 1)
    tiny = jax.make_array_from_callback(
        (nprocs,),
        NamedSharding(mesh, P(parallel.DATA_AXIS)),
        lambda idx: np.asarray([pid + 1.0], np.float32),
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(tiny)
    assert float(np.asarray(jax.device_get(total))) == nprocs * (nprocs + 1) / 2

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = os.environ["MVAL_TREE"]
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.POSE_ESTIMATOR.TYPE = "POSE_RESNET"
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.INT8_SCORING = False  # one compiled program per worker
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.INFERENCE.BATCH_SIZE = 1  # per-device
    cfg.AL.INFERENCE.NUM_WORKERS = 0  # in-process decode: lockstep matters
    cfg.LOG_DIR = os.environ["MVAL_LOG"]
    cfg.EXPR_NAME = "DIST-%d" % pid

    strategy = ActiveLearningStrategy(cfg, mesh)
    assert strategy._local_data_parallelism() == 1

    pool = build_dataset(cfg, "train")
    pool.resample_unlabeled_data()
    all_guids = sorted(f["guid"] for f in pool.data)
    # No collective in here: parallel.replicate_tree places local shards
    # directly (identical host values by construction), so the model-init
    # compile can skew processes freely.
    state = strategy.new_state()

    dummy = {
        "images": np.zeros((1, 2, 32, 32, 3), np.uint8),
        "proj": np.zeros((1, 2, 3, 4), np.float32),
        "jv": np.ones((1, 4), bool),
        "gt3": np.zeros((1, 4, 3), np.float32),
    }
    pairs = jnp.asarray(strategy.engine.pairs(2))
    # Warm-up EXECUTION at the sweep's exact shapes: trace + compile +
    # executable-load now, while skew does not matter — score_step over
    # data-sharded inputs has no cross-process collective (results stay
    # sharded until _fetch_global), so processes may pass through here
    # minutes apart under this box's 4-way compile contention.
    warm_out = strategy.engine.score_step(
        state.params,
        state.batch_stats,
        strategy._put(dummy["images"], view_axis=True),
        strategy._put(dummy["proj"], view_axis=True),
        strategy._put(dummy["jv"]),
        pairs,
        strategy._put(dummy["gt3"]),
        jax.random.PRNGKey(0),
        al_strategy=cfg.AL.STRATEGY,
        mpe_aggregate=cfg.AL.MPE_CONFIG,
        hp_aggregate=cfg.AL.HP_CONFIG,
        bsb_aggregate=cfg.AL.BSB_CONFIG,
        int8_scales=None,
    )
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("score_step_compiled", 600_000)
    # First process_allgather creates its OWN gloo context (distinct from
    # the psum's) with a hard ~30 s key-exchange deadline — do it NOW,
    # barrier-aligned, on the warm-up result tree (the sweep's exact
    # shapes), so sweep-time fetches reuse context and executables.
    strategy._fetch_global(warm_out)
    _dist.global_state.client.wait_at_barrier("allgather_warm", 600_000)

    sal = strategy._compute_sal_dict(pool, state)

    with open(os.environ["MVAL_OUT"], "w") as f:
        json.dump(
            {
                "guids": sorted(sal["al_metric"]),
                "pool_guids": all_guids,
                "al_metric": dict(sal["al_metric"]),
                "inliers": dict(sal["inlier_count"]),
            },
            f,
        )
    print("scoring proc %d ok" % pid)
    """
)


_TRAIN_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["MVAL_REPO"])

    from multi_view_active_learning_tpu.utils import enable_compilation_cache
    enable_compilation_cache("/tmp/jax_cache")

    from multi_view_active_learning_tpu import parallel

    pid = int(os.environ["MVAL_PROC_ID"])
    assert parallel.initialize_distributed(
        coordinator_address=os.environ["MVAL_COORD"],
        num_processes=2,
        process_id=pid,
    )

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = os.environ["MVAL_TREE"]
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.DATA.EPOCH_SIZE = 4
    cfg.POSE_ESTIMATOR.TYPE = "POSE_RESNET"
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.INT8_SCORING = False
    cfg.TRAIN.BATCH_SIZE = 1      # per-device
    cfg.TRAIN.VAL_SIZE = 1
    cfg.TRAIN.NUM_WORKERS = 0
    cfg.AL.INFERENCE.BATCH_SIZE = 1
    cfg.AL.INFERENCE.NUM_WORKERS = 0
    cfg.TRAIN.OPTIM.TOTAL_STEPS = 2
    cfg.TRAIN.LOG_EVERY_ITER = 2  # one eval + checkpoint at step 2
    cfg.LOG_DIR = os.environ["MVAL_LOG"]
    cfg.EXPR_NAME = "DIST-TRAIN"

    mesh = parallel.make_mesh(2, 1)
    strategy = ActiveLearningStrategy(cfg, mesh)

    # Create the gloo collectives context while the processes are aligned
    # (see the scoring worker: its FIRST use pays a 30 s key-value
    # exchange), then rendezvous at a KV barrier so the training loop's
    # compiles start in lockstep.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    tiny = strategy._put(np.full((1,), pid + 1.0, np.float32))
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(tiny)
    assert float(np.asarray(jax.device_get(total))) == 3.0
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("train_start", 300_000)

    train_pool = build_dataset(cfg, "train")
    val_pool = build_dataset(cfg, "val")
    train_pool.label_all()
    state = strategy.new_state()
    state = strategy._train(-1, cfg, train_pool, val_pool, state)
    step = int(np.asarray(jax.device_get(state.step)))

    # Both processes evaluate the full (1-frame) validation set: the val
    # pool shards 1 frame over 2 processes, so one process steps through a
    # fully PADDED eval batch and the results come back all-gathered.
    val_loader = strategy._prepare_val_dataset_for_eval(val_pool)
    res = strategy._evaluate_all(0, state, val_loader)

    ckpt_final = os.path.join(
        cfg.LOG_DIR, cfg.EXPR_NAME, "checkpoints", "CKPT-FINAL"
    )
    with open(os.environ["MVAL_OUT"], "w") as f:
        json.dump(
            {
                "step": step,
                "mkpe": float(res["mkpe"]),
                "ckpt_final": os.path.isdir(ckpt_final),
            },
            f,
        )
    print("train proc %d ok" % pid)
    """
)


_SAL_ITERATION_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["MVAL_REPO"])

    from multi_view_active_learning_tpu.utils import enable_compilation_cache
    enable_compilation_cache("/tmp/jax_cache")

    from multi_view_active_learning_tpu import parallel

    pid = int(os.environ["MVAL_PROC_ID"])
    assert parallel.initialize_distributed(
        coordinator_address=os.environ["MVAL_COORD"],
        num_processes=2,
        process_id=pid,
    )

    from multi_view_active_learning_tpu.config import get_default_configs
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy
    from multi_view_active_learning_tpu.utils import checkpoint as ckpt

    cfg = get_default_configs()
    cfg.EXPR_TYPE = "SAL"
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = os.environ["MVAL_TREE"]
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.DATA.EPOCH_SIZE = 4
    cfg.POSE_ESTIMATOR.TYPE = "POSE_RESNET"
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.INT8_SCORING = False
    cfg.TRAIN.BATCH_SIZE = 1      # per-device
    cfg.TRAIN.VAL_SIZE = 1
    cfg.TRAIN.NUM_WORKERS = 0
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.INITIAL_AMOUNT = 2
    cfg.AL.ITER_AMOUNT = 2
    cfg.AL.ITERATIONS = 2
    cfg.AL.INFERENCE.BATCH_SIZE = 1
    cfg.AL.INFERENCE.NUM_WORKERS = 0
    cfg.SAL.NUM_FRAMES = [0, 2]
    cfg.SAL.INLIER_THRESHOLD = -1  # 2 cameras -> at most 2 inliers
    cfg.TRAIN.OPTIM.TOTAL_STEPS = 2
    cfg.TRAIN.LOG_EVERY_ITER = 2
    cfg.LOG_DIR = os.environ["MVAL_LOG"]
    cfg.EXPR_NAME = "DIST-SAL"

    mesh = parallel.make_mesh(2, 1)

    # Gloo contexts while aligned (see the scoring worker), then lockstep.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    boot = ActiveLearningStrategy(cfg, mesh)
    tiny = boot._put(np.full((1,), pid + 1.0, np.float32))
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(tiny)
    assert float(np.asarray(jax.device_get(total))) == 3.0
    boot._fetch_global({"x": tiny})
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("sal_start", 600_000)

    def snapshot(pool):
        return {
            "labeled": sorted(f["guid"] for f in pool.labeled_data),
            "pseudo": sorted(pool.pseudo_label_guids),
            "unlabeled": sorted(pool.unlabeled_data),
        }

    # ---- iteration 0 (workflow.run_al_iteration flow, inlined so the
    # pool is inspectable between stages) ----
    it0 = cfg.clone(); it0.AL.CURRENT_ITER = 0
    s0 = ActiveLearningStrategy(it0, mesh)
    state = s0.new_state(salt=0)
    pool0 = build_dataset(it0, "train")
    val0 = build_dataset(it0, "val")
    pool0 = s0.restore_dataset(pool0, 0)
    pool0 = s0.sample_next_batch(pool0, cfg.AL.INITIAL_AMOUNT, 0, state, 0)
    snap0 = snapshot(pool0)
    s0.al_iteration(s0.new_state(salt=1000), pool0, val0, 0)

    # ---- iteration 1: scorer restore -> guid replay -> score/select/
    # pseudo-label -> train ----
    it1 = cfg.clone(); it1.AL.CURRENT_ITER = 1
    s1 = ActiveLearningStrategy(it1, mesh)
    state1 = s1.new_state(salt=1)
    restore = os.path.join(
        cfg.LOG_DIR, cfg.EXPR_NAME, "ITER-0", "checkpoints", "CKPT-FINAL"
    )
    state1 = s1._maybe_replicate(ckpt.restore_params_only(restore, state1))
    pool1 = build_dataset(it1, "train")
    val1 = build_dataset(it1, "val")
    pool1 = s1.restore_dataset(pool1, 1)
    assert sorted(f["guid"] for f in pool1.labeled_data) == snap0["labeled"]
    pool1 = s1.sample_next_batch(
        pool1, cfg.AL.ITER_AMOUNT, cfg.SAL.NUM_FRAMES[1], state1, 1
    )
    snap1 = snapshot(pool1)
    s1.al_iteration(s1.new_state(salt=1001), pool1, val1, 1)

    # ---- iteration 2 start: replay-restore + a second scoring sweep ----
    it2 = cfg.clone(); it2.AL.CURRENT_ITER = 2
    s2 = ActiveLearningStrategy(it2, mesh)
    state2 = s2.new_state(salt=2)
    restore = os.path.join(
        cfg.LOG_DIR, cfg.EXPR_NAME, "ITER-1", "checkpoints", "CKPT-FINAL"
    )
    state2 = s2._maybe_replicate(ckpt.restore_params_only(restore, state2))
    pool2 = build_dataset(it2, "train")
    pool2 = s2.restore_dataset(pool2, 2)
    snap2 = snapshot(pool2)
    pool2.resample_unlabeled_data()
    sal2 = s2._compute_sal_dict(pool2, state2, 2)

    with open(os.environ["MVAL_OUT"], "w") as f:
        json.dump(
            {"snap0": snap0, "snap1": snap1, "snap2": snap2,
             "sal2": dict(sal2["al_metric"])},
            f,
        )
    print("sal-iteration proc %d ok" % pid)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _drain_workers(procs, timeout):
    """communicate() with every worker; on timeout KILL them all first.

    TimeoutExpired alone leaves the workers running — two orphaned jax
    processes then own the box's single core for many minutes, and every
    later in-process mesh collective in the suite starves past XLA:CPU's
    hard 40 s rendezvous termination, SIGABRTing pytest itself (observed:
    one cold-cache timeout here aborted the suite 17 tests later)."""
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.communicate()  # reap; the test fails via the raise below
        raise
    return logs


def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    outs = [str(tmp_path / ("out%d.json" % i)) for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            MVAL_REPO=REPO,
            MVAL_PROC_ID=str(pid),
            MVAL_COORD="localhost:%d" % port,
            MVAL_OUT=outs[pid],
            JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
        )
        env.pop("XLA_FLAGS", None)  # no 8-device override in the workers
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = _drain_workers(procs, timeout=900)  # cold-cache concurrent compiles
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.load(open(o)) for o in outs]
    assert all(r["total"] == 3.0 for r in results)
    shard0, shard1 = set(results[0]["guids"]), set(results[1]["guids"])
    assert not shard0 & shard1  # disjoint
    assert shard0 | shard1 == {"g%02d" % i for i in range(7)}  # covering
    assert results[0]["n_batches"] == 2 and results[1]["n_batches"] == 2


def _run_scoring_smoke(tmp_path, nprocs, timeout):
    """Launch `nprocs` scoring workers over a 5-frame pool and assert
    every process ends with the same COMPLETE sal_dict."""
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )

    tree = generate_panoptic_tree(
        str(tmp_path / "tree"), num_train_frames=5, num_val_frames=1,
        num_joints=4, num_cameras=2,
    )
    port = _free_port()
    worker_py = tmp_path / "scoring_worker.py"
    worker_py.write_text(_SCORING_WORKER)
    outs = [str(tmp_path / ("score_out%d.json" % i)) for i in range(nprocs)]
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update(
            MVAL_REPO=REPO,
            MVAL_PROC_ID=str(pid),
            MVAL_NPROCS=str(nprocs),
            MVAL_COORD="localhost:%d" % port,
            MVAL_OUT=outs[pid],
            MVAL_TREE=tree,
            MVAL_LOG=str(tmp_path / "logs"),
            JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
        )
        env.pop("XLA_FLAGS", None)  # 1 device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = _drain_workers(procs, timeout=timeout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.load(open(o)) for o in outs]
    r0 = results[0]
    # Complete: every pool guid scored, on EVERY process.
    assert r0["guids"] == r0["pool_guids"] and len(r0["guids"]) == 5
    for r in results[1:]:
        # Identical across processes (same global arrays, same all-gather).
        assert r["guids"] == r0["guids"]
        for guid in r0["al_metric"]:
            assert r["al_metric"][guid] == r0["al_metric"][guid]
            assert r["inliers"][guid] == r0["inliers"][guid]
    vals = np.asarray(list(r0["al_metric"].values()))
    assert np.isfinite(vals).all()


def test_two_process_pool_scoring(tmp_path):
    """The flagship scoring sweep (strategy._compute_sal_dict) across TWO
    real jax processes sharing one ('data'=2, 'view'=1) mesh: each process
    loads only its pool shard (5 frames -> 3+2, so one process steps
    through a fully PADDED tail batch), `_put` assembles global batches via
    make_array_from_process_local_data, and `_fetch_global` all-gathers the
    per-frame metrics — both processes must end up with the COMPLETE
    sal_dict, identically (the reference's NCCL sal_dict all_gather,
    reference: strategy.py:1090-1147)."""
    _run_scoring_smoke(tmp_path, 2, timeout=1200)  # cold-cache compiles


def test_four_process_pool_scoring(tmp_path):
    """The same sweep at FOUR processes: 5 frames shard 2+1+1+1, so the
    shard-equalization path (data/pipeline.py) must top the three short
    shards up with fully padded batches to keep every process in lockstep
    for the global batch assembly — paths a 2-process run never exercises
    with a non-empty tail on both sides."""
    _run_scoring_smoke(tmp_path, 4, timeout=1800)  # 4 concurrent compiles


def test_two_process_sal_iteration(tmp_path):
    """One FULL SAL iteration across TWO real jax processes — the seam the
    isolated scoring/training smokes never cross: `sample_next_batch` with
    process-0-only guid-log writes, every process independently mutating
    its own pool from the all-gathered sal_dict, ITER-0/ITER-1 training,
    `restore_dataset` replay into iteration 2, and a second scoring sweep.
    Both processes must agree on the labeled/pseudo pools at every stage
    (a nondeterministic selection order would silently diverge labeled
    sets between hosts — the reference's all-rank pool mutation semantics,
    reference: strategy.py:54-135,915-1002), the replayed pools must match
    the mutated ones, and the iteration-2 sal_dict must be identical."""
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )

    tree = generate_panoptic_tree(
        str(tmp_path / "tree"), num_train_frames=8, num_val_frames=1,
        num_joints=4, num_cameras=2,
    )
    port = _free_port()
    worker_py = tmp_path / "sal_worker.py"
    worker_py.write_text(_SAL_ITERATION_WORKER)
    outs = [str(tmp_path / ("sal_out%d.json" % i)) for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            MVAL_REPO=REPO,
            MVAL_PROC_ID=str(pid),
            MVAL_COORD="localhost:%d" % port,
            MVAL_OUT=outs[pid],
            MVAL_TREE=tree,
            MVAL_LOG=str(tmp_path / "logs"),
            JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
        )
        env.pop("XLA_FLAGS", None)  # 1 device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = _drain_workers(procs, timeout=1500)  # scoring + training compiles
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    r0, r1 = [json.load(open(o)) for o in outs]
    # Stage agreement across processes.
    assert r0["snap0"] == r1["snap0"]
    assert r0["snap1"] == r1["snap1"]
    assert r0["snap2"] == r1["snap2"]
    assert r0["sal2"] == r1["sal2"]
    # The iteration actually selected and pseudo-labeled.
    assert len(r0["snap0"]["labeled"]) == 2
    assert len(r0["snap1"]["labeled"]) == 4
    assert len(r0["snap1"]["pseudo"]) == 2
    # Guid-log replay reproduces the mutated labeled pool exactly, and the
    # SAL-GUID log restores the pseudo set (reference restore semantics).
    assert r0["snap2"]["labeled"] == r0["snap1"]["labeled"]
    assert r0["snap2"]["pseudo"] == r0["snap1"]["pseudo"]
    # Iteration-2 sweep scored every remaining unlabeled frame.
    assert sorted(r0["sal2"]) == r0["snap2"]["unlabeled"]
    assert np.isfinite(list(r0["sal2"].values())).all()


def test_two_process_training(tmp_path):
    """The training loop across TWO real jax processes on one
    ('data'=2, 'view'=1) mesh: per-process loaders feed the global
    train_step (GSPMD grad psum across hosts), the log-point eval
    all-gathers over a val pool so small one process only steps padded
    batches, and process 0 alone writes checkpoints.  Both processes must
    agree on the trained step count and the evaluation MKPE."""
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )

    tree = generate_panoptic_tree(
        str(tmp_path / "tree"), num_train_frames=4, num_val_frames=1,
        num_joints=4, num_cameras=2,
    )
    port = _free_port()
    worker_py = tmp_path / "train_worker.py"
    worker_py.write_text(_TRAIN_WORKER)
    outs = [str(tmp_path / ("train_out%d.json" % i)) for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            MVAL_REPO=REPO,
            MVAL_PROC_ID=str(pid),
            MVAL_COORD="localhost:%d" % port,
            MVAL_OUT=outs[pid],
            MVAL_TREE=tree,
            MVAL_LOG=str(tmp_path / "logs"),
            JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
        )
        env.pop("XLA_FLAGS", None)  # 1 device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = _drain_workers(procs, timeout=1200)  # cold-cache concurrent compiles
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    r0, r1 = [json.load(open(o)) for o in outs]
    assert r0["step"] == 2 and r1["step"] == 2
    assert np.isfinite(r0["mkpe"]) and r0["mkpe"] == r1["mkpe"]
    # Process 0 wrote the checkpoint; both see it on the (shared) log dir.
    assert r0["ckpt_final"] and r1["ckpt_final"]
