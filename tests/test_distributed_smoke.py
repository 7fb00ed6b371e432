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


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


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
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.load(open(o)) for o in outs]
    assert all(r["total"] == 3.0 for r in results)
    shard0, shard1 = set(results[0]["guids"]), set(results[1]["guids"])
    assert not shard0 & shard1  # disjoint
    assert shard0 | shard1 == {"g%02d" % i for i in range(7)}  # covering
    assert results[0]["n_batches"] == 2 and results[1]["n_batches"] == 2
