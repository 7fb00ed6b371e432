"""utils/storage.py: the pluggable-storage layer (the reference's iopath
PathManager analog — reference strategy.py:681-711, dataset/config.py:12-25
manifold:// paths) must serve the REAL product paths from a non-local
backend.  Uses fsspec's process-local memory:// filesystem as the mock
remote: the synthetic Panoptic tree is copied into it, the dataset
indexes from it, the loader decodes JPEGs from it, scoring runs end to
end, and guid logs round-trip through it.

NUM_WORKERS=0 everywhere: memory:// is per-process, so the forkserver
decode pool must be bypassed (a real gs:// deployment has no such
constraint; workers open the bucket themselves)."""

import json
import os

import numpy as np
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.data.synthetic import (
    generate_panoptic_tree,
)
from multi_view_active_learning_tpu.utils import storage

NUM_JOINTS = 4


def test_local_paths_use_plain_os(tmp_path):
    p = tmp_path / "x.txt"
    with storage.open_file(str(p), "w") as f:
        f.write("hello")
    assert storage.exists(str(p))
    assert not storage.is_remote(str(p))
    assert storage.read_bytes(str(p)) == b"hello"
    assert storage.join(str(tmp_path), "a", "b") == os.path.join(
        str(tmp_path), "a", "b"
    )


def test_memory_backend_roundtrip():
    base = "memory://storage-unit"
    storage.makedirs(storage.join(base, "d"))
    with storage.open_file(storage.join(base, "d", "f.json"), "w") as f:
        json.dump({"a": 1}, f)
    assert storage.is_remote(base)
    assert storage.exists(storage.join(base, "d", "f.json"))
    assert not storage.exists(storage.join(base, "d", "missing"))
    with storage.open_file(storage.join(base, "d", "f.json")) as f:
        assert json.load(f) == {"a": 1}
    assert "f.json" in storage.listdir(storage.join(base, "d"))
    # binary + cross-backend copy
    with storage.open_file(storage.join(base, "blob"), "wb") as f:
        f.write(b"\x00\x01\x02")
    assert storage.read_bytes(storage.join(base, "blob")) == b"\x00\x01\x02"


def test_copytree_local_to_memory(tmp_path):
    src = tmp_path / "tree"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("A")
    (src / "sub" / "b.txt").write_text("B")
    dst = "memory://storage-copytree/dst"
    storage.copytree(str(src), dst)
    assert storage.read_bytes(storage.join(dst, "a.txt")) == b"A"
    assert storage.read_bytes(storage.join(dst, "sub", "b.txt")) == b"B"
    # and back out
    out = tmp_path / "back"
    storage.copytree(dst, str(out))
    assert (out / "sub" / "b.txt").read_text() == "B"


@pytest.fixture(scope="module")
def memory_tree(tmp_path_factory):
    local = generate_panoptic_tree(
        str(tmp_path_factory.mktemp("synth") / "tree"),
        num_train_frames=4,
        num_val_frames=2,
        num_joints=NUM_JOINTS,
        num_cameras=4,
    )
    remote = "memory://storage-e2e/tree"
    storage.copytree(local, remote)
    return remote


def _cfg(memory_tree, log_dir):
    cfg = get_default_configs()
    cfg.DATA.TYPE = "synthetic"
    cfg.DATA.SYNTHETIC_ROOT = memory_tree
    cfg.DATA.NUM_JOINTS = NUM_JOINTS
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.POSE_ESTIMATOR.TYPE = "POSE_RESNET"
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.INT8_SCORING = False
    cfg.AL.STRATEGY = "TRIANGULATION"
    cfg.AL.INFERENCE.BATCH_SIZE = 2
    cfg.AL.INFERENCE.NUM_WORKERS = 0
    cfg.AL.ITER_AMOUNT = 2
    cfg.LOG_DIR = log_dir
    cfg.EXPR_NAME = "MEMFS"
    return cfg


def test_scoring_and_guid_logs_from_memory_fs(memory_tree):
    """Dataset index + JPEG decode + pool scoring + SAMPLED/SAL-DICT guid
    logs, all through memory:// — the product flow a bucket deployment
    uses (minus checkpoints, which ride orbax's own gs:// support)."""
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.strategy import (
        ActiveLearningStrategy,
    )

    cfg = _cfg(memory_tree, "memory://storage-e2e/logs")
    strategy = ActiveLearningStrategy(cfg)
    pool = build_dataset(cfg, "train")
    pool.resample_unlabeled_data()
    assert len(pool.unlabeled_data) == 4

    state = strategy.new_state()
    sal = strategy._compute_sal_dict(pool, state)
    assert len(sal["al_metric"]) == 4
    assert np.isfinite(list(sal["al_metric"].values())).all()

    # Selection writes its guid logs to the remote log dir...
    pool = strategy.sample_next_batch(
        pool, al_num_frames=2, sal_num_frames=0, state=state, iteration=0
    )
    sampled_path = storage.join(
        cfg.LOG_DIR, cfg.EXPR_NAME, "SAMPLED-GUID-ITER-0"
    )
    assert storage.exists(sampled_path)
    with storage.open_file(sampled_path) as f:
        guids = json.loads(f.readline())
    assert len(guids) == 2 and len(pool.labeled_data) == 2

    # ...and restore_dataset replays them from it.
    pool2 = build_dataset(cfg, "train")
    pool2.resample_unlabeled_data()
    pool2 = strategy.restore_dataset(pool2, iteration=1)
    assert sorted(f["guid"] for f in pool2.labeled_data) == sorted(
        f["guid"] for f in pool.labeled_data
    )


def test_file_uri_routes_through_fsspec(tmp_path):
    """file:// URIs must resolve to the real filesystem path (via fsspec),
    not be treated as a literal relative name by the os fast path."""
    p = tmp_path / "sub" / "x.txt"
    uri = "file://" + str(p)
    assert storage.is_remote(uri)
    with storage.open_file(uri, "w") as f:
        f.write("via-uri")
    assert p.read_text() == "via-uri"  # landed at the real path
    assert storage.exists(uri)
    assert storage.read_bytes(uri) == b"via-uri"


def test_copy_streams_across_backends(tmp_path):
    """copy() must work in all four direction combinations and create
    parent dirs; remote endpoints use fsspec's chunked file transfer."""
    pytest.importorskip("fsspec")
    src = tmp_path / "a.bin"
    payload = bytes(range(256)) * 1024  # 256 KiB
    src.write_bytes(payload)

    storage.copy(str(src), "memory://cpy/up/a.bin")  # local -> remote
    assert storage.read_bytes("memory://cpy/up/a.bin") == payload
    storage.copy("memory://cpy/up/a.bin", "memory://cpy/b/a.bin")  # r -> r
    assert storage.read_bytes("memory://cpy/b/a.bin") == payload
    dst = tmp_path / "down" / "a.bin"
    storage.copy("memory://cpy/b/a.bin", str(dst))  # remote -> local
    assert dst.read_bytes() == payload


def test_metrics_writer_remote_log_dir_shards():
    """Object stores cannot append: each remote MetricsWriter attachment
    streams a fresh numbered metrics-NNN.jsonl shard, and re-attachment
    EXTENDS the record (the AL writer re-attaches per iteration)."""
    pytest.importorskip("fsspec")
    from multi_view_active_learning_tpu.utils.metrics_writer import (
        MetricsWriter,
    )

    log_dir = "memory://mw/logs"
    w1 = MetricsWriter(log_dir)
    w1.add_scalar("a", 1.0, 0)
    w1.close()
    w2 = MetricsWriter(log_dir)  # re-attach: new shard, no truncation
    w2.add_scalar("b", 2.0, 1)
    w2.close()

    shards = [n for n in storage.listdir(log_dir)
              if n.startswith("metrics-") and n.endswith(".jsonl")]
    assert shards == ["metrics-000.jsonl", "metrics-001.jsonl"]
    records = []
    for name in shards:
        with storage.open_file(storage.join(log_dir, name)) as f:
            records += [json.loads(line) for line in f if line.strip()]
    assert [r["tag"] for r in records] == ["a", "b"]


def test_listdir_missing_remote_prefix_is_empty():
    """Object stores have no directory objects: a prefix nothing has been
    written under "does not exist" even right after makedirs (a no-op on
    gcsfs/s3fs), and fsspec's ls raises FileNotFoundError.  Empty is the
    truthful listing."""
    pytest.importorskip("fsspec")
    assert storage.listdir("memory://listdir/never_created") == []


def test_metrics_writer_fresh_remote_prefix(monkeypatch):
    """First writer attach to a brand-new remote log dir must survive the
    shard scan (regression: gcsfs-style backends crashed in __init__ via
    listdir because makedirs cannot materialize a directory object there;
    memory:// CAN, so emulate the no-op)."""
    pytest.importorskip("fsspec")
    from multi_view_active_learning_tpu.utils.metrics_writer import (
        MetricsWriter,
    )

    monkeypatch.setattr(storage, "makedirs", lambda path: None)
    log_dir = "memory://mw/fresh_prefix_never_touched"
    w = MetricsWriter(log_dir)
    w.add_scalar("a", 1.0, 0)
    w.close()
    assert [n for n in storage.listdir(log_dir) if n.endswith(".jsonl")] == [
        "metrics-000.jsonl"
    ]


def test_metrics_writer_close_propagates_upload_failure():
    """On remote backends close() IS the upload (fsspec buffered writers
    flush on close) — the explicit close path must PROPAGATE a failed
    upload, never swallow it; only the GC/exit finalizer is quiet."""
    pytest.importorskip("fsspec")
    from multi_view_active_learning_tpu.utils.metrics_writer import (
        MetricsWriter,
    )

    class Boom(Exception):
        pass

    class FailingClose:
        def __init__(self, inner):
            self._inner = inner

        def write(self, *a):
            return self._inner.write(*a)

        def flush(self):
            self._inner.flush()

        def close(self):
            raise Boom()

    w = MetricsWriter("memory://mw/close_prop")
    w._jsonl = FailingClose(w._jsonl)
    with pytest.raises(Boom):
        w.close()
