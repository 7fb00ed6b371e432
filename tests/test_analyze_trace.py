"""tools/analyze_trace.py: trace.json parsing + per-op aggregation.

The analyzer is the round-5 instrument behind the HRNet fused-BasicBlock
closure and the DLT-Gram fix (BENCH_NOTES round 5); it must keep parsing
the profiler's trace.json.gz device plane without the (broken-in-image)
tensorboard plugin.  Fixture: a hand-built two-step trace with one MXU op
and one VPU op, checking aggregation across steps and the VMEM-inflated
bytes pass-through.
"""

import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import analyze_trace


def _write_trace(tmp_path):
    events = [
        # Process metadata: one TPU device plane, one host plane.
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/host:CPU"}},
    ]
    # Two steps of two ops each on the device plane.
    for step in range(2):
        events.append({
            "ph": "X", "pid": 1, "tid": 1, "ts": step * 100.0, "dur": 50.0,
            "name": "fusion.1",
            "args": {
                "hlo_category": "convolution fusion",
                "model_flops": 1.0e9,
                "raw_bytes_accessed": 2.0e6,
                "tf_op": "jit(score)/conv_general_dilated",
                "source_stack": (
                    "/opt/venv/lib/python3.12/site-packages/flax/x.py:1:1\n"
                    "/root/repo/multi_view_active_learning_tpu/engine.py:10:2"
                ),
            },
        })
        events.append({
            "ph": "X", "pid": 1, "tid": 1, "ts": step * 100.0 + 60, "dur": 10.0,
            "name": "loop_fusion.2",
            "args": {
                "hlo_category": "loop fusion",
                "model_flops": 0,
                "bytes_accessed": 5.0e5,
                "tf_op": "jit(score)/reduce_sum",
                "source_stack": "",
            },
        })
    # A host-plane event that must be ignored.
    events.append({
        "ph": "X", "pid": 2, "tid": 1, "ts": 0.0, "dur": 999.0,
        "name": "host_thing", "args": {"hlo_category": "loop fusion"}})
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_load_op_rows_aggregates_steps(tmp_path):
    logdir = _write_trace(tmp_path)
    rows = {r["name"]: r for r in analyze_trace.load_op_rows(logdir)}
    assert set(rows) == {"fusion.1", "loop_fusion.2"}  # host plane ignored
    conv = rows["fusion.1"]
    assert conv["occ"] == 2
    assert conv["time_us"] == 100.0
    assert conv["flops"] == 2.0e9
    assert conv["bytes"] == 4.0e6
    # Innermost non-site-packages frame wins.
    assert conv["source"].startswith(
        "/root/repo/multi_view_active_learning_tpu/engine.py"
    )
    # bytes_accessed fallback when raw_bytes_accessed is absent.
    assert rows["loop_fusion.2"]["bytes"] == 1.0e6


def test_cli_match_and_rooflines(tmp_path):
    logdir = _write_trace(tmp_path)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "analyze_trace.py"),
         logdir, "--match", "conv_general"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "fusion.1" in out and "loop_fusion.2" not in out
    # 2 GFLOP in 100 us = 20 TFLOP/s; 4 MB in 100 us = 40 GB/s.
    assert "matched: 1 ops, 100.0 us" in out
    assert "20.0 TFLOP/s" in out
