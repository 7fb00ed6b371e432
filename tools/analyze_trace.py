"""Per-op HBM-bytes / time / FLOPs analysis of a jax.profiler trace.

Settles memory-traffic questions (e.g. ROADMAP's HRNet fused-BasicBlock
item: would keeping the 64x64x32 branch-0 tile in VMEM across both 3x3
convs buy anything?) from the trace's own numbers instead of paper
arithmetic: for every HLO op the TPU device plane records duration,
model FLOPs, and bytes accessed — so each conv fusion can be classified
compute-bound vs bandwidth-bound against the chip's rooflines, and the
"HBM time attributable to inter-op intermediates" can be summed exactly.

Usage:
  python tools/profile_scoring.py --model HRNET --logdir /tmp/hrnet_trace
  python tools/analyze_trace.py /tmp/hrnet_trace [--match fusion] [--top 25]

Parses the .xplane.pb with tensorboard_plugin_profile's raw-to-tool
converter (needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python on this
image — set automatically below, BEFORE protobuf imports).
"""

import argparse
import glob
import json
import os
import sys

# Must be set before any *_pb2 import: the baked-in protoc-generated
# modules predate the installed protobuf's C++ fastpath requirements.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_hlo_stats(logdir: str):
    """Return a list of per-op dicts from the trace's hlo_stats tool."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not xplanes:
        raise SystemExit("no .xplane.pb under %s" % logdir)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", params={}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    # hlo_stats ships as gviz JSON ({"cols": [...], "rows": [...]}) or
    # data-table JSON depending on plugin version; normalize to dicts.
    obj = json.loads(data)
    if isinstance(obj, list):
        obj = obj[0]
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        rows.append(
            {cols[i]: (c or {}).get("v") for i, c in enumerate(r["c"])}
        )
    return rows


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir")
    parser.add_argument("--match", default="", help="substring filter on op name/expression")
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument(
        "--peak_tflops", type=float, default=197.0,
        help="chip peak TFLOP/s for the roofline column (v5e bf16 ~197)",
    )
    parser.add_argument(
        "--peak_gbps", type=float, default=819.0,
        help="chip HBM GB/s for the roofline column (v5e ~819)",
    )
    args = parser.parse_args()

    rows = load_hlo_stats(args.logdir)
    if not rows:
        raise SystemExit("hlo_stats empty")
    # Column names vary slightly by version; resolve by substring.
    keys = rows[0].keys()

    def col(*subs):
        for k in keys:
            lk = (k or "").lower()
            if all(s in lk for s in subs):
                return k
        return None

    c_name = col("hlo op name") or col("op name") or col("name")
    c_expr = col("expression") or c_name
    c_cat = col("category")
    c_time = col("total time") or col("occurrences time") or col("time (us)")
    c_flops = col("gflop")
    c_bw = col("gb/s") or col("bandwidth")
    c_occ = col("occurrence")
    print("columns:", sorted(keys), file=sys.stderr)

    def num(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return 0.0

    picked = []
    for r in rows:
        name = str(r.get(c_name, "")) + " " + str(r.get(c_expr, ""))
        if args.match and args.match not in name:
            continue
        picked.append(r)
    picked.sort(key=lambda r: -num(r.get(c_time)))

    total_time = sum(num(r.get(c_time)) for r in rows)
    print(
        "%-46s %-18s %10s %8s %9s %9s %6s"
        % ("op", "category", "time(us)", "share", "GFLOP/s", "GB/s", "occ")
    )
    for r in picked[: args.top]:
        t = num(r.get(c_time))
        print(
            "%-46s %-18s %10.1f %7.2f%% %9.1f %9.1f %6d"
            % (
                str(r.get(c_name))[:46],
                str(r.get(c_cat))[:18],
                t,
                100.0 * t / max(total_time, 1e-9),
                num(r.get(c_flops)) and num(r.get(c_flops)),
                num(r.get(c_bw)),
                num(r.get(c_occ)),
            )
        )
    print(
        "\ntotal accounted device time: %.1f us across %d ops"
        % (total_time, len(rows))
    )
    # Roofline classification for the picked set: an op is
    # bandwidth-bound when its achieved GB/s is a large fraction of peak
    # while its GFLOP/s is far from compute peak.
    bw_bound = [
        r for r in picked
        if num(r.get(c_bw)) > 0.5 * args.peak_gbps
        and num(r.get(c_flops)) < 0.4 * args.peak_tflops * 1e3
    ]
    t_bw = sum(num(r.get(c_time)) for r in bw_bound)
    print(
        "bandwidth-bound (>50%% peak GB/s, <40%% peak FLOP/s): %d ops, "
        "%.1f us (%.2f%% of device time)"
        % (len(bw_bound), t_bw, 100.0 * t_bw / max(total_time, 1e-9))
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
