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
  python tools/analyze_trace.py /tmp/hrnet_trace [--match branch0_block] [--top 25]

Parses the device plane out of the trace's own trace.json.gz (the same
events profile_scoring.py's category summary reads): each complete event
carries `bytes_accessed`, `model_flops`, `hlo_category`, `tf_op` and a
`source_stack` pointing back into model code, which is everything the
roofline needs.  (tensorboard_plugin_profile's raw_to_tool_data converter
is broken against this image's TF build — AttributeError on
xspace_to_tools_data — so the .xplane.pb path is deliberately avoided.)
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_op_rows(logdir: str):
    """Aggregate device-plane ops from the newest trace.json.gz.

    Returns a list of per-op dicts: name, category, time_us (summed over
    occurrences/steps), flops, bytes, occ, tf_op, source (the innermost
    non-site-packages frame of the op's source_stack)."""
    traces = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        raise SystemExit("no *.trace.json.gz under %s" % logdir)
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    names = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in names.items() if n and "TPU" in n}

    rows = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args")
        if not a or "hlo_category" not in a:
            continue
        key = e.get("name")
        r = rows.get(key)
        if r is None:
            src = ""
            for line in str(a.get("source_stack", "")).splitlines():
                if line and "site-packages" not in line:
                    src = line.strip()
                    break
            r = rows[key] = {
                "name": key,
                "category": a["hlo_category"],
                "time_us": 0.0,
                "flops": 0.0,
                "bytes": 0.0,
                "occ": 0,
                "tf_op": str(a.get("tf_op", "")).rstrip(":"),
                "source": src or str(a.get("source", "")),
            }
        r["time_us"] += float(e.get("dur", 0.0))
        r["flops"] += float(a.get("model_flops", 0) or 0)
        r["bytes"] += float(a.get("raw_bytes_accessed",
                                  a.get("bytes_accessed", 0)) or 0)
        r["occ"] += 1
    return list(rows.values())


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir")
    parser.add_argument(
        "--match", default="",
        help="substring filter on op name / tf_op / source",
    )
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

    rows = load_op_rows(args.logdir)
    if not rows:
        raise SystemExit("no device ops in trace")
    total_time = sum(r["time_us"] for r in rows)

    picked = [
        r for r in rows
        if not args.match
        or args.match in r["name"]
        or args.match in r["tf_op"]
        or args.match in r["source"]
    ]
    picked.sort(key=lambda r: -r["time_us"])

    print(
        "%-20s %-22s %9s %7s %8s %7s %6s %6s %5s  %s"
        % ("op", "category", "time(us)", "share", "TFLOP/s", "GB/s",
           "%peakF", "%peakB", "occ", "tf_op")
    )
    for r in picked[: args.top]:
        t = r["time_us"]
        tfs = r["flops"] / (t * 1e-6) / 1e12 if t else 0.0
        gbs = r["bytes"] / (t * 1e-6) / 1e9 if t else 0.0
        print(
            "%-20s %-22s %9.1f %6.2f%% %8.1f %7.0f %5.0f%% %5.0f%% %5d  %s"
            % (
                r["name"][:20], r["category"][:22], t,
                100.0 * t / max(total_time, 1e-9), tfs, gbs,
                100.0 * tfs / args.peak_tflops,
                100.0 * gbs / args.peak_gbps,
                r["occ"],
                (r["tf_op"] or r["source"])[-70:],
            )
        )

    t_m = sum(r["time_us"] for r in picked)
    f_m = sum(r["flops"] for r in picked)
    b_m = sum(r["bytes"] for r in picked)
    print(
        "\nmatched: %d ops, %.1f us (%.2f%% of device time), "
        "%.2f GFLOP, %.1f MB accessed"
        % (len(picked), t_m, 100.0 * t_m / max(total_time, 1e-9),
           f_m / 1e9, b_m / 1e6)
    )
    if t_m:
        print(
            "matched aggregate: %.1f TFLOP/s (%.0f%% peak), %.0f GB/s "
            "(%.0f%% peak); pure-HBM floor for these bytes: %.1f us"
            % (
                f_m / (t_m * 1e-6) / 1e12,
                100.0 * f_m / (t_m * 1e-6) / 1e12 / args.peak_tflops,
                b_m / (t_m * 1e-6) / 1e9,
                100.0 * b_m / (t_m * 1e-6) / 1e9 / args.peak_gbps,
                b_m / args.peak_gbps / 1e3,
            )
        )
    print("total accounted device time: %.1f us across %d ops"
          % (total_time, len(rows)))

    # Roofline classification: an op is bandwidth-bound when its achieved
    # GB/s is a large fraction of peak while its FLOP/s is far from the
    # compute peak.
    bw_bound = [
        r for r in picked
        if r["time_us"]
        and r["bytes"] / (r["time_us"] * 1e-6) / 1e9 > 0.5 * args.peak_gbps
        and r["flops"] / (r["time_us"] * 1e-6) / 1e12
        < 0.4 * args.peak_tflops
    ]
    t_bw = sum(r["time_us"] for r in bw_bound)
    print(
        "bandwidth-bound (>50%% peak GB/s, <40%% peak FLOP/s): %d ops, "
        "%.1f us (%.2f%% of device time)"
        % (len(bw_bound), t_bw, 100.0 * t_bw / max(total_time, 1e-9))
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
