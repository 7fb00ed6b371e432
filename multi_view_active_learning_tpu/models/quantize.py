"""Int8 quantized PoseResNet inference for the scoring/eval path.

The AL scoring pass consumes a *ranking* of frames, not raw activations —
it tolerates quantization noise that would matter for training.  On TPU
v5e the MXU's s8 x s8 -> s32 path has 2x the bf16 peak; a 12-layer conv
chain probe measured 1.66x end-to-end including requantization
(BENCH_NOTES.md round-2 int8 section), so the whole backbone runs int8
here:

  * weights: symmetric per-output-channel int8, computed in-graph from
    the f32 params (cheap: one pass over ~25M weights; keeping it inside
    the jitted step avoids any cache/staleness machinery);
  * activations: symmetric per-tensor int8.  Scales are either *dynamic*
    (max|x| / 127 per conv input, no calibration — but the data-dependent
    reduction serializes against the conv and costs ~10% end-to-end) or
    *static*: calibrated once per scoring sweep on the first batch
    (`collect_scales=True`), then passed back in (`act_scales=...`) so
    each quantize is a pure fused elementwise op.  Static scales measure
    276 vs 224 fps on the north-star bench (BENCH_NOTES.md);
  * BatchNorm: folded into the requantization multiplier, so each conv +
    BN (+ ReLU) is one int8 conv and one fused elementwise epilogue;
  * residual adds and the maxpool run in bf16 between blocks;
  * the deconv head and final 1x1 stay bf16/f32 (transposed conv lowers
    via input dilation, where the int8 MXU path does not apply — and the
    head is already at 77-87% MFU, BENCH_NOTES trace anatomy).

Enable with ``TPU.INT8_SCORING`` (engine.Engine.forward); training always
uses the standard float path.  Selection quality under int8 is pinned by
tests/test_quantize.py::test_int8_engine_scoring_preserves_ranking.

Reference contract: pose_estimators/pose_resnet.py:17-231 (topology);
this module mirrors models/pose_resnet.py's parameter tree exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pose_resnet import RESNET_SPEC, BasicBlock

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5


def _quant_weight(w: jnp.ndarray):
    """[kh, kw, ci, co] float -> (int8 weights, per-co float scale)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    ws = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    return wq, ws


class _ActScales:
    """Per-tensor activation scales: dynamic, static, or collecting.

    `scale_for(name, x)` returns the quantization scale for conv input
    `x`; with a static table it is a table lookup (pure elementwise
    epilogue downstream), otherwise max|x|/127 (recorded when
    collecting)."""

    def __init__(self, table=None, collect: bool = False):
        self.table = table
        self.collect = collect
        self.recorded = {}

    def scale_for(self, name: str, x: jnp.ndarray):
        if self.table is not None:
            return self.table[name]
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        sx = jnp.maximum(amax, 1e-8) / 127.0
        if self.collect:
            self.recorded[name] = sx
        return sx


def _quant_act(x: jnp.ndarray, sx):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    return xq.astype(jnp.int8)


def _bn_fold(params, stats):
    scale = params["scale"] / jnp.sqrt(stats["var"] + _BN_EPS)
    return scale, params["bias"] - stats["mean"] * scale


def _qconv_bn(
    x, conv_params, bn_params, bn_stats, scales, name,
    strides=(1, 1), padding=None, relu=True,
):
    """int8 conv + folded BN (+ ReLU), returning bf16."""
    w = conv_params["kernel"]
    kh = w.shape[0]
    if padding is None:
        padding = [(kh // 2, kh // 2)] * 2 if kh > 1 else [(0, 0)] * 2
    wq, ws = _quant_weight(w)
    sx = scales.scale_for(name, x)
    xq = _quant_act(x, sx)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    bscale, bbias = _bn_fold(bn_params, bn_stats)
    y = y.astype(jnp.float32) * (sx * ws * bscale) + bbias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def _fconv_bn(
    x, conv_params, bn_params, bn_stats,
    strides=(1, 1), padding=None, relu=True,
):
    """bf16 conv + folded BN (+ ReLU) — the float twin of _qconv_bn, used
    for the mixed-precision float tail (TPU.INT8_FLOAT_TAIL_STAGES)."""
    w = conv_params["kernel"].astype(jnp.bfloat16)
    kh = w.shape[0]
    if padding is None:
        padding = [(kh // 2, kh // 2)] * 2 if kh > 1 else [(0, 0)] * 2
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w, strides, padding, dimension_numbers=_DN,
    )
    bscale, bbias = _bn_fold(bn_params, bn_stats)
    y = y.astype(jnp.float32) * bscale + bbias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def _basic_block_f(x, p, s, prefix, strides, downsample):
    out = _fconv_bn(x, p["conv1"], p["bn1"], s["bn1"], (strides, strides))
    out = _fconv_bn(out, p["conv2"], p["bn2"], s["bn2"], relu=False)
    if downsample:
        residual = _fconv_bn(
            x, p["downsample_conv"], p["downsample_bn"], s["downsample_bn"],
            (strides, strides), relu=False,
        )
    else:
        residual = x
    return jnp.maximum(
        out.astype(jnp.float32) + residual.astype(jnp.float32), 0.0
    ).astype(jnp.bfloat16)


def _bottleneck_block_f(x, p, s, prefix, strides, downsample):
    out = _fconv_bn(x, p["conv1"], p["bn1"], s["bn1"])
    out = _fconv_bn(out, p["conv2"], p["bn2"], s["bn2"], (strides, strides))
    out = _fconv_bn(out, p["conv3"], p["bn3"], s["bn3"], relu=False)
    if downsample:
        residual = _fconv_bn(
            x, p["downsample_conv"], p["downsample_bn"], s["downsample_bn"],
            (strides, strides), relu=False,
        )
    else:
        residual = x
    return jnp.maximum(
        out.astype(jnp.float32) + residual.astype(jnp.float32), 0.0
    ).astype(jnp.bfloat16)


def _basic_block(x, p, s, scales, prefix, strides, downsample):
    out = _qconv_bn(
        x, p["conv1"], p["bn1"], s["bn1"], scales, prefix + "/conv1",
        (strides, strides),
    )
    out = _qconv_bn(
        out, p["conv2"], p["bn2"], s["bn2"], scales, prefix + "/conv2",
        relu=False,
    )
    if downsample:
        residual = _qconv_bn(
            x, p["downsample_conv"], p["downsample_bn"], s["downsample_bn"],
            scales, prefix + "/down", (strides, strides), relu=False,
        )
    else:
        residual = x
    return jnp.maximum(
        out.astype(jnp.float32) + residual.astype(jnp.float32), 0.0
    ).astype(jnp.bfloat16)


def _bottleneck_block(x, p, s, scales, prefix, strides, downsample):
    out = _qconv_bn(
        x, p["conv1"], p["bn1"], s["bn1"], scales, prefix + "/conv1"
    )
    out = _qconv_bn(
        out, p["conv2"], p["bn2"], s["bn2"], scales, prefix + "/conv2",
        (strides, strides),
    )
    out = _qconv_bn(
        out, p["conv3"], p["bn3"], s["bn3"], scales, prefix + "/conv3",
        relu=False,
    )
    if downsample:
        residual = _qconv_bn(
            x, p["downsample_conv"], p["downsample_bn"], s["downsample_bn"],
            scales, prefix + "/down", (strides, strides), relu=False,
        )
    else:
        residual = x
    return jnp.maximum(
        out.astype(jnp.float32) + residual.astype(jnp.float32), 0.0
    ).astype(jnp.bfloat16)


def quantized_pose_resnet_forward(
    params, batch_stats, images, num_layers: int,
    act_scales=None, collect_scales: bool = False,
    int8_head: bool = False,
    float_tail_stages: int = 0,
):
    """Int8 inference forward: images [N, H, W, 3] float (normalized) ->
    heatmaps [N, H/4, W/4, K] float32.

    Mirrors models/pose_resnet.py::PoseResNet.__call__(train=False) with
    the backbone convs in int8.  The deconv head runs bf16 by default (see
    module docstring); `int8_head=True` routes it through the fused int8
    Pallas phase-deconv kernel (ops/pallas/deconv.py::
    fused_deconv_bn_relu_int8) — transposed conv has no int8 MXU path in
    XLA, but the phase decomposition is dense 2x2 matmuls, which do.
    `act_scales`: static per-tensor scale table (the dict a
    `collect_scales=True` call returns); with `collect_scales=True` the
    return value is `(heatmaps, scales_dict)` for calibration.

    `float_tail_stages` (TPU.INT8_FLOAT_TAIL_STAGES): run the LAST n of the
    four residual stages in bf16 instead of int8 — the mixed-precision
    compromise for strategies that rank raw heatmap VALUES (MPE/BSB, which
    full-pipeline requant perturbs, Engine.INT8_SAFE_STRATEGIES): the
    late-stage features that shape peak masses stay float while the
    FLOP-heavy early stages keep the s8 MXU path."""
    block_cls, layer_sizes = RESNET_SPEC[num_layers]
    scales = _ActScales(act_scales, collect_scales)
    x = images.astype(jnp.bfloat16)

    # Stem: plain 7x7/s2, or — when the input arrives space-to-depth'd
    # ([N, H/2, W/2, 12], TPU.SPACE_TO_DEPTH_STEM) — the mathematically
    # exact dense 4x4/s1 remap (models/pose_resnet.py::SpaceToDepthStem
    # derivation).  Quantization commutes with the remap: it permutes /
    # zero-pads weights, so the per-output-channel scales are unchanged
    # and the s32 accumulation sums the same integer products.
    w = params["conv1"]["kernel"]
    if x.shape[-1] == 4 * w.shape[2]:
        wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w = wp.reshape(4, 2, 4, 2, w.shape[2], w.shape[3]).transpose(
            0, 2, 1, 3, 4, 5
        ).reshape(4, 4, 4 * w.shape[2], w.shape[3])
        stem_strides, stem_pad = (1, 1), [(2, 1), (2, 1)]
    else:
        stem_strides, stem_pad = (2, 2), [(3, 3), (3, 3)]
    wq, ws = _quant_weight(w)
    sx = scales.scale_for("stem", x)
    xq = _quant_act(x, sx)
    y = jax.lax.conv_general_dilated(
        xq, wq, stem_strides, stem_pad, dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    bscale, bbias = _bn_fold(params["bn1"], batch_stats["bn1"])
    x = jnp.maximum(y.astype(jnp.float32) * (sx * ws * bscale) + bbias, 0.0)
    x = x.astype(jnp.bfloat16)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    block_fn = _basic_block if block_cls is BasicBlock else _bottleneck_block
    float_fn = _basic_block_f if block_cls is BasicBlock else _bottleneck_block_f
    expansion = 1 if block_cls is BasicBlock else 4
    inplanes = 64
    for stage, (planes, blocks) in enumerate(
        zip((64, 128, 256, 512), layer_sizes)
    ):
        strides = 1 if stage == 0 else 2
        float_stage = stage >= 4 - int(float_tail_stages)
        for i in range(blocks):
            needs_down = i == 0 and (
                strides != 1 or inplanes != planes * expansion
            )
            name = f"layer{stage + 1}_{i}"
            if float_stage:
                x = float_fn(
                    x, params[name], batch_stats[name], name,
                    strides if i == 0 else 1, needs_down,
                )
            else:
                x = block_fn(
                    x,
                    params[name],
                    batch_stats[name],
                    scales,
                    name,
                    strides if i == 0 else 1,
                    needs_down,
                )
        inplanes = planes * expansion

    # Head: ConvTranspose + folded BN + ReLU — bf16 XLA by default, or the
    # fused int8 Pallas phase-deconv kernel.
    for i in range(3):
        bscale, bbias = _bn_fold(
            params[f"deconv_bn{i}"], batch_stats[f"deconv_bn{i}"]
        )
        if int8_head:
            from ..ops.pallas import deconv as pallas_deconv

            sx = scales.scale_for(f"deconv{i}", x)
            x = pallas_deconv.fused_deconv_bn_relu_int8(
                x, params[f"deconv{i}"]["kernel"], bscale, bbias, sx
            )
        else:
            x = jax.lax.conv_transpose(
                x,
                params[f"deconv{i}"]["kernel"].astype(jnp.bfloat16),
                (2, 2),
                "SAME",
                dimension_numbers=_DN,
            )
            x = jnp.maximum(x.astype(jnp.float32) * bscale + bbias, 0.0)
            x = x.astype(jnp.bfloat16)

    fl = params["final_layer"]
    x = x.astype(jnp.float32)
    out = (
        jnp.einsum("nhwc,ck->nhwk", x, fl["kernel"][0, 0].astype(jnp.float32))
        + fl["bias"].astype(jnp.float32)
    )
    if collect_scales:
        return out, scales.recorded
    return out


def _nearest_upsample(x, factor: int):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
    )
    return x.reshape(n, h * factor, w * factor, c)


def quantized_hrnet_forward(
    params, batch_stats, images,
    stage2, stage3, stage4, final_conv_kernel: int = 1,
    act_scales=None, collect_scales: bool = False,
):
    """Int8 inference forward for HRNet (models/hrnet.py topology, NHWC).

    Same quantization scheme as the PoseResNet path: int8 convs with
    folded BN, bf16 between ops, exchange-unit sums in f32, float final
    conv.  Stage tuples use the PoseHighResolutionNet encoding
    (num_modules, num_branches, block, num_blocks, num_channels)."""
    scales = _ActScales(act_scales, collect_scales)
    x = images.astype(jnp.bfloat16)

    # Stem: two stride-2 3x3 convs + BN + ReLU.
    for i in (1, 2):
        x = _qconv_bn(
            x, params[f"conv{i}"], params[f"bn{i}"], batch_stats[f"bn{i}"],
            scales, f"stem{i}", (2, 2),
        )

    # layer1: 4x Bottleneck(64).
    for i in range(4):
        name = f"layer1_{i}"
        x = _bottleneck_block(
            x, params[name], batch_stats[name], scales, name, 1, i == 0
        )

    def branch_blocks(xs, block, num_blocks, inchannels, out_channels,
                      num_channels, mname):
        blk = _basic_block if block == "BASIC" else _bottleneck_block
        ys = []
        for b in range(len(xs)):
            y = xs[b]
            for i in range(num_blocks[b]):
                needs_down = i == 0 and inchannels[b] != out_channels[b]
                bn = f"{mname}/branch{b}_block{i}"
                sub = params[mname][f"branch{b}_block{i}"]
                ssub = batch_stats[mname][f"branch{b}_block{i}"]
                y = blk(y, sub, ssub, scales, bn, 1, needs_down)
            ys.append(y)
        return ys

    def exchange(ys, out_channels, num_out, mname):
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(len(ys)):
                if j == i:
                    y = ys[j]
                elif j > i:
                    y = _qconv_bn(
                        ys[j],
                        params[mname][f"fuse{i}_{j}_conv"],
                        params[mname][f"fuse{i}_{j}_bn"],
                        batch_stats[mname][f"fuse{i}_{j}_bn"],
                        scales, f"{mname}/fuse{i}_{j}", relu=False,
                    )
                    y = _nearest_upsample(y, 2 ** (j - i))
                else:
                    y = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = _qconv_bn(
                            y,
                            params[mname][f"fuse{i}_{j}_conv{k}"],
                            params[mname][f"fuse{i}_{j}_bn{k}"],
                            batch_stats[mname][f"fuse{i}_{j}_bn{k}"],
                            scales, f"{mname}/fuse{i}_{j}_{k}", (2, 2),
                            relu=not last,
                        )
                acc = (
                    y.astype(jnp.float32)
                    if acc is None
                    else acc + y.astype(jnp.float32)
                )
            fused.append(jnp.maximum(acc, 0.0).astype(jnp.bfloat16))
        return fused

    prev_channels = [256]
    ys = [x]
    for stage_idx, stage_cfg in ((2, stage2), (3, stage3), (4, stage4)):
        num_modules, num_branches, block, num_blocks, num_channels = stage_cfg
        expansion = 1 if block == "BASIC" else 4
        cur_channels = [c * expansion for c in num_channels]

        xs = []
        for i in range(num_branches):
            if i < len(prev_channels):
                y = ys[i]
                if cur_channels[i] != prev_channels[i]:
                    tn = f"transition{stage_idx - 1}_{i}"
                    y = _qconv_bn(
                        y, params[f"{tn}_conv"], params[f"{tn}_bn"],
                        batch_stats[f"{tn}_bn"], scales, tn,
                    )
                xs.append(y)
            else:
                y = ys[-1]
                for j in range(i + 1 - len(prev_channels)):
                    tn = f"transition{stage_idx - 1}_{i}"
                    y = _qconv_bn(
                        y, params[f"{tn}_conv{j}"], params[f"{tn}_bn{j}"],
                        batch_stats[f"{tn}_bn{j}"], scales, f"{tn}_{j}",
                        (2, 2),
                    )
                xs.append(y)

        inchannels = list(cur_channels)
        for m in range(num_modules):
            multi_scale = not (stage_idx == 4 and m == num_modules - 1)
            mname = f"stage{stage_idx}_module{m}"
            xs = branch_blocks(
                xs, block, num_blocks, inchannels,
                [c * expansion for c in num_channels], num_channels, mname,
            )
            if num_branches > 1:
                num_out = num_branches if multi_scale else 1
                xs = exchange(
                    xs, [c * expansion for c in num_channels], num_out, mname
                )
            inchannels = [c * expansion for c in num_channels]
        ys = xs
        prev_channels = inchannels

    fl = params["final_layer"]
    x = ys[0].astype(jnp.float32)
    k = final_conv_kernel
    out = jax.lax.conv_general_dilated(
        x, fl["kernel"].astype(jnp.float32), (1, 1),
        [(1, 1), (1, 1)] if k == 3 else [(0, 0), (0, 0)],
        dimension_numbers=_DN,
    ) + fl["bias"].astype(jnp.float32)
    if collect_scales:
        return out, scales.recorded
    return out
