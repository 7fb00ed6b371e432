"""HRNet pose head (HRNet-W32 by default) in Flax, NHWC.

Topology contract matches the reference (pose_estimators/hrnet.py:98-533):
stem (2x stride-2 3x3 convs) -> layer1 (4x Bottleneck-64) -> three stages of
parallel multi-resolution branches with SUM-fused exchange units
(1x1 conv + BN + nearest-upsample for low->high, strided 3x3 chains for
high->low), last stage emits only the highest-resolution branch ->
1x1 conv to heatmaps.  Input 256x256 -> output 64x64 (stride 4).

Initialization: all convs normal(0, 0.001), BN scale 1 / bias 0
(reference hrnet.py:354-368).  BN momentum 0.1 (torch) == 0.9 Flax decay.

TPU-first notes: NHWC layout; nearest upsample is a zero-FLOP reshape
broadcast; all branch channels (32/64/128/256) tile the MXU cleanly in
bfloat16.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .pose_resnet import BasicBlock, Bottleneck, INIT_STD, batch_norm

BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def _conv_init(features, kernel, strides=1, dtype=jnp.float32, name=None):
    """3x3/1x1 conv with the HRNet normal(0, 0.001) init."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        kernel_init=nn.initializers.normal(stddev=INIT_STD),
        dtype=dtype,
        name=name,
    )


def _nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour upsample by an integer factor (NHWC)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
    )
    return x.reshape(n, h * factor, w * factor, c)


class HighResolutionModule(nn.Module):
    """Parallel branches + exchange-unit fusion
    (reference: hrnet.py:98-287)."""

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_inchannels: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Any = jnp.float32
    # Branch blocks with <= this many channels run their 3x3 convs
    # 2x2-output-packed (ops/packed_conv.py) — the MXU lane-fill fix for
    # the 32-channel high-resolution branch diagnosed as the scoring
    # bottleneck (BENCH_NOTES round 3).  0 disables.
    packed_max_channels: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        block_cls = BLOCKS[self.block]
        out_channels = [c * block_cls.expansion for c in self.num_channels]

        # Per-branch residual blocks.
        ys = []
        for b in range(self.num_branches):
            x = xs[b]
            packed = (
                self.block == "BASIC"
                and out_channels[b] <= self.packed_max_channels
            )
            for i in range(self.num_blocks[b]):
                needs_down = i == 0 and self.num_inchannels[b] != out_channels[b]
                x = block_cls(
                    self.num_channels[b],
                    strides=1,
                    downsample=needs_down,
                    dtype=self.dtype,
                    packed=packed,
                    name=f"branch{b}_block{i}",
                )(x, train)
            ys.append(x)

        if self.num_branches == 1:
            return ys

        # Exchange unit: every output branch sums contributions from all
        # input branches (reference fuse semantics, hrnet.py:199-287).
        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    y = ys[j]
                elif j > i:
                    # low-res -> high-res: 1x1 conv + BN + nearest upsample.
                    y = _conv_init(
                        out_channels[i], 1, dtype=self.dtype,
                        name=f"fuse{i}_{j}_conv",
                    )(ys[j])
                    y = batch_norm(self.dtype, f"fuse{i}_{j}_bn")(
                        y, use_running_average=not train
                    )
                    y = _nearest_upsample(y, 2 ** (j - i))
                else:
                    # high-res -> low-res: chain of strided 3x3 convs; the
                    # last maps to the target width without ReLU.
                    y = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_channels[i] if last else out_channels[j]
                        y = _conv_init(
                            ch, 3, strides=2, dtype=self.dtype,
                            name=f"fuse{i}_{j}_conv{k}",
                        )(y)
                        y = batch_norm(self.dtype, f"fuse{i}_{j}_bn{k}")(
                            y, use_running_average=not train
                        )
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class PoseHighResolutionNet(nn.Module):
    """images [N, H, W, 3] -> heatmaps [N, H/4, W/4, num_joints]
    (reference: hrnet.py:293-501)."""

    num_joints: int
    stage2: Tuple = (1, 2, "BASIC", (4, 4), (32, 64))
    stage3: Tuple = (4, 3, "BASIC", (4, 4, 4), (32, 64, 128))
    stage4: Tuple = (3, 4, "BASIC", (4, 4, 4, 4), (32, 64, 128, 256))
    final_conv_kernel: int = 1
    dtype: Any = jnp.float32
    # See HighResolutionModule.packed_max_channels (TPU.HRNET_PACKED_MAX_CH).
    packed_max_channels: int = 0

    @classmethod
    def from_config(cls, num_joints, hrnet_cfg, dtype=jnp.float32,
                    packed_max_channels=0):
        def stage(s):
            return (
                s.NUM_MODULES,
                s.NUM_BRANCHES,
                s.BLOCK,
                tuple(s.NUM_BLOCKS),
                tuple(s.NUM_CHANNELS),
            )

        return cls(
            num_joints=num_joints,
            stage2=stage(hrnet_cfg.STAGE2),
            stage3=stage(hrnet_cfg.STAGE3),
            stage4=stage(hrnet_cfg.STAGE4),
            final_conv_kernel=hrnet_cfg.FINAL_CONV_KERNEL,
            dtype=dtype,
            packed_max_channels=packed_max_channels,
        )

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        """return_features=True returns (heatmaps, pooled) where pooled is
        the globally-average-pooled high-resolution branch output [N, C]
        (the collapsed pre-head feature map) — the feature space for
        AL.CORESET_FEATURES=EMBEDDING (engine.embed_step)."""
        x = x.astype(self.dtype)

        # Stem: two stride-2 3x3 convs (reference: hrnet.py:303-309).
        for i in (1, 2):
            x = _conv_init(64, 3, strides=2, dtype=self.dtype, name=f"conv{i}")(x)
            x = batch_norm(self.dtype, f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)

        # layer1: 4x Bottleneck(64) -> 256 channels (reference: hrnet.py:310).
        for i in range(4):
            x = Bottleneck(
                64, strides=1, downsample=(i == 0), dtype=self.dtype,
                name=f"layer1_{i}",
            )(x, train)

        prev_channels = [256]
        ys = [x]
        for stage_idx, stage_cfg in ((2, self.stage2), (3, self.stage3), (4, self.stage4)):
            num_modules, num_branches, block, num_blocks, num_channels = stage_cfg
            block_cls = BLOCKS[block]
            cur_channels = [c * block_cls.expansion for c in num_channels]

            # Transition (reference: hrnet.py:370-413): existing branches get
            # a 3x3 conv only when widths change; each new branch chains
            # stride-2 3x3 convs from the previous stage's lowest resolution.
            xs = []
            for i in range(num_branches):
                if i < len(prev_channels):
                    y = ys[i]
                    if cur_channels[i] != prev_channels[i]:
                        y = _conv_init(
                            cur_channels[i], 3, dtype=self.dtype,
                            name=f"transition{stage_idx - 1}_{i}_conv",
                        )(y)
                        y = batch_norm(
                            self.dtype, f"transition{stage_idx - 1}_{i}_bn"
                        )(y, use_running_average=not train)
                        y = nn.relu(y)
                    xs.append(y)
                else:
                    y = ys[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_ch = (
                            cur_channels[i]
                            if j == i - len(prev_channels)
                            else prev_channels[-1]
                        )
                        y = _conv_init(
                            out_ch, 3, strides=2, dtype=self.dtype,
                            name=f"transition{stage_idx - 1}_{i}_conv{j}",
                        )(y)
                        y = batch_norm(
                            self.dtype, f"transition{stage_idx - 1}_{i}_bn{j}"
                        )(y, use_running_average=not train)
                        y = nn.relu(y)
                    xs.append(y)

            # Stage modules; only the last module of stage4 collapses to the
            # high-resolution branch (reference: hrnet.py:437-466).
            inchannels = list(cur_channels)
            for m in range(num_modules):
                multi_scale = not (stage_idx == 4 and m == num_modules - 1)
                xs = HighResolutionModule(
                    num_branches=num_branches,
                    block=block,
                    num_blocks=num_blocks,
                    num_inchannels=tuple(inchannels),
                    num_channels=num_channels,
                    multi_scale_output=multi_scale,
                    dtype=self.dtype,
                    packed_max_channels=self.packed_max_channels,
                    name=f"stage{stage_idx}_module{m}",
                )(xs, train)
                inchannels = [c * block_cls.expansion for c in num_channels]
            ys = xs
            prev_channels = inchannels

        k = self.final_conv_kernel
        out = nn.Conv(
            self.num_joints,
            (k, k),
            padding=[(1, 1), (1, 1)] if k == 3 else "VALID",
            kernel_init=nn.initializers.normal(stddev=INIT_STD),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="final_layer",
        )(ys[0].astype(jnp.float32))
        if return_features:
            return out, jnp.mean(ys[0].astype(jnp.float32), axis=(1, 2))
        return out
