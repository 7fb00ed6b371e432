"""PoseResNet (Simple Baselines for Human Pose Estimation) in Flax, NHWC.

Topology contract matches the reference (pose_estimators/pose_resnet.py:17-231):
ResNet-{18,34,50,101,152} trunk -> 3x (ConvTranspose 256ch, k4, s2) ->
1x1 conv to num_joints heatmaps; input 256x256 -> output 64x64 (stride 4).
Initialization: deconv + final conv weights ~ normal(0, 0.001), final bias 0,
BN scale 1 / bias 0 (reference :48-67); BN momentum 0.1 (torch) == 0.9 decay
in Flax terms.

TPU-first choices: NHWC layout, channel counts already multiples of 64 so
every conv tiles the MXU; compute dtype is configurable (bfloat16 default)
with float32 params and BN statistics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM_TORCH = 0.1  # flax momentum = 1 - torch momentum
INIT_STD = 0.001

ModuleDef = Any


def _conv(features, kernel, strides=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding=[(kernel // 2, kernel // 2)] * 2 if kernel > 1 else "VALID",
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def batch_norm(dtype, name):
    """BN with torch-equivalent momentum (0.1) and f32 params/statistics.
    Call as `batch_norm(dtype, name)(x, use_running_average=not train)`."""
    return nn.BatchNorm(
        momentum=1.0 - BN_MOMENTUM_TORCH,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (reference: pose_resnet.py:156-189)."""

    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 3, self.strides, name="conv1", dtype=self.dtype)(x)
        out = batch_norm(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = batch_norm(self.dtype, "bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = _conv(
                self.planes * self.expansion, 1, self.strides,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            residual = batch_norm(self.dtype, "downsample_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 (x4) residual block (reference: pose_resnet.py:192-231)."""

    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = _conv(self.planes, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = batch_norm(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.strides, name="conv2", dtype=self.dtype)(out)
        out = batch_norm(self.dtype, "bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = batch_norm(self.dtype, "bn3")(out, use_running_average=not train)
        if self.downsample:
            residual = _conv(
                self.planes * self.expansion, 1, self.strides,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            residual = batch_norm(self.dtype, "downsample_bn")(residual, use_running_average=not train)
        return nn.relu(out + residual)


RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class PoseResNet(nn.Module):
    """images [N, H, W, 3] -> heatmaps [N, H/4, W/4, num_joints]."""

    num_joints: int
    num_layers: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layer_sizes = RESNET_SPEC[self.num_layers]
        x = x.astype(self.dtype)

        # Stem: 7x7/2 conv + BN + 3x3/2 maxpool.
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = batch_norm(self.dtype, "bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # Residual stages.
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layer_sizes)
        ):
            strides = 1 if stage == 0 else 2
            for i in range(blocks):
                needs_down = i == 0 and (
                    strides != 1 or inplanes != planes * block_cls.expansion
                )
                x = block_cls(
                    planes,
                    strides=strides if i == 0 else 1,
                    downsample=needs_down,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
            inplanes = planes * block_cls.expansion

        # Deconv head: 3x (ConvTranspose 256, k4, s2) + BN + ReLU.
        for i in range(3):
            x = nn.ConvTranspose(
                256, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
                kernel_init=nn.initializers.normal(stddev=INIT_STD),
                dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = batch_norm(self.dtype, f"deconv_bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)

        # Final 1x1 conv to heatmaps, in float32 for stable regression.
        x = nn.Conv(
            self.num_joints, (1, 1),
            kernel_init=nn.initializers.normal(stddev=INIT_STD),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32, name="final_layer",
        )(x.astype(jnp.float32))
        return x
