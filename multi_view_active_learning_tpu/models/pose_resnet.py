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
import jax
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


class PackedConv3x3(nn.Module):
    """Drop-in for `_conv(features, 3, 1, name=...)` that computes the conv
    2x2-output-packed so small C_out fills the MXU lanes
    (ops/packed_conv.py).  Declares the identical [3, 3, C_in, C_out]
    `kernel` parameter, so the tree matches nn.Conv exactly."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.packed_conv import packed_conv3x3

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        return packed_conv3x3(x.astype(self.dtype), kernel.astype(self.dtype))


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (reference: pose_resnet.py:156-189).

    `packed` computes the two stride-1 3x3 convs 2x2-output-packed
    (PackedConv3x3) — same math and parameter tree, better MXU lane fill
    for small channel counts (HRNet's high-resolution branches)."""

    planes: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    packed: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        def conv3x3(y, strides, name):
            # Packing needs even spatial dims (2x2 output tiles); both
            # branches declare the identical `kernel` param, so the tree
            # does not depend on the choice.
            if (
                self.packed
                and strides == 1
                and y.shape[1] % 2 == 0
                and y.shape[2] % 2 == 0
            ):
                return PackedConv3x3(self.planes, dtype=self.dtype, name=name)(y)
            return _conv(self.planes, 3, strides, name=name, dtype=self.dtype)(y)

        residual = x
        out = conv3x3(x, self.strides, "conv1")
        out = batch_norm(self.dtype, "bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv3x3(out, 1, "conv2")
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
    # Accepted for BLOCKS-dispatch uniformity with BasicBlock; Bottleneck's
    # 3x3 runs at >= 64 channels where packing is a wash, so it ignores it.
    packed: bool = False
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


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, 4C] in (p, q, c)-major channel order.

    Cheap on uint8 inputs (4x fewer bytes than post-normalize bf16); the
    scoring path applies it before normalization (engine.forward)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


class SpaceToDepthStem(nn.Module):
    """The 7x7/s2 stem conv, accepting plain OR space-to-depth inputs.

    With a [N, H, W, 3] input this is exactly the reference's 7x7 stride-2
    conv.  With a pre-space-to-depth'd [N, H/2, W/2, 12] input (see
    `space_to_depth`) it computes the IDENTICAL function as a dense 4x4
    stride-1 conv over 12 channels — a 3-channel conv uses 3/128 of an MXU
    lane, and the elementwise normalize ahead of it runs 4x denser too
    (measured: uint8-in stem 8.4 ms -> 4.0 ms on the 124-crop scoring
    batch; doing the s2d on bf16 activations in-graph is SLOWER, which is
    why the transform happens on the uint8 input instead).  The parameter
    keeps the reference's [7,7,3,64] shape and the "kernel" name so
    checkpoints and the torch converter are untouched.

    Derivation: y[o] = sum_k w[k] x[2o+k-3].  With x_s2d[m,p] = x[2m+p] and
    k = 2t+p-1 (t in 0..3, p in 0..1): y[o] = sum_{t,p} w[2t+p-1] x_s2d[o+t-2, p]
    — a 4-tap stride-1 conv with padding (2,1), kernel remapped as
    wp = pad_left(w, 1); w_s2d[t, u, (p,q,c)] = wp[2t+p, 2u+q, c].
    """

    features: int = 64
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, self.in_channels, self.features),
            jnp.float32,
        )
        if c == self.in_channels:  # plain path — bitwise the reference conv
            return jax.lax.conv_general_dilated(
                x,
                kernel.astype(self.dtype),
                window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if c != 4 * self.in_channels:
            raise ValueError(
                "stem expects %d or %d channels, got %d"
                % (self.in_channels, 4 * self.in_channels, c)
            )
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,c,64]
        ws = wp.reshape(4, 2, 4, 2, self.in_channels, self.features)
        ws = ws.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * self.in_channels, self.features
        )
        return jax.lax.conv_general_dilated(
            x,
            ws.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PhaseDeconv(nn.Module):
    """ConvTranspose(k4, s2, SAME) computed as one dense 2x2 conv + phase
    interleave (a depth-to-space with per-phase output alignment).

    Mathematically EXACT: flax/lax conv_transpose here satisfies
    y[o] = sum_t W[t] x[(o+t-2)/2] (verified by delta probing), so output
    phase r uses taps t = 2a + r reading windows (x[i-1], x[i]) shifted
    by r.  One k2/s1 conv with padding (1,1) over 4*Cout phase kernels
    k2[a,b,:,(r,s)] = W[2a+r, 2b+s] computes all phases; each phase is a
    shifted [h, w] slice, interleaved back to [2h, 2w].  Avoids XLA's
    dilated-input transposed-conv lowering (head measured at 29% MXU).
    Parameter shape/name matches nn.ConvTranspose ([4,4,Cin,Cout],
    "kernel") for checkpoint compat.
    """

    features: int
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.normal(stddev=INIT_STD)

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (4, 4, c_in, self.features), jnp.float32
        )
        n, h, w, _ = x.shape
        co = self.features
        # k2[a, b, c, (r, s, o)] = W[2a+r, 2b+s, c, o]
        k2 = kernel.reshape(2, 2, 2, 2, c_in, co)  # [a, r, b, s, c, o]
        k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, c_in, 4 * co)
        z = jax.lax.conv_general_dilated(
            x,
            k2.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [n, h+1, w+1, 4co]
        z = z.reshape(n, h + 1, w + 1, 2, 2, co)
        # phase (r, s) output plane = z[:, r : r+h, s : s+w, r, s, :]
        rows = []
        for r in range(2):
            cols = [z[:, r : r + h, s : s + w, r, s, :] for s in range(2)]
            rows.append(jnp.stack(cols, axis=3))  # [n, h, w, 2(s), co]
        y = jnp.stack(rows, axis=3)  # [n, h, w, 2(r), 2(s), co]
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
        return y


class PoseResNet(nn.Module):
    """images [N, H, W, 3] -> heatmaps [N, H/4, W/4, num_joints]."""

    num_joints: int
    num_layers: int = 50
    dtype: Any = jnp.float32
    # Mathematically exact PhaseDeconv reformulation of the head; param
    # trees identical.  Measured slower on the v5e axon backend (the phase
    # interleave relayouts are HBM-bound) — kept as a tested option.
    fast_deconv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, skip_head: bool = False,
                 return_features: bool = False):
        """x: [N, H, W, 3] images, or [N, H/2, W/2, 12] space-to-depth'd
        images (the TPU scoring fast path — see SpaceToDepthStem).

        skip_head=True returns the trunk output [N, H/32, W/32, C] before
        the deconv head — the TPU.PALLAS_HEAD inference path applies the
        head itself via the fused Pallas kernel (ops/pallas/deconv.py,
        engine.Engine.forward).  Only valid at apply time (init must see
        the full module so every parameter is created).

        return_features=True returns (heatmaps, pooled) where pooled is
        the globally-average-pooled trunk embedding [N, C] — the feature
        space for AL.CORESET_FEATURES=EMBEDDING (engine.embed_step)."""
        block_cls, layer_sizes = RESNET_SPEC[self.num_layers]
        x = x.astype(self.dtype)

        # Stem: 7x7/2 conv + BN + 3x3/2 maxpool.  SpaceToDepthStem computes
        # the identical conv for either input layout.
        x = SpaceToDepthStem(64, dtype=self.dtype, name="conv1")(x)
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

        if skip_head:
            return x
        pooled = (
            jnp.mean(x.astype(jnp.float32), axis=(1, 2))
            if return_features
            else None
        )

        # Deconv head: 3x (ConvTranspose 256, k4, s2) + BN + ReLU.
        for i in range(3):
            if self.fast_deconv:
                x = PhaseDeconv(256, dtype=self.dtype, name=f"deconv{i}")(x)
            else:
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
        if return_features:
            return x, pooled
        return x
