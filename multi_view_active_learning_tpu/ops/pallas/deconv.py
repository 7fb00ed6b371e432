"""Fused ConvTranspose(k4, s2, SAME) + BN(inference) + ReLU kernel.

The PoseResNet deconv head is the second-largest conv cost of the scoring
step (reference head: pose_estimators/pose_resnet.py:69-117).  XLA lowers
transposed convolution as a kernel-size conv over a 2x-input-dilated
feature map — every other tap multiplies an inserted zero, wasting ~4x the
MACs; the XLA-level phase decomposition (models/pose_resnet.py::PhaseDeconv)
removes the waste but pays HBM relayouts for the phase interleave that cost
more than it saves (BENCH_NOTES.md round-2 analysis).

This kernel keeps the whole phase decomposition in VMEM:

  contract (verified by delta probing, PhaseDeconv docstring):
      y[o] = sum_t W[t] x[(o+t-2)/2]        (per spatial dim)
  so output phase r in {0,1} (o = 2i + r) uses taps t = 2a + r reading
  x[i + r + a - 1].  With the input pre-padded by 1 (Xp[k] = x[k-1]):

      y[2i+r, 2j+s] = sum_{a,b} Xp[i+r+a, j+s+b] @ W[2a+r, 2b+s]

  Each of the 4 phases accumulates 4 MXU matmuls ([G*H*W, Cc] @ [Cc, Cout])
  over Cin chunks; the BN scale/bias + ReLU epilogue and the phase
  interleave to [2H, 2W, Cout] happen on the in-VMEM result, and the
  output is stored once.  G samples are processed per grid step so the
  weight chunks stream from HBM once per G samples (not once per sample)
  and the matmul M dimension stays MXU-sized even for 8x8 feature maps.

Exactness: identical math to nn.ConvTranspose(k4, s2, SAME, no bias)
followed by inference-mode BatchNorm and ReLU (see
tests/test_pallas_kernels.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _deconv_kernel(
    xp_ref,      # [G, Hp, Wp, Cc]  input chunk (padded by 1 spatially)
    w_ref,       # [4, 4, Cc, Cout]
    scale_ref,   # [1, Cout] f32   (folded BN scale)
    bias_ref,    # [1, Cout] f32   (folded BN bias)
    out_ref,     # [G, 2H, 2W, Cout]
    acc_ref,     # scratch [4, G*H*W, Cout] f32
    *,
    g: int,
    h: int,
    w: int,
    n_chunks: int,
    out_dtype,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    x = xp_ref[...]  # [G, Hp, Wp, Cc]
    for r in range(2):
        for s in range(2):
            phase = 2 * r + s
            acc = acc_ref[phase]  # [G*H*W, Cout]
            for a in range(2):
                for b in range(2):
                    xs = x[:, r + a : r + a + h, s + b : s + b + w, :]
                    xf = xs.reshape(g * h * w, xs.shape[-1])
                    wf = w_ref[2 * a + r, 2 * b + s]  # [Cc, Cout]
                    acc = acc + jnp.dot(
                        xf, wf, preferred_element_type=jnp.float32
                    )
            acc_ref[phase] = acc

    @pl.when(k == n_chunks - 1)
    def _():
        scale = scale_ref[0]  # [Cout]
        bias = bias_ref[0]
        z = acc_ref[...]  # [4, G*H*W, Cout]
        z = jnp.maximum(z * scale[None, None, :] + bias[None, None, :], 0.0)
        # Cast before the interleave so the transpose temporaries are half
        # the bytes (VMEM is the binding constraint on the 2048-channel
        # first deconv).
        z = z.astype(out_dtype)
        co = z.shape[-1]
        # [2(r), 2(s), G, H, W, C] -> [G, H, 2(r), W, 2(s), C] -> out
        z = z.reshape(2, 2, g, h, w, co)
        z = z.transpose(2, 3, 0, 4, 1, 5).reshape(g, 2 * h, 2 * w, co)
        out_ref[...] = z


def _group_size(h: int, w: int, c_out: int) -> int:
    """Samples per grid step: keep the f32 phase accumulator ~<=2 MB."""
    acc_bytes_per_sample = 4 * h * w * c_out * 4
    return max(1, min(8, (2 * 1024 * 1024) // acc_bytes_per_sample))


@partial(jax.jit, static_argnames=("interpret",))
def fused_deconv_bn_relu(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(bn(conv_transpose(x, kernel))) in one Pallas pass.

    x: [N, H, W, Cin] (any float dtype — the matmuls run in x.dtype);
    kernel: [4, 4, Cin, Cout] (nn.ConvTranspose layout);
    scale/bias: [Cout] — the folded inference BN affine
    (scale = gamma / sqrt(var + eps), bias = beta - mean * scale).
    Returns [N, 2H, 2W, Cout] in x.dtype.
    """
    n, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    g = _group_size(h, w, c_out)
    pad_n = (-n) % g
    chunk = min(c_in, 256)
    n_chunks = -(-c_in // chunk)
    pad_c = n_chunks * chunk - c_in
    xp = jnp.pad(x, ((0, pad_n), (1, 1), (1, 1), (0, pad_c)))
    wk = kernel.astype(x.dtype)
    if pad_c:
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
    hp, wp = h + 2, w + 2
    ng = xp.shape[0]

    out = pl.pallas_call(
        partial(
            _deconv_kernel,
            g=g,
            h=h,
            w=w,
            n_chunks=n_chunks,
            out_dtype=x.dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((ng, 2 * h, 2 * w, c_out), x.dtype),
        grid=(ng // g, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (g, hp, wp, chunk),
                lambda i, k: (i, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 4, chunk, c_out),
                lambda i, k: (0, 0, k, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c_out), lambda i, k: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out), lambda i, k: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, 2 * h, 2 * w, c_out),
            lambda i, k: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((4, g * h * w, c_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * ng * h * w * 16 * c_in * c_out,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize
                + (ng // g) * n_chunks * 16 * chunk * c_out * wk.dtype.itemsize
                + ng * 4 * h * w * c_out * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp,
        wk,
        scale.astype(jnp.float32)[None, :],
        bias.astype(jnp.float32)[None, :],
    )
    return out[:n]


def _deconv_kernel_int8(
    xp_ref,      # [G, Hp, Wp, Cc]  bf16/f32 input chunk (padded by 1)
    w_ref,       # [4, 4, Cc, Cout] int8 (per-Cout-channel symmetric)
    inv_sx_ref,  # [1, 1] f32       1 / activation scale
    mult_ref,    # [1, Cout] f32    sx * weight_scale * folded-BN scale
    bias_ref,    # [1, Cout] f32    folded-BN bias
    out_ref,     # [G, 2H, 2W, Cout]
    xq_ref,      # scratch [G, Hp, Wp, Cc] int8
    acc_ref,     # scratch [4, G*H*W, Cout] int32
    *,
    g: int,
    h: int,
    w: int,
    n_chunks: int,
    out_dtype,
):
    """Int8 variant of _deconv_kernel: quantize the input block in VMEM,
    accumulate the 16 phase matmuls s8 x s8 -> s32 on the MXU (2x the bf16
    peak on v5e), and dequantize + BN + ReLU + interleave in the epilogue.
    Transposed convolution has no int8 path through XLA (it lowers via
    input dilation); the phase decomposition turns it into dense 2x2
    matmuls, which DO have one."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    inv_sx = inv_sx_ref[0, 0]
    xq_ref[...] = jnp.clip(
        jnp.round(xp_ref[...].astype(jnp.float32) * inv_sx), -127, 127
    ).astype(jnp.int8)
    for r in range(2):
        for s in range(2):
            phase = 2 * r + s
            acc = acc_ref[phase]  # [G*H*W, Cout] int32
            for a in range(2):
                for b in range(2):
                    xs = xq_ref[:, r + a : r + a + h, s + b : s + b + w, :]
                    xf = xs.reshape(g * h * w, xs.shape[-1])
                    wf = w_ref[2 * a + r, 2 * b + s]  # [Cc, Cout] int8
                    acc = acc + jnp.dot(
                        xf, wf, preferred_element_type=jnp.int32
                    )
            acc_ref[phase] = acc

    @pl.when(k == n_chunks - 1)
    def _():
        mult = mult_ref[0]  # [Cout]
        bias = bias_ref[0]
        z = acc_ref[...].astype(jnp.float32)  # [4, G*H*W, Cout]
        z = jnp.maximum(z * mult[None, None, :] + bias[None, None, :], 0.0)
        z = z.astype(out_dtype)
        co = z.shape[-1]
        z = z.reshape(2, 2, g, h, w, co)
        z = z.transpose(2, 3, 0, 4, 1, 5).reshape(g, 2 * h, 2 * w, co)
        out_ref[...] = z


@partial(jax.jit, static_argnames=("interpret",))
def fused_deconv_bn_relu_int8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    act_scale: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(bn(conv_transpose(quant(x), quant(kernel)))) in one Pallas pass.

    Same contract as fused_deconv_bn_relu plus `act_scale`: the per-tensor
    activation quantization scale (max|x|/127 — static from calibration or
    computed by the caller).  Weights are quantized per output channel
    in-graph; the s32 accumulator is exact, so the only approximation is
    the int8 rounding of x and kernel.
    """
    n, h, w, c_in = x.shape
    c_out = kernel.shape[-1]
    g = _group_size(h, w, c_out)
    pad_n = (-n) % g
    chunk = min(c_in, 256)
    n_chunks = -(-c_in // chunk)
    pad_c = n_chunks * chunk - c_in
    xp = jnp.pad(x, ((0, pad_n), (1, 1), (1, 1), (0, pad_c)))
    wf32 = kernel.astype(jnp.float32)
    w_amax = jnp.max(jnp.abs(wf32), axis=(0, 1, 2))  # [Cout]
    ws = jnp.maximum(w_amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf32 / ws), -127, 127).astype(jnp.int8)
    if pad_c:
        wq = jnp.pad(wq, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
    sx = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
    mult = (sx * ws * scale.astype(jnp.float32))[None, :]
    bias_in = bias.astype(jnp.float32)[None, :]
    hp, wp = h + 2, w + 2
    ng = xp.shape[0]

    out = pl.pallas_call(
        partial(
            _deconv_kernel_int8,
            g=g,
            h=h,
            w=w,
            n_chunks=n_chunks,
            out_dtype=x.dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((ng, 2 * h, 2 * w, c_out), x.dtype),
        grid=(ng // g, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (g, hp, wp, chunk),
                lambda i, k: (i, 0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 4, chunk, c_out),
                lambda i, k: (0, 0, k, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i, k: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out), lambda i, k: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out), lambda i, k: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, 2 * h, 2 * w, c_out),
            lambda i, k: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g, hp, wp, chunk), jnp.int8),
            pltpu.VMEM((4, g * h * w, c_out), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ng * h * w * 16 * c_in * c_out,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize
                + (ng // g) * n_chunks * 16 * chunk * c_out
                + ng * 4 * h * w * c_out * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp,
        wq,
        (1.0 / sx).reshape(1, 1),
        mult,
        bias_in,
    )
    return out[:n]


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """Inference BatchNorm as a per-channel affine: returns (scale, bias)."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


def apply_pose_resnet_head(
    trunk: jnp.ndarray,
    params,
    batch_stats,
    interpret: bool = False,
) -> jnp.ndarray:
    """The PoseResNet deconv head via the fused kernel (inference only).

    trunk: the model's skip_head=True output [N, H/32, W/32, C];
    params/batch_stats: the model's variable trees (deconv{i},
    deconv_bn{i}, final_layer entries are read).  Returns heatmaps
    [N, H/4, W/4, K] float32 — same contract as the standard head
    (models/pose_resnet.py::PoseResNet.__call__).
    """
    x = trunk
    for i in range(3):
        bn_p = params[f"deconv_bn{i}"]
        bn_s = batch_stats[f"deconv_bn{i}"]
        scale, bias = fold_bn(
            bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]
        )
        x = fused_deconv_bn_relu(
            x, params[f"deconv{i}"]["kernel"], scale, bias,
            interpret=interpret,
        )
    # Final 1x1 conv in float32 (matches the standard head's dtype policy).
    fl = params["final_layer"]
    x = x.astype(jnp.float32)
    return (
        jnp.einsum("nhwc,ck->nhwk", x, fl["kernel"][0, 0].astype(jnp.float32))
        + fl["bias"].astype(jnp.float32)
    )
