"""Fused heatmap decode kernel.

For a batch of heatmaps (flattened to [M, h*w] rows, M = B*V*K), one VMEM
pass computes per row:
  * hard-argmax (x, y) in image coordinates (x = idx % w, y = idx // w,
    times stride — the reference decode, utils/evaluation.py:24-27),
  * the peak value (confidence),
  * soft-argmax (x, y): softmax-weighted expected coordinates
    (kornia.spatial_soft_argmax2d equivalent, utils/triangulation.py:192-199).

XLA's fallback (ops/heatmap.py) issues independent argmax / take-along /
softmax-moment reductions, re-reading the maps from HBM; a 64x64 f32 map is
16 KiB, so for a 31-view 19-joint scoring batch the maps dominate decode
bandwidth and a single fused pass is the floor.

Outputs are packed as one [M, 8] row (x, y, peak, soft_x, soft_y, pad...) to
keep a single aligned store per tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 8  # rows per tile (f32 sublane)
_OUT_COLS = 8


def _decode_kernel(hm_ref, out_ref, *, width: int, stride: float):
    hm = hm_ref[:]  # [TM, HW]
    hw = hm.shape[-1]
    idx = jnp.argmax(hm, axis=-1)  # [TM]
    peak = jnp.max(hm, axis=-1)
    x = (idx % width).astype(jnp.float32) * stride
    y = (idx // width).astype(jnp.float32) * stride

    # soft-argmax: stable softmax moments in the same pass
    e = jnp.exp(hm - peak[:, None])  # [TM, HW]
    s = jnp.sum(e, axis=-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hm.shape[0], hw), 1)
    xs = (cols % width).astype(jnp.float32)
    ys = (cols // width).astype(jnp.float32)
    soft_x = jnp.sum(e * xs, axis=-1) / s * stride
    soft_y = jnp.sum(e * ys, axis=-1) / s * stride

    packed = jnp.stack(
        [x, y, peak, soft_x, soft_y, jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.zeros_like(x)],
        axis=-1,
    )  # [TM, 8]
    out_ref[:] = packed


@partial(jax.jit, static_argnames=("width", "stride", "interpret"))
def fused_decode(
    heatmaps_flat: jnp.ndarray, width: int, stride: float, interpret: bool = False
):
    """heatmaps_flat: [M, h*w] f32 -> dict with coords [M, 2], peak [M],
    soft_coords [M, 2].  M is padded to a multiple of 8 internally."""
    m, hw = heatmaps_flat.shape
    pad = (-m) % _TM
    hm = jnp.pad(heatmaps_flat, ((0, pad), (0, 0)))
    mp = hm.shape[0]
    out = pl.pallas_call(
        partial(_decode_kernel, width=width, stride=float(stride)),
        out_shape=jax.ShapeDtypeStruct((mp, _OUT_COLS), jnp.float32),
        grid=(mp // _TM,),
        in_specs=[
            pl.BlockSpec((_TM, hw), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_TM, _OUT_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(hm)
    out = out[:m]
    return {
        "coords": out[:, 0:2],
        "peak": out[:, 2],
        "soft_coords": out[:, 3:5],
    }


def decode_keypoints_pallas(
    heatmaps: jnp.ndarray,
    stride: float,
    valid: jnp.ndarray,
    use_soft_argmax: bool = False,
    interpret: bool = False,
    with_peak: bool = False,
):
    """Drop-in for ops.heatmap.decode_keypoints: [..., K, h, w] -> [..., K, 2].

    Invalid joints decode to (0, 0) like the reference
    (utils/evaluation.py:21-23).  `with_peak=True` additionally returns the
    per-map peak value [..., K] the kernel already computed (confidence for
    the weighted-DLT path) — callers must not re-decode for it, since a
    separate argmax pass cannot be CSE'd with the Pallas kernel."""
    lead = heatmaps.shape[:-2]
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(-1, h * w).astype(jnp.float32)
    out = fused_decode(flat, w, stride, interpret=interpret)
    coords = (
        out["soft_coords"] if use_soft_argmax else out["coords"]
    ).reshape(lead + (2,))
    coords = jnp.where(valid[..., None], coords, jnp.zeros_like(coords))
    if with_peak:
        return coords, out["peak"].reshape(lead)
    return coords
