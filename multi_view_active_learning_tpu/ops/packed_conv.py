"""MXU-packed 3x3 convolution for small output-channel counts.

HRNet-W32's highest-resolution branch runs 3x3 convs with 32 output
channels (reference: pose_estimators/hrnet.py:98-287 branch blocks).  On
the TPU the MXU contracts onto 128 output lanes per pass, so N=32 fills a
quarter of the array — the round-2/3 traces measured the HRNet scoring
step at 48% MFU with exactly these convs diagnosed as the limiter
(BENCH_NOTES).

The rewrite here computes the same conv as a [4, 4, C_in, 4*C_out]
stride-2 convolution: each output position of the wide conv holds a 2x2
block of fine output pixels as channel groups, then a depth-to-space
restores the layout.  Derivation: fine output p = 2I + a (a in {0, 1})
reads fine inputs q = p - 1 + ky = 2I - 1 + (a + ky); a stride-2 window
of width 4 anchored at 2I - 1 covers all of them, so

    W4[a + ky, b + kx, ci, (a*2 + b)*C_out + co] = K3[ky, kx, ci, co]

and zero elsewhere.  Identical math (same multiply-add terms per output,
modulo float reduction order), at 16/9x the FLOPs — worth it when the
baseline conv runs below ~50% lane utilization (C_out = 32 -> 25%), a
wash at C_out = 64, counterproductive above.

The kernel scatter runs in-graph from the unchanged [3, 3, C_in, C_out]
parameter, so checkpoints, converters, and parity goldens see the exact
same parameter tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_kernel_2x2(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C_in, C_out] -> [4, 4, C_in, 4*C_out] packed stride-2 kernel.

    Output channel block (a*2 + b) holds the fine output sub-position
    (row a, col b) of each 2x2 output tile.
    """
    kh, kw, c_in, c_out = kernel.shape
    assert kh == 3 and kw == 3, kernel.shape
    w4 = jnp.zeros((4, 4, c_in, 4 * c_out), kernel.dtype)
    for a in (0, 1):
        for b in (0, 1):
            blk = (a * 2 + b) * c_out
            w4 = w4.at[a : a + 3, b : b + 3, :, blk : blk + c_out].add(kernel)
    return w4


def packed_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME conv [N, H, W, C_in] -> [N, H, W, C_out] computed
    2x2-output-packed (see module docstring).  H and W must be even."""
    n, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    c_out = kernel.shape[3]
    y = jax.lax.conv_general_dilated(
        x,
        pack_kernel_2x2(kernel),
        window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # depth-to-space: [N, H/2, W/2, (2, 2, C)] -> [N, H, W, C].
    y = y.reshape(n, h // 2, w // 2, 2, 2, c_out)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h, w, c_out)
