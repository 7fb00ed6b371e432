"""Tiled pairwise-distance kernel with running masked min.

Computes min over masked centers of ||x_i - c_j||^2 for every pool point i —
the initialization of k-center-greedy coreset selection
(ops/coreset.py::_min_dist_to_centers; the reference's host-side sklearn
pairwise_distances, utils/coreset.py:49-69).

The [n, n] distance matrix never exists: each (row-tile, center-tile) grid
step does one MXU matmul x_tile @ c_tile^T, applies the mask, and folds the
tile minimum into the output block.  The output block index_map revisits the
same row block across the center-tile grid axis, so the running min lives in
VMEM for the whole sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256  # pool rows per tile
_TC = 256  # center columns per tile
_BIG = 1e30


def _min_dist_kernel(x_ref, xsq_ref, c_ref, csq_ref, cmask_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _BIG)

    x = x_ref[:]  # [TN, D]
    c = c_ref[:]  # [TC, D]
    d2 = (
        xsq_ref[:]  # [TN, 1]
        + csq_ref[:].reshape(1, -1)  # [1, TC]
        - 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    )
    d2 = jnp.maximum(d2, 0.0)
    masked = jnp.where(cmask_ref[:].reshape(1, -1) > 0, d2, _BIG)
    tile_min = jnp.min(masked, axis=-1, keepdims=True)  # [TN, 1]
    out_ref[:] = jnp.minimum(out_ref[:], tile_min)


@partial(jax.jit, static_argnames=("interpret",))
def min_distance_to_centers(
    features: jnp.ndarray, center_mask: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """features [n, d] f32, center_mask [n] bool -> [n] min distances
    (sqrt'd), matching ops.coreset._min_dist_to_centers."""
    n, d = features.shape
    pad_n = (-n) % _TN
    pad_d = (-d) % 128
    x = jnp.pad(features.astype(jnp.float32), ((0, pad_n), (0, pad_d)))
    npad = x.shape[0]
    sq = jnp.sum(x * x, axis=-1, keepdims=True)  # [npad, 1]
    mask = jnp.pad(center_mask.astype(jnp.float32), (0, pad_n))

    out = pl.pallas_call(
        _min_dist_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        grid=(npad // _TN, npad // _TC),
        in_specs=[
            pl.BlockSpec((_TN, x.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, x.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, sq, x, sq, mask)
    return jnp.sqrt(out[:n, 0])
