"""Pallas TPU kernels for the hot non-conv ops.

  * decode.fused_decode — one HBM pass per heatmap producing hard-argmax
    coords, peak confidence, and soft-argmax coords simultaneously (XLA
    otherwise reads the [.., h, w] maps several times across the fused
    reductions).
  * pairwise.min_distance_to_centers — tiled MXU pairwise-distance with a
    running masked min, never materializing the [n, n] matrix (the coreset
    bottleneck; reference used sklearn pairwise_distances on host,
    utils/coreset.py:65).

Every kernel has a pure-XLA fallback (ops.heatmap / ops.coreset); callers
select via TPUConfig.USE_PALLAS and `backend_supports_pallas()`.
"""

import jax


def backend_supports_pallas() -> bool:
    return jax.default_backend() == "tpu"
