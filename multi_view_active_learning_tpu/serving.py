"""Serving export: freeze a model into a portable StableHLO artifact.

The reference deploys nothing — its checkpoints are torch state_dicts that
require the full training stack to run (reference strategy.py:697-745).
TPU-native serving wants the opposite: a self-contained artifact with the
weights baked in as constants, raw uint8 pixels in, heatmaps + decoded
keypoints + confidences out, runnable by any JAX runtime (CPU or TPU)
without this package, its config tree, or a checkpoint directory.

`jax.export` provides exactly that: the jitted serve function lowers to
versioned StableHLO bytes (`Exported.serialize`) that deserialize and call
anywhere JAX runs.  The batch dimension can be exported symbolically so
one artifact serves any request size; the view count, image size, and
joint count stay static (they are rig/model constants, and static shapes
are what the TPU compiler wants).

The serve function runs the float path: int8 scoring's static activation
scales are calibration-batch-dependent state, which a frozen artifact can
carry — pass `int8_scales` (from `Engine.int8_calibrate`) to bake the
quantized backbone in instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops import heatmap as heatmap_ops
from .utils import get_logger

_logger = get_logger(__name__)

SERVING_SUFFIX = ".stablehlo"


def build_serve_fn(engine, params, batch_stats, int8_scales=None):
    """The inference contract, weights closed over:

    (images uint8 [B, V, H, W, 3], square_box f32 [B, V, 4])
      -> {"heatmaps":  f32 [B, V, h, w, K],
          "keypoints": f32 [B, V, K, 2]   (bbox-relative pixels, the
                       decode the 2D-eval path uses — decode_keypoints_bbox),
          "confidence": f32 [B, V, K]     (heatmap peak values)}

    With `int8_scales` the backbone runs the quantized MXU path baked into
    the artifact (scales become constants like the weights).
    """
    use_int8 = int8_scales is not None

    def serve(images, square_box):
        hm = engine.forward(
            params, batch_stats, images, int8_scales, use_int8=use_int8
        )
        hm_vk = jnp.moveaxis(hm, -1, 2)  # [B, V, K, h, w]
        coords = heatmap_ops.decode_keypoints_bbox(hm_vk, square_box)
        _, conf = heatmap_ops.decode_argmax(hm_vk)
        return {
            "heatmaps": hm.astype(jnp.float32),
            "keypoints": coords.astype(jnp.float32),
            "confidence": conf.astype(jnp.float32),
        }

    return serve


def export_serving(
    engine,
    params,
    batch_stats,
    batch_size: int | None,
    num_views: int,
    int8_scales=None,
    platforms=("cpu", "tpu"),
):
    """Lower the serve function to a `jax.export.Exported`.

    `batch_size=None` exports a SYMBOLIC batch dimension ("b"): one
    artifact serves any request size (each new size still pays one XLA
    compile at load site, so fixed-size artifacts remain the TPU-serving
    default).  `platforms` pins which backends the artifact may run on.
    """
    from jax import export as jax_export

    cfg = engine.cfg
    H, W = cfg.DATA.INPUT_HEIGHT, cfg.DATA.INPUT_WIDTH
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    images = jax.ShapeDtypeStruct((b, num_views, H, W, 3), jnp.uint8)
    box = jax.ShapeDtypeStruct((b, num_views, 4), jnp.float32)
    serve = build_serve_fn(engine, params, batch_stats, int8_scales)
    return jax_export.export(jax.jit(serve), platforms=list(platforms))(
        images, box
    )


def save_serving(exported, path: str) -> str:
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    _logger.info(
        "Serving artifact: %s (%.1f MB, platforms=%s, in=%s)"
        % (
            path,
            len(data) / 1e6,
            ",".join(exported.platforms),
            [str(a) for a in exported.in_avals],
        )
    )
    return path


def load_serving(path: str):
    """Deserialize a serving artifact -> callable(images, square_box).

    Needs only jax — no config, checkpoint, or model code.  The call jits
    on first use for the local backend (must be one of the artifact's
    export platforms)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    def call(images, square_box):
        return exported.call(np.asarray(images), np.asarray(square_box))

    call.exported = exported
    return call
