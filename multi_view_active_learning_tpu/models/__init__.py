"""Flax pose estimators: PoseResNet (Simple Baselines) and HRNet-W32.

Layout is NHWC (TPU-native): images [N, H, W, 3] -> heatmaps [N, h, w, K]
with overall stride 4 (256 -> 64), the same contract as the reference's
[N, 3, 256, 256] -> [N, K, 64, 64] (reference: tests/test_pose_resnet.py:17-22).
"""

from .pose_resnet import PoseResNet
from .hrnet import PoseHighResolutionNet

__all__ = ["PoseResNet", "PoseHighResolutionNet", "build_model"]


def build_model(cfg):
    """Instantiate the configured pose estimator
    (reference: workflow.py:125-139)."""
    if cfg.POSE_ESTIMATOR.TYPE == "POSE_RESNET":
        return PoseResNet(
            num_joints=cfg.DATA.NUM_JOINTS,
            num_layers=cfg.POSE_ESTIMATOR.NUM_LAYERS,
            dtype=_dtype(cfg),
            fast_deconv=cfg.TPU.FAST_DECONV,
        )
    if cfg.POSE_ESTIMATOR.TYPE == "HRNET":
        return PoseHighResolutionNet.from_config(
            num_joints=cfg.DATA.NUM_JOINTS,
            hrnet_cfg=cfg.POSE_ESTIMATOR.HRNET,
            dtype=_dtype(cfg),
            packed_max_channels=cfg.TPU.HRNET_PACKED_MAX_CH,
        )
    raise ValueError("Unknown POSE_ESTIMATOR.TYPE: %s" % cfg.POSE_ESTIMATOR.TYPE)


def _dtype(cfg):
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
