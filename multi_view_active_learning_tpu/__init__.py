"""TPU-native multi-view active-learning framework for 3D pose estimation.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
facebookresearch/multi_view_active_learning (WACV 2023): 2D heatmap pose
estimators (PoseResNet / HRNet) over multi-camera rigs, batched on-device
RANSAC-DLT triangulation, active-learning uncertainty scoring and selection,
self-training with triangulated pseudo-labels, and MKPE / 3D-PCK / PCKh
evaluation.

Design pillars (TPU-first, not a port):
  * All hot math (heatmap decode, DLT/RANSAC, uncertainty metrics, pairwise
    distances) is fixed-shape, batched, and jit-compiled; no per-sample
    Python loops on the scoring path.
  * Multi-chip scaling via ``jax.sharding.Mesh(('data', 'view'))`` +
    ``shard_map``: the camera-view axis (the reference's implicit scaling
    dimension) is a first-class mesh axis.
  * Checkpointing via orbax; file-based guid replay logs identical in format
    to the reference for resume parity.
"""

__version__ = "0.1.0"
