"""Typed configuration tree with YAML overrides.

Replaces the reference's yacs config stack (reference: config.py:13-106,
dataset/config.py:10-51, pose_estimators/config.py:10-56) with plain
dataclasses.  The option inventory and defaults match the reference so a
user's experiment YAML ports unchanged; TPU-specific knobs live under
``cfg.TPU``.

YAML override semantics follow yacs ``merge_from_file``: nested keys map to
nested dataclasses, unknown keys raise.
"""

from __future__ import annotations

import dataclasses
import io
from dataclasses import dataclass, field
from typing import Any, List, Optional

import yaml


@dataclass
class SALConfig:
    # Pseudo-label frame schedule per AL iteration (reference: config.py:28).
    NUM_FRAMES: List[int] = field(
        default_factory=lambda: [0, 20, 20, 30, 30, 40, 40, 50, 50, 50]
    )
    INLIER_THRESHOLD: int = 7
    CLUSTER_FILE_PATH: str = ""
    NUM_CLUSTERS: int = 10


@dataclass
class ALInferenceConfig:
    # For AL_EVAL experiments.
    TRAINING_EXPR_NAME: str = ""
    # For EVAL experiments.
    RESTORE_FROM: str = ""
    # PER-DEVICE frames per scoring/eval batch (the reference's per-GPU DDP
    # semantics): global batch = BATCH_SIZE x mesh 'data' axis.
    BATCH_SIZE: int = 2
    NUM_WORKERS: int = 2


@dataclass
class ALClusterConfig:
    # Cluster by LOSS or by POSE (reference: config.py:70-73).
    TYPE: str = "LOSS"
    SAVE_PATH: str = ""
    RESTORE_FROM: str = ""


@dataclass
class ALConfig:
    # Strategies: HP | BSB | RANDOM | MPE | TRIANGULATION | CORESET
    # (reference: config.py:34-41).
    STRATEGY: str = "RANDOM"
    INITIAL_AMOUNT: int = 200
    ITER_AMOUNT: int = 100
    START_ITER: int = 0
    PREVIOUS_AL_LOG_DIR: str = ""
    ITERATIONS: int = 10
    # For the TRIANGULATION strategy (reference: config.py:48-51).
    USE_SOFTARGMAX: bool = False
    USE_REPROJECTION_XE: bool = False
    REPROJECTION_SIGMA: float = 1.0
    # AVG or STD aggregation for per-(view, joint) metrics.
    MPE_CONFIG: str = "AVG"
    BSB_CONFIG: str = "AVG"
    HP_CONFIG: str = "AVG"
    # CORESET feature space: POSE (root-centered triangulated 3D poses,
    # the reference's utils/coreset.py:35-47 semantics, the default) or
    # EMBEDDING (globally-pooled CNN trunk features, the formulation the
    # coreset paper and BASELINE.json's north star describe).  EMBEDDING
    # runs one extra pooled-trunk sweep over the labeled set per
    # iteration (engine.embed_step) — the unlabeled side rides the
    # scoring sweep already being paid.
    CORESET_FEATURES: str = "POSE"
    # Beyond-reference: weight the DLT refit by per-view heatmap peak
    # confidence (weighted least squares).  Off by default for parity.
    CONFIDENCE_WEIGHTED_DLT: bool = False
    # Huber-robust direct reprojection-error refinement after the RANSAC
    # refit — the reference's `direct_optimization` triangulation() option
    # (utils/triangulation.py:178,319-337: scipy least_squares huber/trf),
    # here a fixed-iteration on-device Levenberg-Marquardt
    # (ops/triangulate.py::_huber_refine).  Off by default like the
    # reference (no caller there ever passes True); applies to the scoring
    # pass only — eval triangulation stays at reference defaults.
    DIRECT_OPTIMIZATION: bool = False
    # RANSAC budget: number of view pairs per joint.  64 is the reference's
    # own default (utils/triangulation.py:176); when C(V,2) <= 64 every pair
    # is used (exact), otherwise a seeded permutation picks 64 — one static
    # subset for all joints/frames (the reference re-shuffles per call,
    # utils/triangulation.py:279-282, which a fixed-shape compiled program
    # cannot; statistically equivalent, and deterministic here).  -1 = all
    # C(V,2) pairs: the exactness upgrade, ~5% slower on 31-view scoring
    # (280 -> 267 fps, BENCH_NOTES round 3).
    RANSAC_N_ITERS: int = 64
    RANSAC_EPSILON: float = 5.0
    INFERENCE: ALInferenceConfig = field(default_factory=ALInferenceConfig)
    CLUSTER: ALClusterConfig = field(default_factory=ALClusterConfig)
    # Runtime-computed (reference adds it to cfg at workflow.py:249).
    CURRENT_ITER: int = 0


@dataclass
class OptimConfig:
    TOTAL_STEPS: int = 5000
    LR: float = 0.001
    LR_DECAY_STEP_SIZE: int = 3000
    # torch StepLR default gamma.
    LR_DECAY_RATE: float = 0.1


@dataclass
class TrainConfig:
    INIT_WEIGHT: str = ""
    AL_FIRST_BATCH_WEIGHTS: str = ""
    LOSS_CLIP_VALUE: float = 10.0
    RESTORE_FROM: str = ""
    FULLY_SUPERVISED_FRAME_COUNT: int = -1
    SIZE: int = -1
    VAL_SIZE: int = 320
    # PER-DEVICE frames per training batch (the reference's BATCH_SIZE is
    # per-GPU under DDP, workflow.py:133-138): the loader's global batch is
    # BATCH_SIZE x mesh 'data' axis, so default configs engage every device.
    BATCH_SIZE: int = 2
    NUM_WORKERS: int = 2
    LOG_EVERY_ITER: int = 500
    # Beyond-reference training objective (the reference only has heatmap
    # MSE, pose_estimators/loss.py:10-24):
    #   "MSE"          — the reference's masked heatmap MSE (default);
    #   "INTEGRAL"     — soft-argmax coordinate regression
    #                    (integral pose regression, Sun et al. ECCV'18);
    #   "MSE+INTEGRAL" — MSE + INTEGRAL_WEIGHT * integral term.
    LOSS: str = "MSE"
    INTEGRAL_WEIGHT: float = 1.0
    # softmax temperature over the predicted heatmap for the soft-argmax.
    INTEGRAL_BETA: float = 10.0
    OPTIM: OptimConfig = field(default_factory=OptimConfig)


@dataclass
class EvalConfig:
    # "2DPCKH", "3DPCK", "3DPCKH", "MKPE"
    METRIC: str = "3DPCK"


@dataclass
class HRNetStageConfig:
    NUM_MODULES: int = 1
    NUM_BRANCHES: int = 2
    BLOCK: str = "BASIC"
    NUM_BLOCKS: List[int] = field(default_factory=lambda: [4, 4])
    NUM_CHANNELS: List[int] = field(default_factory=lambda: [32, 64])
    FUSE_METHOD: str = "SUM"


@dataclass
class HRNetConfig:
    PRETRAINED_LAYERS: List[str] = field(
        default_factory=lambda: [
            "conv1", "bn1", "conv2", "bn2", "layer1",
            "transition1", "stage2", "transition2", "stage3",
        ]
    )
    FINAL_CONV_KERNEL: int = 1
    STAGE2: HRNetStageConfig = field(default_factory=HRNetStageConfig)
    STAGE3: HRNetStageConfig = field(
        default_factory=lambda: HRNetStageConfig(
            NUM_MODULES=4, NUM_BRANCHES=3, NUM_BLOCKS=[4, 4, 4],
            NUM_CHANNELS=[32, 64, 128],
        )
    )
    STAGE4: HRNetStageConfig = field(
        default_factory=lambda: HRNetStageConfig(
            NUM_MODULES=3, NUM_BRANCHES=4, NUM_BLOCKS=[4, 4, 4, 4],
            NUM_CHANNELS=[32, 64, 128, 256],
        )
    )


@dataclass
class PoseEstimatorConfig:
    # POSE_RESNET or HRNET (reference: pose_estimators/config.py:11).
    TYPE: str = "POSE_RESNET"
    LOAD_CNN_WEIGHTS: bool = True
    STRIDE: int = 4
    NUM_LAYERS: int = 50  # PoseResNet depth: 18/34/50/101/152.
    HRNET: HRNetConfig = field(default_factory=HRNetConfig)


@dataclass
class PanopticConfig:
    HOME: str = ""
    TRAIN_VAL_SPLIT: str = ""
    LABEL_PATH: str = ""
    GT_BOXES: str = ""
    SAMPLE_RATE: int = 25


@dataclass
class IH26MConfig:
    HOME: str = ""
    CAPTURE_RANGE: List[int] = field(default_factory=lambda: [0, 10])
    TEST_CAPTURE_RANGE: List[int] = field(default_factory=lambda: [0, 1])
    NUM_VIEW_PER_FRAME: int = 16
    TEST_NUM_VIEW_PER_FRAME: int = 32
    # Reproduce the reference's degenerate farthest-point camera pick
    # (ih26m_common_cams.py:47 no-op min-distance update -> it takes the
    # first N common cameras in capture-0 JSON key order).  Needed so
    # MPJPE-parity runs see the exact same views; the fixed greedy
    # farthest-point selection stays the default.
    REFERENCE_COMPAT_CAMS: bool = False


@dataclass
class DataConfig:
    PANOPTIC: PanopticConfig = field(default_factory=PanopticConfig)
    IH26M: IH26MConfig = field(default_factory=IH26MConfig)
    # "panoptic", "ih26m", or "synthetic" (synthetic rigs for tests/bench).
    TYPE: str = "panoptic"
    SYNTHETIC_ROOT: str = ""
    INPUT_WIDTH: int = 256
    INPUT_HEIGHT: int = 256
    SCALE_BBOX: float = 1.0
    SIGMA: float = 1.0
    PSEUDO_LABEL_SIGMA: float = 1.0
    EPOCH_SIZE: int = 2000
    # 19 for panoptic; 42 for ih26m.
    NUM_JOINTS: int = 19
    # Native host loader (native/mval_host.cc): fused C++ JPEG
    # decode+crop+Lanczos per view; falls back to PIL when the library is
    # unavailable.  NATIVE_FAST_SCALE additionally allows fractional-IDCT
    # decode for large frames (throughput mode, not bit-exact).
    USE_NATIVE_LOADER: bool = True
    NATIVE_FAST_SCALE: bool = False
    # Ship full uint8 frames to the device and run the square-box crop +
    # bilinear resize there (ops/image.py::crop_resize_uint8) instead of
    # host-side PIL/native Lanczos.  For direct-attached TPUs with many
    # person crops per frame (or re-crops under augmentation) this moves
    # the per-view resample off the host; through a slow host<->device link
    # shipping full frames is a net loss, so it is off by default.
    # Requires every view of a dataset to share one frame size.
    DEVICE_CROP: bool = False
    # Decoded-view cache entries (0 disables).  Training epochs re-iterate
    # the same small labeled pool (resample_frames duplicates it to
    # EPOCH_SIZE, dataset.py:76-96 in the reference, which re-decodes every
    # copy); caching prepared views removes that host bottleneck.  One
    # 256x256 view is ~190 KB -> 10000 entries ~ 1.9 GB.
    VIEW_CACHE_SIZE: int = 10000
    # Augmentation (reference: dataset/config.py:43-47).
    NUM_AUG: int = 0
    AUG_MAGNITUDE: int = 0
    USE_ROTATION: bool = True
    USE_IMAGE_AUG: bool = True
    USE_CONST_AUG_MAGNITUDE: bool = True


@dataclass
class TPUConfig:
    """TPU-native knobs with no reference equivalent."""

    # Mesh axis sizes.  -1 infers from jax.device_count(): all devices go to
    # 'data' unless VIEW_AXIS > 1.
    DATA_AXIS: int = -1
    VIEW_AXIS: int = 1
    # Model compute dtype ("bfloat16" or "float32"); params stay f32.
    COMPUTE_DTYPE: str = "bfloat16"
    # Rematerialize backbone stages in the train step to trade FLOPs for HBM.
    REMAT: bool = False
    # Mathematically exact fast paths (see models/pose_resnet.py
    # SpaceToDepthStem / PhaseDeconv): the 7x7/s2 3-channel stem as a dense
    # space-to-depth conv, and the k4/s2 transposed convs as one 2x2 conv +
    # phase interleave.  Param trees are identical either way.
    # Space-to-depth the raw uint8 frames before normalization on the
    # scoring/eval path so the stem runs as a dense 4x4/s1 conv on 12
    # channels (mathematically exact; the ISOLATED stem measures 8.4 ->
    # 4.0 ms on the 124-crop scoring batch, but the FULL score_step
    # measures ~3% slower with it — on this backend whole-graph XLA
    # scheduling beats the source-level reformulation; see BENCH_NOTES.md
    # round-2 analysis).  Kept as an exact, tested option.
    SPACE_TO_DEPTH_STEM: bool = False
    # PhaseDeconv reformulation of the transposed-conv head: exact and
    # tested, but measured SLOWER on the v5e axon backend (the phase
    # interleave relayouts are HBM-bound: head 6.4 -> 14.3 ms).  Kept as an
    # option for other backends.
    FAST_DECONV: bool = False
    # DLT solver for the 4x4 normal equations:
    #   "power" — adjugate inverse iteration, closed-form elementwise math;
    #             ~3 orders of magnitude faster than batched eigh/svd on TPU
    #             at equal-or-better accuracy (the default);
    #   "eigh"  — jnp.linalg.eigh on A^T A;
    #   "svd"   — reference-parity path through jnp.linalg.svd.
    DLT_METHOD: str = "power"
    # Use Pallas kernels where available (coreset pairwise distances, fused
    # heatmap decode).  Falls back to pure-XLA implementations when False or
    # when the backend lacks Pallas support.
    USE_PALLAS: bool = True
    # Int8 quantized SCORING inference (PoseResNet + HRNet): backbone convs
    # run s8xs8->s32 on the MXU (2x bf16 peak) with per-output-channel
    # weight scales, calibrated static activation scales, and BN folded
    # into the requantization epilogue (models/quantize.py).  Training, the
    # deconv head, and eval stay float.  ON by default for score_step: the
    # AL metric only feeds frame SELECTION (a ranking), and on a trained
    # synthetic checkpoint the int8 ranking matches float (top-k overlap /
    # rank correlation evidence in BENCH_NOTES round 3) at 269 vs 224
    # frames/s measured.  Set False for bit-float scoring parity runs.
    INT8_SCORING: bool = True
    # Apply INT8_SCORING to HRNet too.  Off by default: HRNet's scoring
    # step is bound by its small-channel (32/64) 3x3 exchange-unit convs —
    # tiling/bandwidth-limited at 48% MFU, not MXU-peak-limited — so the s8
    # path buys nothing and the requant epilogues net a measured LOSS
    # (133-141 fps int8 vs 145 float, B=4 x 31 views, BENCH_NOTES round 3).
    # PoseResNet (64-2048 channels, MXU-peak-bound) keeps int8: 280 vs 238.
    INT8_SCORING_HRNET: bool = False
    # Mixed-precision int8 (PoseResNet): run the LAST n of the four
    # residual stages in bf16 while the FLOP-heavy early stages keep the
    # s8 MXU path.  The lever for strategies that rank raw heatmap VALUES
    # (MPE/BSB): full-pipeline requant perturbs the peak masses they
    # score, but the perturbation that matters enters via the late
    # stages.  Engine.INT8_MIXED_TAIL applies a measured-safe minimum
    # tail automatically for those strategies; this knob only raises it.
    INT8_FLOAT_TAIL_STAGES: int = 0
    # Bypass the per-strategy int8 gate (engine.Engine.INT8_SAFE_STRATEGIES
    # — MPE/BSB measured ranking-UNSAFE under int8, BENCH_NOTES round 4).
    # For the evidence harness (tools/validate_learning.py --int8_compare)
    # and users who accept perturbed uncertainty rankings for the speed.
    INT8_SCORING_FORCE: bool = False
    # HRNet branch blocks with <= this many channels compute their 3x3
    # convs 2x2-output-packed ([4,4,C,4C] stride-2 conv + depth-to-space,
    # ops/packed_conv.py) — the output-lane-fill attack on the
    # small-channel branch convs.  MEASURED A 2x NET LOSS on the v5e axon
    # backend (71 vs 145 fps; trace: XLA's fine conv already runs ~48%
    # MFU at C=32, and the per-conv depth-to-space adds 38% pure relayout
    # — BENCH_NOTES round 4).  Kept as a tested option for backends whose
    # conv lowering IS lane-starved.  0 (default) disables; 32 packs
    # branch 0 only.  Bit-identical parameter tree either way.
    HRNET_PACKED_MAX_CH: int = 0
    # With INT8_SCORING, also run the PoseResNet deconv head through the
    # fused int8 Pallas phase-deconv kernel
    # (ops/pallas/deconv.py::fused_deconv_bn_relu_int8): the k4/s2
    # transposed convs become dense 2x2 s8 matmuls on the MXU with the
    # requant + interleave kept in VMEM.  Requires USE_PALLAS; measured on
    # the v5e axon backend before defaulting (BENCH_NOTES round 3).
    INT8_DECONV: bool = False
    # Int8 backbone for the EVAL path too (reported MKPE/PCK metrics).
    # Off by default: metric reporting keeps the reference's float
    # contract; flip on only for throughput sweeps where approximate eval
    # is acceptable.
    INT8_EVAL: bool = False
    # Run the PoseResNet deconv head through the fused Pallas kernel on the
    # inference paths (score/eval/forward): exact phase-decomposed
    # ConvTranspose + folded-BN + ReLU with the interleave kept in VMEM
    # (ops/pallas/deconv.py) instead of XLA's input-dilated lowering.
    # Requires USE_PALLAS and a Pallas-capable backend; training always
    # uses the standard head (the kernel has no backward pass).
    PALLAS_HEAD: bool = False


@dataclass
class Config:
    EXPR_NAME: str = "EXPR"
    # AL | SAL | SUPERVISED | AL_EVAL | EVAL | CLUSTER
    # (reference: config.py:14-22; the reference's "CLUSETER" typo at
    # workflow.py:99 is fixed here).
    EXPR_TYPE: str = "SUPERVISED"
    LOG_DIR: str = "/tmp/mval_tpu_logs"
    COMMENT: str = "N/A"
    RANDOM_SEED: int = 1307
    RESULTS: str = ""
    SAL: SALConfig = field(default_factory=SALConfig)
    AL: ALConfig = field(default_factory=ALConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    EVAL: EvalConfig = field(default_factory=EvalConfig)
    POSE_ESTIMATOR: PoseEstimatorConfig = field(default_factory=PoseEstimatorConfig)
    DATA: DataConfig = field(default_factory=DataConfig)
    TPU: TPUConfig = field(default_factory=TPUConfig)

    def clone(self) -> "Config":
        return _clone(self)

    def dump(self) -> str:
        return yaml.safe_dump(dataclasses.asdict(self), sort_keys=False)

    def merge_from_file(self, path: str) -> None:
        # Via utils/storage: config files ride the same pluggable IO as
        # datasets and guid logs (a gs://-hosted experiment dir can hold
        # its own config).
        from .utils import storage

        with storage.open_file(path) as f:
            overrides = yaml.safe_load(f) or {}
        _merge(self, overrides, path=[])

    def merge_from_dict(self, overrides: dict) -> None:
        _merge(self, overrides, path=[])


def _clone(node: Any) -> Any:
    if dataclasses.is_dataclass(node):
        return type(node)(
            **{
                f.name: _clone(getattr(node, f.name))
                for f in dataclasses.fields(node)
            }
        )
    if isinstance(node, list):
        return [_clone(v) for v in node]
    if isinstance(node, dict):
        return {k: _clone(v) for k, v in node.items()}
    return node


def _merge(node: Any, overrides: dict, path: List[str]) -> None:
    for key, value in overrides.items():
        if not hasattr(node, key):
            raise KeyError(
                "Unknown config key: %s" % ".".join(path + [str(key)])
            )
        current = getattr(node, key)
        if dataclasses.is_dataclass(current):
            if not isinstance(value, dict):
                raise TypeError(
                    "Config node %s expects a mapping, got %r"
                    % (".".join(path + [str(key)]), value)
                )
            _merge(current, value, path + [str(key)])
        else:
            if current is not None and value is not None:
                expected = type(current)
                if expected in (int, float) and isinstance(value, (int, float)):
                    value = expected(value)
                elif expected is list and not isinstance(value, list):
                    # Scalar -> singleton list: the reference's own
                    # experiments/sample-config.yaml sets SAL.NUM_FRAMES: 20
                    # (a scalar) for a list-typed key; accept it so user
                    # experiment YAMLs port unchanged.
                    value = [value]
                elif not isinstance(value, expected):
                    raise TypeError(
                        "Config key %s expects %s, got %r"
                        % (".".join(path + [str(key)]), expected.__name__, value)
                    )
            setattr(node, key, value)


def get_default_configs() -> Config:
    return Config()


def load_config(path: Optional[str] = None) -> Config:
    cfg = get_default_configs()
    if path:
        cfg.merge_from_file(path)
    return cfg
