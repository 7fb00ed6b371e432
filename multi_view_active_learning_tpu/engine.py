"""Training/inference engine: jitted train, eval, and scoring steps.

Maps the reference's torch training internals to single-compilation JAX:

  * optimizer: Adam + StepLR(step_size, gamma=0.1) ==
    optax.adam(exponential_decay(..., staircase=True))
    (reference: strategy.py:405-410);
  * loss: masked heatmap MSE with the reference normalization
    (pose_estimators/loss.py:10-24, masking reshape strategy.py:762-770);
  * NaN/Inf/clip step-skip: the reference skips optimizer.step() when the
    loss is invalid (strategy.py:473-484); here the update is selected with
    jnp.where inside the compiled step so the skip costs nothing;
  * scoring/eval: model forward + batched triangulation + AL metric in ONE
    jitted call per batch — the reference's per-sample Python loop with
    GPU->CPU bounces and 8 all_gathers per sample (strategy.py:1004-1147)
    disappears; with a ('data','view') mesh the conv work shards over all
    devices and only the [B, V, K, 2] decoded keypoints are gathered.

BatchNorm note: under jit the batch statistics are computed over the global
(sharded) batch — stronger than the reference's per-GPU local BN stats; with
broadcast_buffers=True the reference broadcasts rank 0's buffers anyway.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models import build_model
from .ops import heatmap as heatmap_ops
from .ops import triangulate as tri
from .ops import uncertainty


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg) -> optax.Schedule:
    """StepLR equivalent: lr * 0.1^(step // decay_step_size)."""
    return optax.exponential_decay(
        init_value=cfg.TRAIN.OPTIM.LR,
        transition_steps=cfg.TRAIN.OPTIM.LR_DECAY_STEP_SIZE,
        decay_rate=cfg.TRAIN.OPTIM.LR_DECAY_RATE,
        staircase=True,
    )


class Engine:
    """Owns the model, optimizer, and compiled step functions."""

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.model = build_model(cfg)
        self.lr_schedule = make_lr_schedule(cfg)
        # Adam's moments and bias-correction count must NOT advance on
        # skipped steps (the reference skips optimizer.step() entirely),
        # but the LR schedule must advance every iteration regardless
        # (reference strategy.py:486: lr_scheduler.step() runs outside the
        # skip guard).  optax.adam(schedule) would keep the schedule count
        # inside opt_state, where the step-skip rollback would rewind it —
        # so the transform is bare scale_by_adam and train_step applies
        # -lr(state.step) itself.
        self.tx = optax.scale_by_adam()
        self.stride = cfg.POSE_ESTIMATOR.STRIDE
        from .ops.pallas import backend_supports_pallas

        self.use_pallas = bool(cfg.TPU.USE_PALLAS) and backend_supports_pallas()
        self.use_pallas_head = (
            self.use_pallas
            and bool(cfg.TPU.PALLAS_HEAD)
            and cfg.POSE_ESTIMATOR.TYPE == "POSE_RESNET"
        )
        self._pairs_cache: Dict[int, np.ndarray] = {}

    # -- state ----------------------------------------------------------------

    def init_state(self, rng: jax.Array, input_shape=None) -> TrainState:
        shape = input_shape or (
            1,
            self.cfg.DATA.INPUT_HEIGHT,
            self.cfg.DATA.INPUT_WIDTH,
            3,
        )
        # Jit the whole init: run eagerly, flax init dispatches one tiny
        # remote op per layer (~50 s through the tunneled runtime for
        # ResNet-18; one compiled program instead).
        def make(rng):
            variables = self.model.init(
                rng, jnp.zeros(shape, jnp.float32), train=False
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=batch_stats,
                opt_state=self.tx.init(params),
            )

        return jax.jit(make)(rng)

    def pairs(self, num_views: int) -> np.ndarray:
        if num_views not in self._pairs_cache:
            self._pairs_cache[num_views] = tri.all_view_pairs(
                num_views,
                n_iters=self.cfg.AL.RANSAC_N_ITERS,
                seed=int(self.cfg.RANDOM_SEED) & 0x7FFFFFFF,
            )
        return self._pairs_cache[num_views]

    # -- steps ----------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",), donate_argnames=("state",))
    def train_step(
        self, state: TrainState, images, gt_heatmaps, per_view_joint_valid,
        frame_valid,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One optimizer step.

        images: [B, V, H, W, 3] normalized; gt_heatmaps: [B, V, h, w, K];
        per_view_joint_valid: [B, V, K] bool; frame_valid: [B] bool (tail
        padding mask — padded frames contribute zero loss).
        """
        B, V = images.shape[0], images.shape[1]
        flat_images = images.reshape((B * V,) + images.shape[2:])
        flat_gt = gt_heatmaps.reshape((B * V,) + gt_heatmaps.shape[2:])
        mask = (
            per_view_joint_valid
            & frame_valid[:, None, None]
        ).reshape(B * V, 1, 1, -1)

        def forward_fn(params, images_in):
            return self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images_in,
                train=True,
                mutable=["batch_stats"],
            )

        if self.cfg.TPU.REMAT:
            # Rematerialize backbone activations in the backward pass —
            # trades FLOPs for HBM so larger B*V crop batches fit.
            forward_fn = jax.checkpoint(forward_fn)

        loss_type = self.cfg.TRAIN.LOSS
        if loss_type not in ("MSE", "INTEGRAL", "MSE+INTEGRAL"):
            raise NotImplementedError("Unknown TRAIN.LOSS: %s" % loss_type)

        # Normalize by the number of REAL crops, not the padded batch size:
        # the reference's loader never pads with zero-loss rows (DDP pads by
        # duplicating real frames, pose_estimators/loss.py:14-20 divides by
        # the real leading dim), so counting padded rows in the denominator
        # would dilute tail-batch gradients by n_real/B.
        n_valid_crops = jnp.sum(frame_valid.astype(jnp.float32)) * V

        def loss_fn(params):
            out, mutated = forward_fn(params, flat_images)
            loss = jnp.zeros((), jnp.float32)
            if loss_type in ("MSE", "MSE+INTEGRAL"):
                loss = heatmap_ops.heatmap_mse_loss(
                    out, flat_gt, mask,
                    num_samples=jnp.maximum(n_valid_crops, 1.0),
                )
            if loss_type in ("INTEGRAL", "MSE+INTEGRAL"):
                weight = (
                    self.cfg.TRAIN.INTEGRAL_WEIGHT
                    if loss_type == "MSE+INTEGRAL"
                    else 1.0
                )
                loss = loss + weight * heatmap_ops.integral_regression_loss(
                    out,
                    flat_gt,
                    mask[:, 0, 0, :],
                    beta=self.cfg.TRAIN.INTEGRAL_BETA,
                )
            # First crop's prediction rides along for figure logging: the
            # diagnostic then needs no extra forward executable (minutes of
            # 1-core compile each on this host) and always shows the float
            # train-mode model, never the int8 scoring path.
            return loss, (mutated["batch_stats"], out[0].astype(jnp.float32))

        (loss, (new_stats, first_heatmap)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # LR comes from the always-advancing state.step (see __init__ on why
        # it must live outside opt_state); this is also the lr actually
        # applied this step, so the logged value can't diverge from it.
        lr = self.lr_schedule(state.step)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)

        # Step-skip on invalid loss (reference: strategy.py:473-484), and on
        # all-padding batches (possible under multi-process shard
        # equalization): without the n_valid guard a zero-gradient batch
        # would still apply a pure-momentum Adam update, drifting params on
        # steps the reference would never run.
        ok = (
            jnp.isfinite(loss)
            & (loss <= self.cfg.TRAIN.LOSS_CLIP_VALUE)
            & (n_valid_crops > 0)
        )

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )

        state = TrainState(
            step=state.step + 1,
            params=sel(new_params, state.params),
            batch_stats=sel(new_stats, state.batch_stats),
            opt_state=sel(new_opt_state, state.opt_state),
        )
        metrics = {
            "loss": loss,
            "skipped": ~ok,
            "lr": lr,
            # [h, w, K] predicted heatmap of the batch's first crop (first
            # frame, first view) — fetched only at log points.
            "first_heatmap": first_heatmap,
        }
        return state, metrics

    def _flatten_normalize(self, images, use_int8: bool = False):
        """[B, V, H, W, 3] -> normalized [B*V, H', W', C'] in compute dtype
        (uint8 inputs get the fused ImageNet normalization; float inputs
        are assumed pre-normalized).  The space-to-depth fast path applies
        to both the float and int8 forwards (quantize.py's stem accepts
        the 12-channel layout with the exact kernel remap)."""
        B, V = images.shape[0], images.shape[1]
        flat = images.reshape((B * V,) + images.shape[2:])
        if flat.dtype == jnp.uint8:
            from .models import pose_resnet
            from .ops import geometry

            dtype = (
                jnp.bfloat16
                if self.cfg.TPU.COMPUTE_DTYPE == "bfloat16"
                else jnp.float32
            )
            mean = np.asarray(geometry.IMAGENET_MEAN)
            std = np.asarray(geometry.IMAGENET_STD)
            if (
                self.cfg.TPU.SPACE_TO_DEPTH_STEM
                and self.cfg.POSE_ESTIMATOR.TYPE == "POSE_RESNET"
                and flat.shape[1] % 2 == 0
                and flat.shape[2] % 2 == 0
            ):
                # Space-to-depth on the raw uint8 frames (4x fewer bytes
                # than post-normalize), then normalize in the dense
                # 12-channel layout; the stem conv runs as a 4x4/s1 dense
                # conv on 12 channels instead of 7x7/s2 on 3 (exact same
                # math — SpaceToDepthStem).  Measured 8.4 -> 4.0 ms for the
                # stem on the 124-crop scoring batch.
                flat = pose_resnet.space_to_depth(flat)
                mean, std = np.tile(mean, 4), np.tile(std, 4)
            flat = (
                flat.astype(dtype) / 255.0 - jnp.asarray(mean, dtype)
            ) / jnp.asarray(std, dtype)
        return flat

    def _int8_supported(self) -> bool:
        """Int8 is implemented for both families but DEFAULTS on only where
        it measures faster: PoseResNet (MXU-peak-bound, 280 vs 238 fps).
        HRNet's small-channel exchange units are tiling-bound at 48% MFU —
        int8 measured a net loss there (133-141 vs 145 fps, BENCH_NOTES
        round 3) — so it needs the explicit TPU.INT8_SCORING_HRNET opt-in."""
        if self.cfg.POSE_ESTIMATOR.TYPE == "POSE_RESNET":
            return True
        return (
            self.cfg.POSE_ESTIMATOR.TYPE == "HRNET"
            and bool(self.cfg.TPU.INT8_SCORING_HRNET)
        )

    # Strategies whose selection MEASURED int8-safe on trained synthetic
    # checkpoints (tools/validate_learning.py --int8_compare, BENCH_NOTES
    # round 4): TRIANGULATION/HP rank_corr 0.93/1.00 and CORESET selection
    # overlap 1.00, but MPE 0.45 and BSB 0.79 — those two rank raw heatmap
    # VALUES (entropy of peak masses; |p0 - p1| of the top two peaks),
    # which int8 requant rounding perturbs directly, where the safe ones
    # consume argmax LOCATIONS or triangulated geometry.  RANDOM never
    # runs a forward.
    INT8_SAFE_STRATEGIES = ("TRIANGULATION", "HP", "CORESET", "RANDOM")

    # Strategies whose selection measured int8-UNSAFE with the full int8
    # backbone but SAFE with a mixed-precision float tail
    # (quantized_pose_resnet_forward float_tail_stages; evidence:
    # tools/validate_learning.py --int8_compare mixed arm, BENCH_NOTES
    # round 5): {strategy: minimum float tail stages}.  Populated only for
    # strategies with measured evidence; empty entries mean "score float".
    INT8_MIXED_TAIL: Dict[str, int] = {}

    @property
    def use_int8(self) -> bool:
        """Int8 backbone for the SCORING path (TPU.INT8_SCORING), gated to
        the strategies with measured selection-parity evidence (see
        INT8_SAFE_STRATEGIES); MPE/BSB always score float.

        CORESET with EMBEDDING features reports False (unless explicitly
        forced): score_step runs the float features-forward there
        regardless, so claiming int8 would only buy a never-used
        calibration compile and a wrong log line.  TPU.INT8_SCORING_FORCE
        overrides every gate — it is how the evidence harness measures raw
        behavior and how non-scoring surfaces (serving export) request the
        int8 backbone regardless of the AL strategy in the config."""
        if (
            self.cfg.AL.STRATEGY == "CORESET"
            and self.cfg.AL.CORESET_FEATURES == "EMBEDDING"
            and not self.cfg.TPU.INT8_SCORING_FORCE
        ):
            return False
        return (
            bool(self.cfg.TPU.INT8_SCORING)
            and self._int8_supported()
            and (
                self.cfg.AL.STRATEGY in self.INT8_SAFE_STRATEGIES
                or self.cfg.AL.STRATEGY in self.INT8_MIXED_TAIL
                or bool(self.cfg.TPU.INT8_SCORING_FORCE)
            )
        )

    @property
    def use_int8_eval(self) -> bool:
        """Int8 backbone for the EVAL path (TPU.INT8_EVAL; off by default —
        reported metrics keep the reference's float contract)."""
        return bool(self.cfg.TPU.INT8_EVAL) and self._int8_supported()

    def _int8_forward(self, params, batch_stats, flat, act_scales=None,
                      collect_scales=False):
        from .models import quantize

        if self.cfg.POSE_ESTIMATOR.TYPE == "HRNET":
            hr = self.model  # PoseHighResolutionNet
            return quantize.quantized_hrnet_forward(
                params, batch_stats, flat,
                hr.stage2, hr.stage3, hr.stage4, hr.final_conv_kernel,
                act_scales=act_scales, collect_scales=collect_scales,
            )
        return quantize.quantized_pose_resnet_forward(
            params, batch_stats, flat, self.cfg.POSE_ESTIMATOR.NUM_LAYERS,
            act_scales=act_scales, collect_scales=collect_scales,
            int8_head=bool(self.cfg.TPU.INT8_DECONV) and self.use_pallas,
            float_tail_stages=self.int8_float_tail,
        )

    @property
    def int8_float_tail(self) -> int:
        """Effective mixed-precision float tail for the int8 PoseResNet
        forward: the config knob, raised to the measured-safe minimum for
        strategies in INT8_MIXED_TAIL.  TPU.INT8_SCORING_FORCE suppresses
        the automatic raise (the evidence harness measures RAW configs)."""
        tail = int(self.cfg.TPU.INT8_FLOAT_TAIL_STAGES)
        if (
            not self.cfg.TPU.INT8_SCORING_FORCE
            and self.cfg.AL.STRATEGY in self.INT8_MIXED_TAIL
        ):
            tail = max(tail, self.INT8_MIXED_TAIL[self.cfg.AL.STRATEGY])
        return tail

    @partial(jax.jit, static_argnames=("self",))
    def _int8_calibrate_step(self, params, batch_stats, images):
        flat = self._flatten_normalize(images, use_int8=True)
        _, scales = self._int8_forward(
            params, batch_stats, flat, collect_scales=True
        )
        return scales

    def int8_calibrate(self, params, batch_stats, images, for_eval: bool = False):
        """One-batch activation-scale calibration for static int8 inference
        (models/quantize.py).  Returns the scale table to pass back into
        forward/score_step/eval_step as `int8_scales`, or None when the
        respective int8 path (scoring, or eval with for_eval=True) is off —
        callers can pass the result through unconditionally."""
        if not (self.use_int8_eval if for_eval else self.use_int8):
            return None
        return self._int8_calibrate_step(params, batch_stats, images)

    def forward(
        self, params, batch_stats, images, int8_scales=None, use_int8=None
    ) -> jnp.ndarray:
        """Inference heatmaps: [B, V, H, W, 3] -> [B, V, h, w, K].

        uint8 inputs are raw pixels: ImageNet normalization happens here in
        the compute dtype, fused into the same executable as the convs (no
        separately materialized float32 image array — a 4x HBM/transfer
        saving for scoring and eval, which never need GT heatmaps or
        augmentation).  float inputs are assumed pre-normalized
        (the training path, where RandAugment runs first).

        `int8_scales`: static activation-scale table from int8_calibrate
        (None falls back to dynamic scales).  `use_int8` selects the int8
        backbone explicitly; None means the SCORING default
        (TPU.INT8_SCORING) — eval surfaces pass use_int8_eval.

        None is resolved HERE, outside the jit boundary: `use_int8` is a
        static jit arg, so letting both None and the equal explicit bool
        reach the cache would compile the identical graph twice (minutes
        per extra full-network compile on this 1-core host)."""
        if use_int8 is None:
            use_int8 = self.use_int8
        return self._forward_jit(
            params, batch_stats, images, int8_scales, bool(use_int8)
        )

    @partial(jax.jit, static_argnames=("self", "use_int8"))
    def _forward_jit(
        self, params, batch_stats, images, int8_scales, use_int8
    ) -> jnp.ndarray:
        B, V = images.shape[0], images.shape[1]
        flat = self._flatten_normalize(images, use_int8=use_int8)
        if use_int8:
            out = self._int8_forward(
                params, batch_stats, flat, act_scales=int8_scales
            )
        elif self.use_pallas_head:
            # Fused Pallas deconv head: trunk through the flax module, head
            # through ops/pallas/deconv.py (exact, inference only).
            from .ops.pallas import deconv as pallas_deconv

            trunk = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                flat,
                train=False,
                skip_head=True,
            )
            out = pallas_deconv.apply_pose_resnet_head(
                trunk, params, batch_stats
            )
        else:
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, flat, train=False
            )
        return out.reshape((B, V) + out.shape[1:])

    @partial(
        jax.jit,
        static_argnames=("self", "al_strategy", "mpe_aggregate", "hp_aggregate",
                         "bsb_aggregate"),
    )
    def score_step(
        self,
        params,
        batch_stats,
        images,
        proj_matrices,
        joint_valid,
        pairs,
        gt_keypoints_3d,
        rng_key,
        al_strategy: str = "TRIANGULATION",
        mpe_aggregate: str = "AVG",
        hp_aggregate: str = "AVG",
        bsb_aggregate: str = "AVG",
        int8_scales=None,
    ) -> Dict[str, jnp.ndarray]:
        """Unlabeled-pool scoring: forward + triangulation + AL metric for a
        whole batch in one compiled call (replaces strategy.py:1004-1147).

        Returns per-frame arrays: keypoints_3d [B, K, 3], sal_metric [B],
        inlier_count [B], al_metric [B], mkpe [B] — plus embedding [B, C]
        (view-averaged pooled trunk features) when the CORESET strategy
        runs with AL.CORESET_FEATURES=EMBEDDING.
        """
        want_embedding = (
            al_strategy == "CORESET"
            and self.cfg.AL.CORESET_FEATURES == "EMBEDDING"
        )
        embedding = None
        if want_embedding:
            # One shared forward yields heatmaps AND the pooled trunk
            # embedding; use_int8 reports False for this combo (see the
            # property) so no calibration is ever paid for it.
            heatmaps, embedding = self._features_forward(
                params, batch_stats, images
            )
        else:
            heatmaps = self.forward(
                params, batch_stats, images, int8_scales,
                use_int8=self.use_int8,
            )
        res = tri.triangulate_frames(
            heatmaps,
            proj_matrices,
            joint_valid,
            pairs,
            stride=self.stride,
            use_soft_argmax=self.cfg.AL.USE_SOFTARGMAX,
            use_reprojection_xe=self.cfg.AL.USE_REPROJECTION_XE,
            sigma=self.cfg.AL.REPROJECTION_SIGMA,
            epsilon=self.cfg.AL.RANSAC_EPSILON,
            method=self.cfg.TPU.DLT_METHOD,
            use_pallas=self.use_pallas,
            confidence_weighted=self.cfg.AL.CONFIDENCE_WEIGHTED_DLT,
            direct_optimization=self.cfg.AL.DIRECT_OPTIMIZATION,
        )
        B = images.shape[0]
        if al_strategy == "RANDOM":
            al_metric = jax.random.uniform(rng_key, (B,))
        elif al_strategy == "TRIANGULATION":
            al_metric = res["metric"]
        elif al_strategy == "MPE":
            al_metric = uncertainty.multi_peak_entropy(
                heatmaps, joint_valid, mpe_aggregate
            )
        elif al_strategy == "HP":
            al_metric = uncertainty.highest_probability(
                heatmaps, joint_valid, hp_aggregate
            )
        elif al_strategy == "BSB":
            al_metric = uncertainty.best_vs_second_best(
                heatmaps, joint_valid, bsb_aggregate
            )
        elif al_strategy == "CORESET":
            al_metric = jnp.zeros((B,))
        else:
            raise NotImplementedError("Unknown AL strategy: %s" % al_strategy)

        # Per-frame MKPE against GT (diagnostics / SAL histograms,
        # strategy.py:1134-1145).
        d = jnp.square(res["keypoints_3d"] - gt_keypoints_3d)
        d = jnp.where(joint_valid[..., None] > 0, d, 0.0)
        d = jnp.sqrt(jnp.sum(d, axis=-1))  # [B, K]
        count = jnp.maximum(jnp.sum(joint_valid, axis=-1), 1)
        mkpe = jnp.sum(d, axis=-1) / count

        out = {
            "keypoints_3d": res["keypoints_3d"],
            "sal_metric": res["metric"],
            "inlier_count": res["inlier_count"],
            "al_metric": al_metric,
            "mkpe": mkpe,
        }
        if embedding is not None:
            out["embedding"] = embedding
        return out

    def _features_forward(self, params, batch_stats, images):
        """Float forward returning (heatmaps [B, V, h, w, K], view-averaged
        pooled trunk embedding [B, C]) — the AL.CORESET_FEATURES=EMBEDDING
        path, shared by score_step and embed_step so the candidate and
        labeled-set embeddings can never diverge.

        Always the standard float apply: k-center distances on
        requant-perturbed features would buy noise, not speed, and the
        return_features contract lives in the flax modules (so
        TPU.PALLAS_HEAD's fused head does not apply here)."""
        B, V = images.shape[0], images.shape[1]
        flat = self._flatten_normalize(images, use_int8=False)
        out, feats = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            flat, train=False, return_features=True,
        )
        heatmaps = out.reshape((B, V) + out.shape[1:])
        return heatmaps, jnp.mean(feats.reshape(B, V, -1), axis=1)

    @partial(jax.jit, static_argnames=("self",))
    def embed_step(self, params, batch_stats, images) -> jnp.ndarray:
        """Pooled trunk embeddings: [B, V, H, W, 3] -> [B, C] float32
        (spatial mean of the pre-head feature map, averaged over views).

        The AL.CORESET_FEATURES=EMBEDDING feature extractor for frames the
        scoring sweep does not visit (the labeled set); unlabeled frames
        get the same embedding from score_step's shared forward."""
        return self._features_forward(params, batch_stats, images)[1]

    @partial(jax.jit, static_argnames=("self",))
    def eval_step(
        self, params, batch_stats, images, proj_matrices, joint_valid, pairs,
        int8_scales=None,
    ) -> Dict[str, jnp.ndarray]:
        """Validation triangulation (replaces strategy.py:584-634's
        per-sample loop + all_gathers).  Runs the float forward unless
        TPU.INT8_EVAL opts eval into the int8 backbone.

        Deliberately does NOT forward AL.USE_SOFTARGMAX /
        USE_REPROJECTION_XE to triangulate_frames: the reference's eval
        loop calls triangulation() with those left at their defaults
        (reference strategy.py:607-612) — only the scoring loop passes
        them (strategy.py:1042) — so eval decoding stays hard-argmax for
        parity even when scoring is configured otherwise."""
        heatmaps = self.forward(
            params, batch_stats, images, int8_scales,
            use_int8=self.use_int8_eval,
        )
        res = tri.triangulate_frames(
            heatmaps,
            proj_matrices,
            joint_valid,
            pairs,
            stride=self.stride,
            epsilon=self.cfg.AL.RANSAC_EPSILON,
            method=self.cfg.TPU.DLT_METHOD,
            use_pallas=self.use_pallas,
            confidence_weighted=self.cfg.AL.CONFIDENCE_WEIGHTED_DLT,
        )
        return {"keypoints_3d": res["keypoints_3d"]}

    @partial(jax.jit, static_argnames=("self",))
    def loss_step(self, params, batch_stats, images, gt_heatmaps) -> jnp.ndarray:
        """Per-frame heatmap MSE for CLUSTER TYPE=LOSS
        (reference: strategy.py:173-187): [B] losses normalized by h*w.
        Always float — the cluster file feeds SAL KMeans and the reference
        computes it with the float model."""
        heatmaps = self.forward(
            params, batch_stats, images, use_int8=False
        )  # [B, V, h, w, K]
        sq = jnp.square(heatmaps - gt_heatmaps)
        h, w = heatmaps.shape[2], heatmaps.shape[3]
        return jnp.sum(sq, axis=(1, 2, 3, 4)) / (h * w)
