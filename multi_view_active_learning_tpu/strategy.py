"""Active-learning strategy engine: training, evaluation, pool scoring,
selection, and self-training orchestration.

This is the TPU-native rebuild of the reference's ActiveLearningStrategy
(strategy.py:28-1215).  Structural differences, all SURVEY.md §7 by design:

  * One process, one controller: no mp.spawn / process groups / rank gating;
    "rank 0 writes" becomes "jax.process_index() == 0 writes".
  * The scoring loop is a jitted batch program (engine.score_step): forward,
    triangulation, and the AL metric run on device per batch; the host only
    assembles {guid: score} dicts.  The reference looped per sample in
    Python with 8 all_gathers each (strategy.py:1036-1114).
  * Training steps skip bad losses inside the compiled step.
  * Checkpoints are orbax (CKPT-FINAL / CKPT-E{step}-MKPE{x}); guid replay
    logs (SAMPLED-GUID-ITER-*, SAL-GUID-ITER-*, SAL-DICT-ITER-*) keep the
    reference's JSON format byte-compatible for resume parity
    (strategy.py:54-135, 315-336).
"""

from __future__ import annotations

import json
import math
import os
import time
from collections import OrderedDict, deque
from heapq import nlargest
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import FrameLoader
from .data.pipeline import device_prepare
from .engine import Engine, TrainState
from .ops import coreset as coreset_ops
from .utils import checkpoint as ckpt
from .utils import storage
from .utils import RateLogger, evaluation, get_logger, profiling
from .utils.kmeans import KMeans
from .utils.metrics_writer import MetricsWriter


def _is_main() -> bool:
    return jax.process_index() == 0


class ActiveLearningStrategy:
    def __init__(self, al_cfg, mesh=None):
        self._logger = get_logger(__name__)
        self.al_cfg = al_cfg
        self.mesh = mesh
        self.engine = Engine(al_cfg, mesh)
        self.num_joints = al_cfg.DATA.NUM_JOINTS
        # Root joint for pose centering (reference: strategy.py:34-37).
        self.joint_root_index = 2 if al_cfg.DATA.TYPE != "ih26m" else 21
        self.al_writer: Optional[MetricsWriter] = None
        self._warned_shardings: set = set()
        self.kmeans: Optional[KMeans] = None
        if al_cfg.EXPR_TYPE == "SAL" and al_cfg.SAL.CLUSTER_FILE_PATH:
            with storage.open_file(al_cfg.SAL.CLUSTER_FILE_PATH) as f:
                clusters = json.load(f)
            kp_values = []
            for guid in clusters:
                kp = np.asarray(clusters[guid], dtype=np.float64)
                if kp.ndim < 2:
                    # A LOSS-type cluster dump ({guid: scalar}) cannot seed
                    # the pose KMeans; the reference crashes with a bare
                    # IndexError here (strategy.py:38-52) — fail clearly.
                    raise ValueError(
                        "SAL.CLUSTER_FILE_PATH must hold per-guid 3D poses "
                        "(a POSE-type cluster dump); entry %r has shape %s. "
                        "LOSS-type cluster files are for analysis, not "
                        "KMeans seeding." % (guid, kp.shape)
                    )
                if kp.shape[0] != 3 and kp.shape[-1] >= 3:
                    kp = kp.T[:3]  # [K, >=3] -> [3, K]
                kp = kp[:3] - kp[:3, self.joint_root_index : self.joint_root_index + 1]
                kp_values.append(kp.flatten())
            self.kmeans = KMeans(
                al_cfg.SAL.NUM_CLUSTERS, random_state=al_cfg.RANDOM_SEED
            ).fit(np.stack(kp_values))

    # ------------------------------------------------------------------ utils

    def _expr_dir(self, *sub) -> str:
        return storage.join(self.al_cfg.LOG_DIR, self.al_cfg.EXPR_NAME, *sub)

    def _rng(self, salt: int = 0) -> np.random.Generator:
        return np.random.default_rng((int(self.al_cfg.RANDOM_SEED) + salt) & 0x7FFFFFFF)

    def _data_parallelism(self) -> int:
        """Size of the mesh's 'data' axis (1 without a mesh)."""
        if self.mesh is None:
            return 1
        from . import parallel

        return int(self.mesh.shape[parallel.DATA_AXIS])

    def _local_data_parallelism(self) -> int:
        """The share of the 'data' axis THIS process feeds (per-GPU DDP
        batch semantics: each process loads batches for its own devices).
        Equal to the full axis in single-process runs."""
        data_n = self._data_parallelism()
        procs = jax.process_count()
        if procs == 1:
            return data_n
        if data_n % procs:
            raise ValueError(
                "Mesh 'data' axis (%d) must be divisible by the process "
                "count (%d) for multi-process batch assembly."
                % (data_n, procs)
            )
        return data_n // procs

    def _get_loader(
        self, pool, batch_size: int, num_workers: int | None = None
    ) -> FrameLoader:
        """Loader factory (reference: strategy.py:747-760).  `num_workers`
        follows the reference's DataLoader split: TRAIN.NUM_WORKERS for
        train/val/cluster loaders (the default), AL.INFERENCE.NUM_WORKERS
        for scoring/eval loaders; 0 = in-process decode.

        `batch_size` is PER-DEVICE, matching the reference's per-GPU DDP
        semantics (workflow.py:133-138: each of NUM_GPUS ranks loads its own
        BATCH_SIZE batch) — the loader's batch is scaled by the number of
        'data'-axis devices THIS PROCESS feeds, so the reference-default
        configs (BATCH_SIZE=2) engage every device instead of silently
        running on one.  Multi-process runs load the LOCAL share only
        (data_axis // process_count) from their own pool shard; `_put`
        assembles the global batch across processes."""
        if num_workers is None:
            num_workers = self.al_cfg.TRAIN.NUM_WORKERS
        return FrameLoader(
            pool,
            self.al_cfg.DATA,
            self.al_cfg.POSE_ESTIMATOR.STRIDE,
            batch_size=batch_size * self._local_data_parallelism(),
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
            num_workers=num_workers,
        )

    def _put(self, arr, view_axis: bool = False):
        """Host array -> device, sharded over the mesh when shapes divide.

        [B, V, ...] arrays shard (data, view); [B, ...] shard (data,).
        Arrays whose view dim does not divide the 'view' axis still shard
        their batch dim over 'data' (replicated across 'view').  A batch
        dim that does not divide 'data' cannot shard at all — that means
        every device but one idles, so it is a loud warning, not a silent
        fallback (with per-device batch scaling in _get_loader it can only
        happen for hand-built batches).

        Multi-process: `arr` is this process's LOCAL rows (the loader's
        shard); the returned array is GLOBAL — [B_local x process_count,
        ...] — assembled via jax.make_array_from_process_local_data.  The
        mesh's 'data' rows are process-contiguous (jax.devices() orders
        devices by process), so global row p*B_local+i is process p's row i
        — the same order FrameLoader.global_batch_layout reconstructs keys
        in.
        """
        arr = np.asarray(arr)
        if self.mesh is None or np.prod(self.mesh.devices.shape) == 1:
            return jnp.asarray(arr)
        from . import parallel

        procs = jax.process_count()
        data_n, view_n = (
            self.mesh.shape[parallel.DATA_AXIS],
            self.mesh.shape[parallel.VIEW_AXIS],
        )
        data_local = data_n // procs if procs > 1 else data_n
        if arr.ndim >= 1 and data_local > 0 and arr.shape[0] % data_local == 0:
            if (
                view_axis
                and arr.ndim >= 2
                and view_n > 1
                and arr.shape[1] % view_n == 0
            ):
                sharding = parallel.batch_sharding(self.mesh, arr.ndim, 1)
            else:
                sharding = parallel.data_sharding(self.mesh, arr.ndim)
            if procs > 1:
                global_shape = (arr.shape[0] * procs,) + arr.shape[1:]
                return jax.make_array_from_process_local_data(
                    sharding, arr, global_shape
                )
            return jax.device_put(arr, sharding)
        if procs > 1:
            # Single-process this fallback is merely slow; multi-process a
            # local jnp.asarray holds DIFFERENT rows on each process while
            # jit treats it as replicated-identical — silent garbage.
            raise ValueError(
                "Batch dim %s does not divide this process's share of the "
                "mesh 'data' axis (%d) — cannot assemble a global batch. "
                "Batch sizes are per-device; check the loader produced "
                "batch = per_device x local share." % (arr.shape[:1], data_local)
            )
        key = ("unsharded", arr.shape[0] if arr.ndim else 0, data_n)
        if key not in self._warned_shardings:
            self._warned_shardings.add(key)
            self._logger.warning(
                "Batch dim %s does not divide the mesh 'data' axis (%d): "
                "placing UNSHARDED — all but one device idle for this array. "
                "Batch sizes are per-device; check the loader produced "
                "batch = per_device x data_axis." % (arr.shape[:1], data_local)
            )
        return jnp.asarray(arr)

    def _fetch_global(self, tree):
        """Device results -> host numpy, whole-array on EVERY process.

        Single-process: plain device_get.  Multi-process: outputs are
        data-sharded global arrays whose shards live on other hosts too, so
        device_get would fail — all-gather them instead (every process needs
        the full pool's metrics for selection, exactly like the reference's
        sal_dict all_gather, reference: strategy.py:1090-1147)."""
        if jax.process_count() == 1:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        return jax.device_get(multihost_utils.process_allgather(tree, tiled=True))

    # In-flight dispatch window for the batch sweeps.  Enough queued batches
    # to overlap host prep + H2D with device compute; small enough to bound
    # the HBM pinned by undrained batch inputs (each dispatched batch holds
    # its images until the device executes it — with DATA.DEVICE_CROP a
    # full-frame HD batch is hundreds of MB, so an unbounded dispatch loop
    # over a large pool could OOM the device when host prep outruns compute).
    SWEEP_INFLIGHT_WINDOW = 4

    def _pipelined_fetch(self, dispatched):
        """Bounded dispatch-ahead pipelining shared by the sweep loops
        (pool scoring, 3D/2D eval, cluster).

        `dispatched` yields one (meta, tree) pair per batch: `meta` is
        passed through untouched (host-only values such as guid lists);
        `tree` holds the per-batch results to bring to the host — small
        device references and/or process-local host arrays — fetched with
        ONE _fetch_global call per batch (a single device round-trip
        through the tunneled runtime instead of one per array;
        multi-process, aligned per-leaf all-gathers).

        Yields (meta, fetched_tree) in dispatch order, keeping at most
        SWEEP_INFLIGHT_WINDOW batches in flight: a fetch inside the
        dispatch loop would block the host until the device drains
        (serializing next-batch prep against compute — the round-1
        training bottleneck), while fetching only after the loop leaves
        device-memory residency unbounded.  Multi-process: dispatch and
        fetch orders are the same deterministic function of the batch
        index on every process (loader batch counts are shard-equalized),
        so collectives stay aligned."""
        pending = deque()
        for item in dispatched:
            pending.append(item)
            # >= : the window is a hard residency bound — at no point are
            # more than SWEEP_INFLIGHT_WINDOW batches dispatched-unfetched
            # (sizing the window to the HBM budget must be exact; a strict
            # > here held window+1).
            if len(pending) >= self.SWEEP_INFLIGHT_WINDOW:
                meta, tree = pending.popleft()
                yield meta, self._fetch_global(tree)
        while pending:
            meta, tree = pending.popleft()
            yield meta, self._fetch_global(tree)

    def _device_images(self, batch: Dict):
        """batch["images"] placed on device; with DATA.DEVICE_CROP the
        loader ships full frames and the square-box crop + bilinear resize
        runs there (ops/image.py::crop_resize_uint8) — the device arrays
        any consumer sees are [B, V, INPUT_H, INPUT_W, 3] uint8 either way."""
        images = self._put(batch["images"], view_axis=True)
        if self.al_cfg.DATA.DEVICE_CROP:
            from .ops import image as image_ops

            images = image_ops.crop_resize_uint8(
                images,
                self._put(batch["square_box"], view_axis=True),
                self.al_cfg.DATA.INPUT_HEIGHT,
                self.al_cfg.DATA.INPUT_WIDTH,
            )
        return images

    def _device_batch(self, batch: Dict, train: bool, key) -> Tuple:
        """uint8 host batch -> normalized images + GT heatmaps on device."""
        d = self.al_cfg.DATA
        return device_prepare(
            self._device_images(batch),
            self._put(batch["2d_keypoints"], view_axis=True),
            self._put(batch["sigma"]),
            key,
            stride=self.al_cfg.POSE_ESTIMATOR.STRIDE,
            train=train,
            num_aug=d.NUM_AUG if train else 0,
            magnitude=d.AUG_MAGNITUDE,
            use_rotation=d.USE_ROTATION,
            use_image_aug=d.USE_IMAGE_AUG,
            const_magnitude=d.USE_CONST_AUG_MAGNITUDE,
        )

    def _maybe_replicate(self, state: TrainState) -> TrainState:
        """Replicate model/optimizer state over the mesh so it is co-addressable
        with mesh-sharded batches (fresh inits and orbax restores otherwise
        land on a single device)."""
        if self.mesh is None or np.prod(self.mesh.devices.shape) == 1:
            return state
        from . import parallel

        return parallel.replicate_tree(self.mesh, state)

    def new_state(self, salt: int = 0) -> TrainState:
        return self._maybe_replicate(
            self.engine.init_state(
                jax.random.PRNGKey((int(self.al_cfg.RANDOM_SEED) + salt) & 0x7FFFFFFF)
            )
        )

    # ----------------------------------------------------------- AL sampling

    def sample_next_batch(
        self, train_pool, al_num_frames, sal_num_frames, state, iteration
    ):
        """Reference: strategy.py:54-135."""
        if iteration == 0:
            self._logger.info(
                "%s strategy, randomly sampling the initial batch."
                % self.al_cfg.AL.STRATEGY
            )
            al_guids = self._random_sample_frames(train_pool, al_num_frames)
            sal_guids, sal_dict = [], {}
        else:
            self._logger.info(
                "%s strategy sampling %d frames."
                % (self.al_cfg.AL.STRATEGY, al_num_frames)
            )
            al_guids, sal_guids, sal_dict = self._sal_pseudo_labeling(
                train_pool, al_num_frames, sal_num_frames, state, iteration
            )
            if _is_main() and sal_dict:
                if self.al_writer is not None:
                    try:
                        if sal_guids:
                            for tag, src in (
                                ("sal/mkpe", "mkpe"),
                                ("sal/inlier_count", "inlier_count"),
                                ("sal/sal_metric", "sal_metric"),
                            ):
                                self.al_writer.add_histogram(
                                    tag,
                                    [sal_dict[src][g] for g in sal_guids],
                                    iteration,
                                )
                        al_with_metric = [
                            g for g in al_guids if g in sal_dict["al_metric"]
                        ]
                        self.al_writer.add_histogram(
                            "sal/al_metric",
                            [sal_dict["al_metric"][g] for g in al_with_metric],
                            iteration,
                        )
                        self.al_writer.add_scalar(
                            "sal/al_num_frames", len(al_guids), iteration
                        )
                        self.al_writer.add_scalar(
                            "sal/sal_num_frames", len(sal_guids), iteration
                        )
                    except Exception as ex:  # mirror reference's tolerance
                        self._logger.warning("Metrics writer error: %s" % ex)
                if sal_guids:
                    with storage.open_file(
                        self._expr_dir("SAL-GUID-ITER-%d" % iteration), "w"
                    ) as f:
                        f.write(json.dumps(sal_guids))
                with storage.open_file(
                    self._expr_dir("SAL-DICT-ITER-%d" % iteration), "w"
                ) as f:
                    f.write(json.dumps(sal_dict))
        if _is_main():
            storage.makedirs(self._expr_dir())
            with storage.open_file(
                self._expr_dir("SAMPLED-GUID-ITER-%d" % iteration), "w"
            ) as f:
                f.write(json.dumps(al_guids))
        return train_pool

    def _random_sample_frames(self, pool, num_frames: int, salt: int = 0) -> List[str]:
        """Reference: strategy.py:868-878.  A request larger than the
        remaining unlabeled pool selects the whole pool with a warning —
        consistent with the metric-driven strategies, where `nlargest`
        truncates (the reference instead crashes deep inside
        random.sample)."""
        rng = self._rng(salt)
        guids = list(pool.unlabeled_data.keys())
        if num_frames > len(guids):
            self._logger.warning(
                "Random sampling requested %d frames but only %d remain "
                "unlabeled; selecting all of them." % (num_frames, len(guids))
            )
            num_frames = len(guids)
        idx = rng.choice(len(guids), size=num_frames, replace=False)
        picked = [guids[i] for i in idx]
        pool.label_by_frame_guids(picked)
        return picked

    def _sal_pseudo_labeling(
        self, train_pool, al_num_frames, pseudo_num_frames, state, iteration
    ):
        """Scoring + selection + pseudo-labeling
        (reference: strategy.py:915-1002)."""
        cfg = self.al_cfg
        if cfg.AL.STRATEGY == "RANDOM" and cfg.EXPR_TYPE == "AL":
            # no inference needed (reference: strategy.py:918-923)
            al_guids = self._random_sample_frames(train_pool, al_num_frames,
                                                  salt=iteration)
            return al_guids, [], {}

        train_pool.resample_unlabeled_data()
        sal_dict = self._compute_sal_dict(train_pool, state, iteration)
        al_metric_dict = {
            guid: v
            for guid, v in sal_dict["al_metric"].items()
            if not math.isnan(v)
        }
        if cfg.AL.STRATEGY == "CORESET":
            # Frames with a non-finite FEATURE row are excluded — in the
            # feature space k-center actually runs in: a NaN row wins
            # every jnp.argmax and then poisons the min-distance vector,
            # so k-center-greedy would return the same frame n times (the
            # reference's sklearn pairwise_distances simply rejects NaN
            # input).  POSE features that means the triangulated
            # keypoints; EMBEDDING features means the pooled trunk
            # embedding (a frame whose triangulation diverged but whose
            # embedding is finite stays a valid candidate there).
            # al_metric is NaN-filtered the same way above.
            use_embedding = cfg.AL.CORESET_FEATURES == "EMBEDDING"
            # Default {}: an exhausted pool scores zero batches, so the
            # key never appears (and is never read below).
            cand_emb = sal_dict.pop("embedding", {}) if use_embedding else {}
            if use_embedding:
                coreset_candidates = OrderedDict(
                    (guid, kp)
                    for guid, kp in sal_dict["pred_3d_keypoints"].items()
                    if guid in cand_emb and np.isfinite(cand_emb[guid]).all()
                )
            else:
                coreset_candidates = OrderedDict(
                    (guid, kp)
                    for guid, kp in sal_dict["pred_3d_keypoints"].items()
                    if np.isfinite(kp).all()
                )
            dropped = len(sal_dict["pred_3d_keypoints"]) - len(coreset_candidates)
            if dropped:
                self._logger.warning(
                    "CORESET: dropped %d frames with non-finite %s from the "
                    "candidate pool."
                    % (dropped,
                       "embeddings" if use_embedding
                       else "triangulated keypoints")
                )
            features = None
            al_dict = train_pool.get_al_dict_for_coreset()
            if use_embedding:
                # Pooled CNN trunk embeddings (the coreset paper's feature
                # space) instead of root-centered poses: candidates got
                # theirs from score_step's shared forward; the labeled set
                # needs one extra (small) sweep.  Non-finite labeled rows
                # are dropped from the center set (same NaN hazard), and
                # al_dict is filtered in step so CoreSet's row count check
                # holds.
                lab_emb = self._embed_labeled(train_pool, state)
                lab_idx = [
                    i for i, f in enumerate(train_pool.labeled_data)
                    if np.isfinite(lab_emb[f["guid"]]).all()
                ]
                if len(lab_idx) != len(train_pool.labeled_data):
                    self._logger.warning(
                        "CORESET: dropped %d labeled frames with non-finite "
                        "embeddings from the center set."
                        % (len(train_pool.labeled_data) - len(lab_idx))
                    )
                al_dict = OrderedDict((i, al_dict[i]) for i in lab_idx)
                features = np.stack(
                    [cand_emb[g] for g in coreset_candidates]
                    + [lab_emb[train_pool.labeled_data[i]["guid"]]
                       for i in lab_idx]
                )
            cs = coreset_ops.CoreSet(
                coreset_candidates,
                al_dict,
                self.joint_root_index,
                features=features,
            )
            al_guids = cs.select_batch(min(al_num_frames, len(coreset_candidates)))
        else:
            al_guids = nlargest(
                al_num_frames, al_metric_dict, key=al_metric_dict.get
            )
        train_pool.label_by_frame_guids(al_guids)

        sal_sampled_guids: List[str] = []
        if cfg.EXPR_TYPE == "SAL":
            # Filters (reference: strategy.py:952-967): not AL-selected,
            # finite, not already pseudo-labeled, enough RANSAC inliers.
            al_set = set(al_guids)
            already = set(train_pool.pseudo_label_guids)
            sal_metric_dict = {
                guid: v
                for guid, v in sal_dict["sal_metric"].items()
                if (
                    guid not in al_set
                    and not math.isnan(v)
                    and guid not in already
                    and sal_dict["inlier_count"][guid] > cfg.SAL.INLIER_THRESHOLD
                )
            }
            sal_guids = sorted(sal_metric_dict, key=sal_metric_dict.get)
            if cfg.SAL.CLUSTER_FILE_PATH:
                self._logger.info(
                    "Pseudo-labeling frames by %d clusters." % cfg.SAL.NUM_CLUSTERS
                )
                counter = [0] * cfg.SAL.NUM_CLUSTERS
                per_cluster = pseudo_num_frames // cfg.SAL.NUM_CLUSTERS
                if sal_guids:
                    # One batched cluster assignment for every candidate (the
                    # reference predicts per guid in a Python loop,
                    # strategy.py:973-991 — one device dispatch each, which
                    # on a remote backend turns a 10^4-frame pool into
                    # minutes of pure dispatch).  One [N, 3K] x [C, 3K]
                    # matmul instead; the quota walk stays host-side.
                    feats = np.stack(
                        [
                            np.asarray(
                                sal_dict["pred_3d_keypoints"][g], dtype=np.float64
                            ).T
                            for g in sal_guids
                        ]
                    )  # [N, 3, K]
                    feats = feats - feats[
                        :, :, self.joint_root_index : self.joint_root_index + 1
                    ]
                    cluster_ids = self.kmeans.predict(
                        feats.reshape(len(sal_guids), -1)
                    )
                    for guid, cluster_id in zip(sal_guids, cluster_ids):
                        if counter[int(cluster_id)] < per_cluster:
                            counter[int(cluster_id)] += 1
                            sal_sampled_guids.append(guid)
            elif sal_guids and pseudo_num_frames > 0:
                head = sal_guids[: 2 * pseudo_num_frames]
                take = min(pseudo_num_frames, len(head))
                idx = self._rng(iteration).choice(
                    len(head), size=take, replace=False
                )
                sal_sampled_guids = [head[i] for i in idx]
            self._logger.info("Pseudo-labeling %d frames." % len(sal_sampled_guids))
            if sal_sampled_guids:
                train_pool.pseudo_label_by_frame_guids(
                    sal_sampled_guids, sal_dict["pred_3d_keypoints"]
                )
        return al_guids, sal_sampled_guids, sal_dict

    def _compute_sal_dict(self, pool, state, iteration: int = 0) -> Dict:
        """Score the whole unlabeled pool (reference: strategy.py:1004-1147).

        One jitted score_step per fixed-shape batch; the host merely keys
        results by guid.
        """
        cfg = self.al_cfg
        sal_dict = {
            "al_metric": OrderedDict(),
            "sal_metric": OrderedDict(),
            "inlier_count": OrderedDict(),
            "pred_3d_keypoints": OrderedDict(),
            "mkpe": OrderedDict(),
        }
        loader = self._get_loader(
            pool, cfg.AL.INFERENCE.BATCH_SIZE, cfg.AL.INFERENCE.NUM_WORKERS
        )
        num_views = pool.get_num_view_per_frame()
        pairs = jnp.asarray(self.engine.pairs(num_views))
        key = jax.random.PRNGKey(
            (int(cfg.RANDOM_SEED) + 7919 * (iteration + 1)) & 0x7FFFFFFF
        )
        t0 = time.time()
        n_frames = 0
        int8_scales = None
        procs = jax.process_count()
        progress = RateLogger(
            self._logger, "scored", len(pool.data) if pool.data else 0
        )
        if self.engine.use_int8:
            # The default engages only for strategies with measured
            # selection parity (Engine.INT8_SAFE_STRATEGIES — per-strategy
            # table in BENCH_NOTES round 4; MPE/BSB measured unsafe and
            # score float), and that evidence is synthetic — say so rather
            # than quantize silently; one config key returns to float.
            if cfg.AL.STRATEGY in Engine.INT8_SAFE_STRATEGIES:
                self._logger.info(
                    "Pool scoring uses the int8 backbone (TPU.INT8_SCORING "
                    "default, %s is int8-safe per BENCH_NOTES round 4 — set "
                    "TPU.INT8_SCORING: false for bit-float scoring)."
                    % cfg.AL.STRATEGY
                )
            elif cfg.AL.STRATEGY in Engine.INT8_MIXED_TAIL:
                self._logger.info(
                    "Pool scoring uses the MIXED int8 backbone (%d float "
                    "tail stage(s); %s measured ranking-safe only with the "
                    "float tail, BENCH_NOTES round 5 — set "
                    "TPU.INT8_SCORING: false for bit-float scoring)."
                    % (self.engine.int8_float_tail, cfg.AL.STRATEGY)
                )
            else:
                self._logger.warning(
                    "TPU.INT8_SCORING_FORCE overrides the per-strategy "
                    "gate: %s measured int8-UNSAFE for selection "
                    "(BENCH_NOTES round 4) — rankings may differ from "
                    "float." % cfg.AL.STRATEGY
                )

        def _dispatched():
            nonlocal key, int8_scales
            for batch_index, batch in enumerate(loader):
                key, skey = jax.random.split(key)
                # Raw uint8 frames: normalization is fused into the scoring
                # executable (engine.forward); no GT heatmaps are rendered.
                images = self._device_images(batch)
                if int8_scales is None:
                    # One-batch activation calibration for static int8
                    # scoring (None when TPU.INT8_SCORING is off).
                    int8_scales = self.engine.int8_calibrate(
                        state.params, state.batch_stats, images
                    )
                out = self.engine.score_step(
                    state.params,
                    state.batch_stats,
                    images,
                    self._put(batch["proj_matrices"], view_axis=True),
                    self._put(batch["joint_valid"]),
                    pairs,
                    self._put(batch["3d_keypoints"]),
                    skey,
                    al_strategy=cfg.AL.STRATEGY,
                    mpe_aggregate=cfg.AL.MPE_CONFIG,
                    hp_aggregate=cfg.AL.HP_CONFIG,
                    bsb_aggregate=cfg.AL.BSB_CONFIG,
                    int8_scales=int8_scales,
                )
                if procs > 1:
                    # Global batch: rows span every process's shard.  Keys
                    # come from pool metadata (any process can reconstruct
                    # every shard's guids), values from an all-gather at
                    # fetch time — the reference's sal_dict NCCL all_gather
                    # equivalent (reference: strategy.py:1090-1147).
                    guids, frame_valid = loader.global_batch_layout(batch_index)
                else:
                    guids, frame_valid = batch["guid"], batch["frame_valid"]
                # Device outputs are tiny (O(B*K) floats per batch); the
                # pipelined fetch keeps the device fed between batches.
                yield (guids, frame_valid), out

        try:
            for (guids, frame_valid), out in self._pipelined_fetch(_dispatched()):
                for i, guid in enumerate(guids):
                    if not frame_valid[i]:
                        continue
                    sal_dict["sal_metric"][guid] = float(out["sal_metric"][i])
                    sal_dict["inlier_count"][guid] = float(out["inlier_count"][i])
                    sal_dict["pred_3d_keypoints"][guid] = out["keypoints_3d"][i].tolist()
                    sal_dict["al_metric"][guid] = float(out["al_metric"][i])
                    sal_dict["mkpe"][guid] = float(out["mkpe"][i])
                    if "embedding" in out:
                        # CORESET_FEATURES=EMBEDDING rides the scoring
                        # sweep; _sal_pseudo_labeling pops this before the
                        # sal_dict is JSON-dumped.
                        sal_dict.setdefault("embedding", OrderedDict())[
                            guid
                        ] = np.asarray(out["embedding"][i], np.float32)
                    n_frames += 1
                progress.tick(int(np.sum(frame_valid)))
        finally:
            # Release the decode-pool liveness ref deterministically
            # (pipeline._acquire_shared_executor's MUST-pair contract);
            # without this, a later NUM_WORKERS growth could retire a pool
            # that never shuts down.
            loader.close()
        dt = time.time() - t0
        if n_frames:
            self._logger.info(
                "Scored %d frames x %d views in %.2fs (%.2f frames/s)."
                % (n_frames, num_views, dt, n_frames / dt)
            )
            if _is_main() and self.al_writer is not None:
                self.al_writer.add_scalar(
                    "perf/scoring_frames_per_sec", n_frames / dt, iteration
                )
                for dev, stats in profiling.device_memory_stats().items():
                    self.al_writer.add_scalar(
                        "hbm/%s/bytes_in_use_gib" % dev,
                        stats["bytes_in_use_gib"],
                        iteration,
                    )
        return sal_dict

    def _embed_labeled(self, train_pool, state) -> "OrderedDict[str, np.ndarray]":
        """Pooled trunk embeddings of the LABELED set, keyed by guid — the
        already-covered centers for AL.CORESET_FEATURES=EMBEDDING.

        One engine.embed_step sweep over train_pool.labeled_data (small:
        the AL budget, not the pool), with the same loader sharding /
        global-gather discipline as the scoring sweep."""

        class _ListPool:
            def __init__(self, frames):
                self.data = frames

        loader = self._get_loader(
            _ListPool(list(train_pool.labeled_data)),
            self.al_cfg.AL.INFERENCE.BATCH_SIZE,
            self.al_cfg.AL.INFERENCE.NUM_WORKERS,
        )
        procs = jax.process_count()
        embeddings: "OrderedDict[str, np.ndarray]" = OrderedDict()

        def _dispatched():
            for batch_index, batch in enumerate(loader):
                emb = self.engine.embed_step(
                    state.params, state.batch_stats,
                    self._device_images(batch),
                )
                if procs > 1:
                    guids, frame_valid = loader.global_batch_layout(batch_index)
                else:
                    guids, frame_valid = batch["guid"], batch["frame_valid"]
                yield (guids, frame_valid), {"embedding": emb}

        try:
            for (guids, frame_valid), out in self._pipelined_fetch(_dispatched()):
                for i, guid in enumerate(guids):
                    if frame_valid[i]:
                        embeddings[guid] = np.asarray(
                            out["embedding"][i], np.float32
                        )
        finally:
            loader.close()
        return embeddings

    # -------------------------------------------------------------- training

    def al_iteration(self, state, train_pool, val_pool, iteration):
        """Reference: strategy.py:240-265."""
        train_cfg = self.al_cfg.clone()
        train_cfg.EXPR_NAME = train_cfg.EXPR_NAME + "/ITER-%d" % iteration
        self._train(iteration, train_cfg, train_pool, val_pool, state)

    def run_fully_supervised_training(self, state, train_pool, val_pool):
        """Reference: strategy.py:279-313."""
        if self.al_cfg.TRAIN.FULLY_SUPERVISED_FRAME_COUNT != -1:
            self._random_sample_frames(
                train_pool, self.al_cfg.TRAIN.FULLY_SUPERVISED_FRAME_COUNT
            )
        else:
            train_pool.label_all()
        train_cfg = self.al_cfg.clone()
        train_cfg.EXPR_NAME = train_cfg.EXPR_NAME + "/FULLY_SUPERVISED"
        self._train(-1, train_cfg, train_pool, val_pool, state)

    def _prepare_experiment(self, cfg) -> Tuple[str, MetricsWriter]:
        """Reference: strategy.py:651-679."""
        experiment_dir = storage.join(cfg.LOG_DIR, cfg.EXPR_NAME)
        storage.makedirs(experiment_dir)
        checkpoints_dir = storage.join(experiment_dir, "checkpoints")
        storage.makedirs(checkpoints_dir)
        with storage.open_file(
            storage.join(experiment_dir, "config.yaml"), "w"
        ) as f:
            f.write(cfg.dump())
        writer = MetricsWriter(storage.join(experiment_dir, "summary"))
        return checkpoints_dir, writer

    def _load_weights(self, cfg, state: TrainState) -> TrainState:
        """RESTORE_FROM (full resume) / INIT_WEIGHT (filtered pretrained
        init); reference: strategy.py:713-745.

        The reference saves optimizer state but never restores it
        (strategy.py:713-721 reads only state_dict) — fixed here:
        TRAIN.RESTORE_FROM performs a true mid-training resume (params +
        batch stats + optimizer state + step), so loss and lr continue
        where the killed run stopped.  The AL warm-start path keeps
        params-only restore (each iteration trains with a fresh optimizer
        by design)."""
        if cfg.TRAIN.RESTORE_FROM:
            self._logger.info("Resuming from %s" % cfg.TRAIN.RESTORE_FROM)
            return self._maybe_replicate(
                ckpt.restore_checkpoint(cfg.TRAIN.RESTORE_FROM, state)
            )
        if cfg.TRAIN.INIT_WEIGHT:
            from .models import convert

            self._logger.info("Initializing weights from %s" % cfg.TRAIN.INIT_WEIGHT)
            return convert.load_pretrained(cfg, cfg.TRAIN.INIT_WEIGHT, state)
        self._logger.info("Training from scratch.")
        return state

    def _train(self, iteration_idx, train_cfg, train_pool, val_pool, state):
        """The training loop (reference: strategy.py:422-546)."""
        checkpoints_dir, writer = (
            self._prepare_experiment(train_cfg) if _is_main() else (None, None)
        )
        val_pool.label_all()
        val_pool.resample_frames(
            min(train_cfg.TRAIN.VAL_SIZE, len(val_pool.labeled_data)),
            rng=self._rng(1),
        )
        val_loader = self._get_loader(val_pool, train_cfg.TRAIN.BATCH_SIZE)
        state = self._load_weights(train_cfg, state)

        train_pool.resample_frames(
            -1, train_cfg.DATA.EPOCH_SIZE, rng=self._rng(2 + max(iteration_idx, 0))
        )
        train_loader = self._get_loader(train_pool, train_cfg.TRAIN.BATCH_SIZE)
        try:
            total_steps = max(
                train_cfg.TRAIN.OPTIM.TOTAL_STEPS, train_cfg.TRAIN.LOG_EVERY_ITER
            )
            key = jax.random.PRNGKey(int(train_cfg.RANDOM_SEED) & 0x7FFFFFFF)
            epoch, global_step = 0, int(jax.device_get(state.step))
            if global_step:
                self._logger.info("Resuming training at step %d." % global_step)
            last_loss = float("nan")
            skip_sum = jnp.zeros((), jnp.int32)
            t_start, steps_timed = time.time(), 0
            step_timer = profiling.StepTimer()
            while global_step < total_steps:
                epoch += 1
                batches_this_epoch = 0
                for batch in train_loader:
                    batches_this_epoch += 1
                    key, bkey = jax.random.split(key)
                    images, gt_heat = self._device_batch(batch, train=True, key=bkey)
                    state, metrics = self.engine.train_step(
                        state,
                        images,
                        gt_heat,
                        self._put(batch["per_view_joint_valid"], view_axis=True),
                        self._put(batch["frame_valid"]),
                    )
                    global_step += 1
                    steps_timed += 1
                    step_timer.tick()
                    # No per-step host fetches: float(metrics[...]) every step
                    # costs one blocking device round-trip per step and was the
                    # training-throughput bottleneck (10 steps/s wall vs the
                    # 88/s device step through the tunneled runtime).  Skips
                    # accumulate on device and are reported at log points.
                    skip_sum = skip_sum + metrics["skipped"]
                    if global_step % train_cfg.TRAIN.LOG_EVERY_ITER == 0:
                        # Pure-train window rate, measured before the log-point
                        # work (eval, checkpoints, figure rendering).
                        steps_per_sec = steps_timed / max(time.time() - t_start, 1e-9)
                        last_loss = float(metrics["loss"])
                        skips = int(jax.device_get(skip_sum))
                        if skips:
                            self._logger.warning(
                                "%d steps skipped so far (non-finite/clipped "
                                "loss; in-graph step-skip)." % skips
                            )
                        eval_results = self._evaluate_all(iteration_idx, state, val_loader)
                        if _is_main():
                            # One fetch + one serialize; the rolling CKPT-FINAL
                            # is a host-side copy of the step-named file.
                            ckpt.save_checkpoints(
                                [
                                    os.path.join(
                                        checkpoints_dir,
                                        "CKPT-E%d-MKPE%.2f"
                                        % (global_step, eval_results["mkpe"]),
                                    ),
                                    os.path.join(checkpoints_dir, "CKPT-FINAL"),
                                ],
                                state,
                                epoch,
                            )
                            writer.add_scalar(
                                "lr", float(metrics["lr"]), global_step
                            )
                            writer.add_scalar("3D MKPE", eval_results["mkpe"], global_step)
                            writer.add_scalar("loss/train", last_loss, global_step)
                            writer.add_pck_curves(
                                "3DPCK",
                                global_step,
                                eval_results["thresholds"],
                                eval_results["pcks"],
                            )
                            if "pckh_thresholds" in eval_results:
                                writer.add_pck_curves(
                                    "3DPCKH",
                                    global_step,
                                    eval_results["pckh_thresholds"],
                                    eval_results["pckh_pcks"],
                                )
                            writer.add_scalar("steps_per_sec", steps_per_sec, global_step)
                            if jax.process_count() == 1:
                                # Figure rendering fetches data-sharded arrays
                                # (frame 0's heatmap/image); multi-process would
                                # need a collective gather inside this
                                # process-0-only branch (deadlock) — skip the
                                # diagnostic images there, keep the scalars.
                                self._log_train_figures(
                                    writer, metrics["first_heatmap"], images,
                                    gt_heat, global_step,
                                )
                            for k, v in step_timer.summary().items():
                                writer.add_scalar("perf/%s" % k, v, global_step)
                            for dev, stats in profiling.device_memory_stats().items():
                                writer.add_scalar(
                                    "hbm/%s/bytes_in_use_gib" % dev,
                                    stats["bytes_in_use_gib"],
                                    global_step,
                                )
                            self._logger.info(
                                "[EPOCH %d][STEP %d] loss %.4f mkpe %.2f (%.2f steps/s)"
                                % (
                                    epoch,
                                    global_step,
                                    last_loss,
                                    eval_results["mkpe"],
                                    steps_per_sec,
                                )
                            )
                            t_start, steps_timed = time.time(), 0
                        # Process-0's checkpoint write above is host-side and
                        # un-synchronized (the checkpointer is process-local by
                        # design); the other processes must not race ahead into
                        # the next iteration's restore of this very checkpoint
                        # — KV barrier, unique key per save point.
                        from . import parallel

                        parallel.process_barrier(
                            "ckpt/%s/%d" % (train_cfg.EXPR_NAME, global_step)
                        )
                    if global_step >= total_steps:
                        break
                if batches_this_epoch == 0:
                    raise RuntimeError(
                        "Train loader yielded no batches (labeled pool size %d, "
                        "batch size %d) — training cannot make progress."
                        % (len(train_pool.labeled_data), train_cfg.TRAIN.BATCH_SIZE)
                    )
            if global_step % train_cfg.TRAIN.LOG_EVERY_ITER:
                # TOTAL_STEPS is not a LOG_EVERY_ITER multiple: the
                # reference saves only at log points (strategy.py:488-510),
                # silently dropping the trailing steps from CKPT-FINAL —
                # which the next AL iteration's scorer and AL_EVAL restore.
                # Save the end-of-training weights explicitly instead.
                eval_results = self._evaluate_all(iteration_idx, state, val_loader)
                if _is_main():
                    ckpt.save_checkpoints(
                        [
                            os.path.join(
                                checkpoints_dir,
                                "CKPT-E%d-MKPE%.2f"
                                % (global_step, eval_results["mkpe"]),
                            ),
                            os.path.join(checkpoints_dir, "CKPT-FINAL"),
                        ],
                        state,
                        epoch,
                    )
                    writer.add_scalar(
                        "3D MKPE", eval_results["mkpe"], global_step
                    )
                    self._logger.info(
                        "[FINAL][STEP %d] mkpe %.2f — end-of-training "
                        "checkpoint saved."
                        % (global_step, eval_results["mkpe"])
                    )
                from . import parallel

                parallel.process_barrier(
                    "ckpt/%s/%d" % (train_cfg.EXPR_NAME, global_step)
                )
        finally:
            # Deterministic decode-pool ref release (MUST pair with
            # _acquire_shared_executor; see pipeline.py) even when a
            # step or eval raises.
            train_loader.close()
            val_loader.close()
        if _is_main() and writer is not None:
            writer.close()
        return state

    def _log_train_figures(self, writer, first_heatmap, images, gt_heat, step):
        """Rendered figures every LOG_EVERY_ITER: pred-vs-gt heatmap grid and
        a 2D keypoint overlay for the first view of the first frame
        (reference: utils/visualization.py:14-64; the PCK-curve figures are
        rendered inside MetricsWriter.add_pck_curves).

        `first_heatmap` is train_step's metrics["first_heatmap"] — the
        float train-mode prediction already computed by the step, so no
        extra forward executable is compiled for this diagnostic and the
        int8 scoring path is never involved."""
        from .ops import geometry as geo_ops
        from .ops import heatmap as heatmap_ops
        from .utils import visualization

        pred_hm = np.asarray(
            jax.device_get(first_heatmap), np.float32
        ).transpose(2, 0, 1)  # [K, h, w]
        gt_hm = np.asarray(
            jax.device_get(gt_heat[0, 0]), np.float32
        ).transpose(2, 0, 1)
        writer.add_image(
            "train/pred_vs_gt_heatmaps",
            visualization.pred_vs_gt_heatmaps(pred_hm, gt_hm),
            step,
        )
        img = np.asarray(jax.device_get(images[0, 0]))
        if img.dtype != np.uint8:
            img = geo_ops.denormalize_image(np.asarray(img, np.float32))
        stride = float(self.al_cfg.POSE_ESTIMATOR.STRIDE)
        pred_kp = np.asarray(
            heatmap_ops.decode_argmax(jnp.asarray(pred_hm), stride=stride)[0]
        )
        gt_kp = np.asarray(
            heatmap_ops.decode_argmax(jnp.asarray(gt_hm), stride=stride)[0]
        )
        writer.add_image(
            "train/keypoints_2d",
            visualization.overlay_keypoints(img, pred_kp, gt_keypoints_2d=gt_kp),
            step,
        )

    # ------------------------------------------------------------- evaluation

    def _evaluate_all(self, iteration_idx, state, val_loader) -> Dict:
        """3D MKPE + PCK(+PCKh) over the validation loader
        (reference: strategy.py:584-649)."""
        preds, gts, valids = [], [], []
        pairs = jnp.asarray(self.engine.pairs(val_loader.pool.get_num_view_per_frame()))
        int8_scales = None

        def _dispatched():
            nonlocal int8_scales
            for batch in val_loader:
                images = self._device_images(batch)
                if int8_scales is None:
                    int8_scales = self.engine.int8_calibrate(
                        state.params, state.batch_stats, images, for_eval=True
                    )
                out = self.engine.eval_step(
                    state.params,
                    state.batch_stats,
                    images,
                    self._put(batch["proj_matrices"], view_axis=True),
                    self._put(batch["joint_valid"]),
                    pairs,
                    int8_scales=int8_scales,
                )
                # Multi-process: the device output is a global array and the
                # host batch holds only this process's rows — the fetch
                # gathers both sides so every process evaluates the full
                # validation set (single process: a plain device_get).
                yield None, (
                    out["keypoints_3d"],
                    batch["frame_valid"],
                    batch["3d_keypoints"],
                    batch["joint_valid"],
                )

        for _, (kp3d, mask, kp3d_gt, joint_valid) in self._pipelined_fetch(
            _dispatched()
        ):
            mask = np.asarray(mask)
            preds.append(np.asarray(kp3d)[mask])
            gts.append(np.asarray(kp3d_gt)[mask])
            valids.append(np.asarray(joint_valid)[mask].astype(np.float32))
        pred = np.concatenate(preds)
        gt = np.concatenate(gts)
        valid = np.concatenate(valids)
        mkpe = float(evaluation.compute_mkpe(pred, gt, valid))
        thresholds, pcks = evaluation.compute_3d_pck_figure(pred, gt, valid)
        results = {"mkpe": mkpe, "thresholds": list(thresholds), "pcks": pcks}
        if self.al_cfg.DATA.TYPE != "ih26m":
            pckh_thresholds, pckh_pcks = evaluation.compute_3d_pckh_figure(pred, gt)
            results["pckh_thresholds"] = list(pckh_thresholds)
            results["pckh_pcks"] = pckh_pcks
        return results

    def evaluate_2d_pckh(self, state, val_loader) -> Tuple[list, list]:
        """2D PCKh over a validation loader.

        The reference version (strategy.py:548-582) is dead code with a
        hardcoded 19-joint reshape; this one works for any joint count using
        the bbox-scaled decode and the crop-space GT ('2d_after_crop')."""
        from .ops import heatmap as heatmap_ops

        preds, gts = [], []
        int8_scales = None

        def _dispatched():
            nonlocal int8_scales
            for batch in val_loader:
                images = self._device_images(batch)
                if int8_scales is None:
                    int8_scales = self.engine.int8_calibrate(
                        state.params, state.batch_stats, images, for_eval=True
                    )
                heatmaps = self.engine.forward(
                    state.params, state.batch_stats, images, int8_scales,
                    use_int8=self.engine.use_int8_eval,
                )
                hm_vk = jnp.moveaxis(heatmaps, -1, 2)  # [B, V, K, h, w]
                coords = heatmap_ops.decode_keypoints_bbox(
                    hm_vk,
                    self._put(batch["square_box"], view_axis=True),  # [B, V, 4]
                )
                # Device reference only ([B, V, K, 2] — the big heatmaps
                # are not retained past the batch).
                yield None, (coords, batch["frame_valid"], batch["2d_after_crop"])

        for _, (coords, mask, gt_2d) in self._pipelined_fetch(_dispatched()):
            mask = np.asarray(mask)
            preds.append(
                np.asarray(coords)[mask].reshape(-1, self.num_joints, 2)
            )
            gts.append(np.asarray(gt_2d)[mask].reshape(-1, self.num_joints, 2))
        pred = np.concatenate(preds)
        gt = np.concatenate(gts)
        thresholds, pcks = evaluation.compute_pckh_2d_figure(pred, gt)
        return list(thresholds), pcks

    def _prepare_val_dataset_for_eval(self, val_pool) -> FrameLoader:
        """Reference: strategy.py:905-913."""
        val_pool.label_all()
        val_pool.resample_frames(-1, rng=self._rng(3))
        return self._get_loader(
            val_pool,
            self.al_cfg.AL.INFERENCE.BATCH_SIZE,
            self.al_cfg.AL.INFERENCE.NUM_WORKERS,
        )

    def _evaluate_on_checkpoint(
        self, iteration_idx, state, checkpoint_path, val_loader
    ) -> Dict:
        """Reference: strategy.py:880-903."""
        self._logger.info(
            "AL_iter %s: loading weights from %s" % (iteration_idx, checkpoint_path)
        )
        state = self._maybe_replicate(
            ckpt.restore_params_only(checkpoint_path, state)
        )
        result = self._evaluate_all(iteration_idx, state, val_loader)
        result["pcks"] = [float(np.mean(p)) for p in result["pcks"]]
        if "pckh_pcks" in result:
            result["pckh_pcks"] = [float(np.mean(p)) for p in result["pckh_pcks"]]
        return result

    def run_eval(self, state, val_pool) -> Dict:
        """EXPR_TYPE == EVAL (reference: strategy.py:228-238)."""
        with self._prepare_val_dataset_for_eval(val_pool) as val_loader:
            result = self._evaluate_on_checkpoint(
                -1, state, self.al_cfg.AL.INFERENCE.RESTORE_FROM, val_loader
            )
        return {-1: result}

    def run_al_eval(self, state, val_pool) -> Dict:
        """EXPR_TYPE == AL_EVAL: evaluate every AL iteration's final
        checkpoint (reference: strategy.py:193-226)."""
        eval_dict = {}
        with self._prepare_val_dataset_for_eval(val_pool) as val_loader:
            if self.al_cfg.AL.INFERENCE.TRAINING_EXPR_NAME:
                for iteration in range(self.al_cfg.AL.ITERATIONS):
                    # True labeled-set size after iteration i.  The
                    # reference reports (1+i)*ITER_AMOUNT (strategy.py:200),
                    # which ignores INITIAL_AMOUNT — wrong for its own
                    # defaults (200 initial / 100 per iter); fixed here per
                    # SURVEY.md "Known reference quirks".
                    size = (
                        self.al_cfg.AL.INITIAL_AMOUNT
                        + iteration * self.al_cfg.AL.ITER_AMOUNT
                    )
                    path = os.path.join(
                        self.al_cfg.LOG_DIR,
                        self.al_cfg.AL.INFERENCE.TRAINING_EXPR_NAME,
                        "ITER-%d" % iteration,
                        "checkpoints",
                        "CKPT-FINAL",
                    )
                    if ckpt.checkpoint_exists(path):
                        eval_dict[size] = self._evaluate_on_checkpoint(
                            iteration, state, path, val_loader
                        )
        for size, result in eval_dict.items():
            self._logger.info("size %d -> MKPE %.2f" % (size, result["mkpe"]))
        return eval_dict

    # ------------------------------------------------------------- clustering

    def cluster(self, state, train_pool):
        """EXPR_TYPE == CLUSTER (reference: strategy.py:137-191; reachable
        here without the reference's 'CLUSETER' typo, workflow.py:99)."""
        cfg = self.al_cfg
        train_pool.label_all()
        train_pool.resample_frames(-1, rng=self._rng(4))
        cluster_dict = {}
        if cfg.AL.CLUSTER.TYPE == "POSE":
            for frame in train_pool.data:
                cluster_dict[frame["guid"]] = np.asarray(
                    frame["3d_keypoints"]
                ).tolist()
        elif cfg.AL.CLUSTER.TYPE == "LOSS":
            if cfg.AL.CLUSTER.RESTORE_FROM:
                state = self._maybe_replicate(
                    ckpt.restore_params_only(cfg.AL.CLUSTER.RESTORE_FROM, state)
                )
            loader = self._get_loader(train_pool, cfg.TRAIN.BATCH_SIZE)
            procs = jax.process_count()

            def _dispatched():
                for batch_index, batch in enumerate(loader):
                    images, gt_heat = self._device_batch(
                        batch, train=False, key=jax.random.PRNGKey(0)
                    )
                    # Multi-process: the loss is a data-sharded GLOBAL array
                    # ([B] floats) and the local batch holds only this
                    # process's guids — same gather + key-reconstruction as
                    # the scoring sweep.
                    losses_dev = self.engine.loss_step(
                        state.params, state.batch_stats, images, gt_heat
                    )
                    if procs > 1:
                        guids, valid = loader.global_batch_layout(batch_index)
                    else:
                        guids, valid = batch["guid"], batch["frame_valid"]
                    yield (guids, valid), losses_dev

            try:
                for (guids, valid), losses in self._pipelined_fetch(_dispatched()):
                    losses = np.asarray(losses)
                    for i, guid in enumerate(guids):
                        if valid[i]:
                            cluster_dict[guid] = float(losses[i])
            finally:
                loader.close()
        else:
            raise ValueError("AL.CLUSTER.TYPE must be POSE or LOSS")
        if _is_main():
            with storage.open_file(cfg.AL.CLUSTER.SAVE_PATH, "w") as f:
                json.dump(cluster_dict, f)
        return cluster_dict

    # ------------------------------------------------------- resume / restore

    def restore_dataset(self, train_pool, iteration: int):
        """Replay guid logs into the labeled pool
        (reference: strategy.py:315-336)."""
        for i in range(iteration):
            with storage.open_file(self._expr_dir("SAMPLED-GUID-ITER-%d" % i)) as f:
                guids = json.loads(f.readline())
            train_pool.label_by_frame_guids(guids)
        if self.al_cfg.EXPR_TYPE == "SAL" and iteration > 1:
            path = self._expr_dir("SAL-GUID-ITER-%d" % (iteration - 1))
            if storage.exists(path):
                with storage.open_file(path) as f:
                    train_pool.pseudo_label_guids = json.loads(f.readline())
        self._logger.info(
            "Restored dataset up to iteration %d; labeled size %d."
            % (iteration - 1, len(train_pool.labeled_data))
        )
        return train_pool

    def _copy_previous_checkpoints(self):
        """Copy checkpoints + guid logs from a previous experiment
        (reference: strategy.py:338-389)."""
        for i in range(self.al_cfg.AL.START_ITER):
            src_ckpt = storage.join(
                self.al_cfg.AL.PREVIOUS_AL_LOG_DIR,
                "ITER-%d" % i,
                "checkpoints",
                "CKPT-FINAL",
            )
            dst_dir = self._expr_dir("ITER-%d" % i, "checkpoints")
            storage.makedirs(dst_dir)
            if storage.isdir(src_ckpt):
                storage.copytree(src_ckpt, storage.join(dst_dir, "CKPT-FINAL"))
            else:
                self._logger.info("Checkpoint not found: %s" % src_ckpt)
            for name in ("SAMPLED-GUID-ITER-%d" % i, "SAL-GUID-ITER-%d" % i):
                src = storage.join(self.al_cfg.AL.PREVIOUS_AL_LOG_DIR, name)
                if storage.exists(src):
                    storage.copy(src, self._expr_dir(name))
                else:
                    self._logger.warning("GUID log not found: %s" % src)

    def save_init_weights_for_al(self, state) -> str:
        """Stash the (optionally pretrained-initialized) weights all AL
        iterations start from (reference: strategy.py:850-866)."""
        state = self._load_weights(self.al_cfg, state)
        path = self._expr_dir("INIT-WEIGHT")
        if _is_main():
            storage.makedirs(self._expr_dir())
            ckpt.save_checkpoint(path, state)
            self._logger.info("Initial AL weights saved at %s." % path)
        return path

    def prepare_al_experiments(self):
        """Reference: strategy.py:267-277.  Writer is process-0-only, like
        every other writer attachment (run_al_iteration's re-attach and the
        reference's rank gate at strategy.py:79,127) — other processes read
        `self.al_writer is None`."""
        storage.makedirs(self._expr_dir())
        if _is_main():
            self.al_writer = MetricsWriter(self._expr_dir("AL"))
            self.al_writer.add_text("comment", self.al_cfg.COMMENT, 0)
