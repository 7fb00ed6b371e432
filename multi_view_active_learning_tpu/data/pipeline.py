"""Host -> device batch pipeline.

Split of labor (vs the reference's all-on-CPU prepare_single_view,
dataset/dataset.py:158-220):

  host (numpy/PIL, per view): JPEG decode, BGR flip, square+scale bbox, crop,
    camera intrinsic updates, 3D->2D projection, LANCZOS resize to the model
    input size.  Emits **uint8** images — 4x less host->device traffic than
    the reference's float32 tensors.

  device (one jitted call per batch): ImageNet normalization, Gaussian GT
    heatmap synthesis for all (frame, view, joint) at once, and RandAugment
    when training.  In the reference these run per view per joint on the
    dataloader CPU workers; here they are fused elementwise XLA work.

Batches are fixed-shape: the final partial batch is padded and flagged via
`frame_valid`, so every step hits the same compiled executable.
"""

from __future__ import annotations

import io
import multiprocessing
import threading
from collections import OrderedDict, deque
from concurrent.futures import ProcessPoolExecutor
from functools import partial
from queue import Queue
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops import geometry, heatmap
from ..utils import storage
from . import augmentation as aug


class _ViewCache:
    """LRU of decoded+cropped+resized views keyed by (path, bbox, size).

    The reference re-decodes every view on every epoch although
    resample_frames duplicates the same labeled frames EPOCH_SIZE/len times
    (reference: dataset/dataset.py:76-96, 158-214); with a single-digit-GB
    cache the host data path drops out of the training loop entirely after
    the first epoch.  Images are content-static, so no invalidation.
    """

    def __init__(self):
        self._store: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        with self._lock:
            if key in self._store:
                self._store.move_to_end(key)
                self.hits += 1
                return self._store[key]
            self.misses += 1
            return None

    def put(self, key, value, max_entries: int):
        if max_entries <= 0:
            return
        with self._lock:
            self._store[key] = value
            self._store.move_to_end(key)
            while len(self._store) > max_entries:
                self._store.popitem(last=False)

    def clear(self):
        with self._lock:
            self._store.clear()


VIEW_CACHE = _ViewCache()

# One full decoded HD frame is ~30x the bytes of a 256x256 crop; in
# DEVICE_CROP mode the same entry-count budget would silently balloon a
# tuned VIEW_CACHE_SIZE (e.g. 10000 ~ 1.9 GB of crops) to tens of GB, so
# the effective entry limit is scaled down by this factor there.
_DEVICE_CROP_CACHE_DIVISOR = 32


_SHARED_EXECUTOR: ProcessPoolExecutor | None = None
_SHARED_EXECUTOR_SIZE = 0
_RETIRED_EXECUTORS: List[ProcessPoolExecutor] = []
# Live-FrameLoader count per executor (keyed by id; the executor object is
# pinned by _SHARED_EXECUTOR/_RETIRED_EXECUTORS/loader refs while counted).
# A grown-past pool used to idle until process exit, pinning every worker's
# warmed VIEW_CACHE copy (up to ~GBs); now it shuts down when its last
# holder releases it.  RLock: _acquire_shared_executor wraps
# _shared_executor under the same lock.
_EXECUTOR_REFS: Dict[int, int] = {}
_SHARED_EXECUTORS_LOCK = threading.RLock()


def _main_module_reimportable() -> bool:
    """forkserver/spawn re-import __main__ in the server process
    (multiprocessing.spawn._fixup_main_from_path/name); a process driven
    from stdin / -c / a REPL has no importable main and would crash the
    server with FileNotFoundError.  True when the fixup can succeed."""
    import os
    import sys

    main = sys.modules.get("__main__")
    if main is None:
        return True
    spec = getattr(main, "__spec__", None)
    if spec is not None:  # python -m style: re-imported by module name
        return True
    main_file = getattr(main, "__file__", None)
    if main_file is None:  # interactive: no fixup attempted
        return True
    return os.path.isfile(main_file)


def _shared_executor(num_workers: int) -> ProcessPoolExecutor | None:
    """THE process-wide decode worker pool, grown to the largest worker
    count ever requested (train and scoring loaders with different
    NUM_WORKERS share one pool rather than keeping two resident pools of
    workers, each warming a private multi-GB VIEW_CACHE copy).

    Forking lazily from a loader's prefetch thread is unsafe: the parent
    already runs device-client/gRPC and prefetch threads, and a child forked
    while another thread holds a lock (malloc, logging) can deadlock.  The
    'forkserver' context sidesteps fork-with-threads entirely — workers are
    forked from a dedicated single-threaded server process — at the cost of
    copy-on-write cache inheritance (the server preloads this module so
    workers skip the import; each worker then warms its own VIEW_CACHE,
    which persists across epochs because the pool is shared for the whole
    process rather than re-created per FrameLoader).  Falls back to 'spawn'
    where forkserver is unavailable, to 'fork' where __main__ is not
    re-importable (spawn/forkserver would crash the workers re-importing
    it), and to None — callers decode inline — where neither works.
    """
    global _SHARED_EXECUTOR, _SHARED_EXECUTOR_SIZE
    with _SHARED_EXECUTORS_LOCK:
        ex = _SHARED_EXECUTOR
        if ex is None or _SHARED_EXECUTOR_SIZE < num_workers:
            if ex is not None:
                # Grow: the smaller pool must not be shut down while a
                # sweep mid-iteration still holds it (its _prepared
                # captured the executor once; submit-after-shutdown raises
                # into that sweep's prefetch thread).  With no live holder
                # it shuts down NOW; otherwise it is retired and the last
                # _release_shared_executor shuts it down — either way its
                # workers (each pinning a warmed VIEW_CACHE copy) do not
                # idle until process exit.
                if _EXECUTOR_REFS.get(id(ex), 0) <= 0:
                    ex.shutdown(wait=False, cancel_futures=True)
                else:
                    _RETIRED_EXECUTORS.append(ex)
            ex = None
        if ex is None:
            if _main_module_reimportable():
                try:
                    ctx = multiprocessing.get_context("forkserver")
                    ctx.set_forkserver_preload([__name__])
                except ValueError:  # platforms without forkserver
                    ctx = multiprocessing.get_context("spawn")
            else:
                # stdin/-c-driven processes: forkserver AND spawn both
                # re-import __main__ in the child (mp.spawn._fixup_main_*),
                # which would crash every worker — fork is the only viable
                # context.  Residual risk documented: forking with live
                # non-daemon threads can deadlock the child if another
                # thread holds a lock at fork time; workers run only
                # numpy/PIL host code, which bounds the exposure to the
                # allocator/logging locks.
                try:
                    ctx = multiprocessing.get_context("fork")
                except ValueError:
                    # No fork either (non-POSIX): no worker context can
                    # start safely from a REPL-driven parent — decode
                    # inline rather than crash every worker at import.
                    return None
            ex = ProcessPoolExecutor(max_workers=num_workers, mp_context=ctx)
            _SHARED_EXECUTOR = ex
            _SHARED_EXECUTOR_SIZE = num_workers
        return ex


def _acquire_shared_executor(num_workers: int) -> ProcessPoolExecutor | None:
    """`_shared_executor` plus a liveness ref (FrameLoader holds one per
    executor it uses).  Callers MUST pair with `_release_shared_executor`
    so grown-past pools can be reclaimed (see `_EXECUTOR_REFS`)."""
    with _SHARED_EXECUTORS_LOCK:
        ex = _shared_executor(num_workers)
        if ex is not None:
            _EXECUTOR_REFS[id(ex)] = _EXECUTOR_REFS.get(id(ex), 0) + 1
        return ex


def _release_shared_executor(ex: ProcessPoolExecutor | None) -> None:
    """Drop one liveness ref.  A RETIRED executor (grown past, no longer
    the shared pool) shuts down when its last holder releases it; the
    CURRENT pool stays warm for future loaders regardless."""
    if ex is None:
        return
    with _SHARED_EXECUTORS_LOCK:
        n = _EXECUTOR_REFS.get(id(ex), 0) - 1
        if n > 0:
            _EXECUTOR_REFS[id(ex)] = n
            return
        _EXECUTOR_REFS.pop(id(ex), None)
        if ex is _SHARED_EXECUTOR:
            return
        try:
            _RETIRED_EXECUTORS.remove(ex)
        except ValueError:
            return  # already shut down (shutdown_shared_executors)
        ex.shutdown(wait=False, cancel_futures=True)


def shutdown_shared_executors() -> None:
    global _SHARED_EXECUTOR, _SHARED_EXECUTOR_SIZE
    with _SHARED_EXECUTORS_LOCK:
        if _SHARED_EXECUTOR is not None:
            _SHARED_EXECUTOR.shutdown(wait=False, cancel_futures=True)
        for ex in _RETIRED_EXECUTORS:
            ex.shutdown(wait=False, cancel_futures=True)
        _RETIRED_EXECUTORS.clear()
        _EXECUTOR_REFS.clear()
        _SHARED_EXECUTOR = None
        _SHARED_EXECUTOR_SIZE = 0


import atexit  # noqa: E402  (registered after the definitions it needs)

atexit.register(shutdown_shared_executors)


def _jax_backend_initialized() -> bool:
    """Worker-side probe (tests): decode workers must NEVER initialize an
    XLA backend — they fork from the preloaded server with jax already
    imported, and a fork-inherited jax initializing XLA deadlocked the
    whole scoring sweep intermittently (the trigger was utils.get_logger's
    jax.process_index() running at native_loader import time in the
    worker; get_logger now probes backends_are_initialized first)."""
    import sys

    if "jax" not in sys.modules:
        return False
    from jax._src import xla_bridge

    return xla_bridge.backends_are_initialized()


def _frame_view_keys(frame: dict, data_cfg) -> List[tuple]:
    """The VIEW_CACHE keys prepare_views_host would use for each view of
    `frame` (same bbox math), plus the effective entry budget.  Lets the
    loader detect an all-views-hot frame in THIS process and skip the
    decode-worker round-trip entirely."""
    device_crop = getattr(data_cfg, "DEVICE_CROP", False)
    keys = []
    for view in frame["views"].values():
        if device_crop:
            keys.append((view["path"], "full"))
            continue
        bbox = geometry.get_square_bbox(tuple(view["box"]))
        bbox = geometry.scale_bbox(bbox, data_cfg.SCALE_BBOX)
        keys.append(
            (view["path"], tuple(bbox), data_cfg.INPUT_WIDTH, data_cfg.INPUT_HEIGHT)
        )
    return keys


def _effective_cache_size(data_cfg) -> int:
    size = getattr(data_cfg, "VIEW_CACHE_SIZE", 0)
    if size > 0 and getattr(data_cfg, "DEVICE_CROP", False):
        # Floor at 1: a small positive budget must still cache (a zero here
        # would silently disable the warm-sweep fast path entirely).
        size = max(1, size // _DEVICE_CROP_CACHE_DIVISOR)
    return size


def prepare_views_host(frame: dict, data_cfg, gt_stride: int) -> Dict[str, np.ndarray]:
    """Prepare every view of one frame on the host.

    Reference: dataset/dataset.py:112-220 (prepare_frame +
    prepare_single_view) minus normalization/heatmaps/augmentation, which
    move to the device.
    """
    if "pseudo_3d_keypoints" in frame:
        kp3d = np.asarray(frame["pseudo_3d_keypoints"], dtype=np.float64)[:, :3]
        sigma = data_cfg.PSEUDO_LABEL_SIGMA
    else:
        kp3d = np.asarray(frame["3d_keypoints"], dtype=np.float64)[:, :3]
        sigma = data_cfg.SIGMA

    use_native = getattr(data_cfg, "USE_NATIVE_LOADER", False)
    fast_scale = getattr(data_cfg, "NATIVE_FAST_SCALE", False)
    device_crop = getattr(data_cfg, "DEVICE_CROP", False)
    if use_native:
        from . import native_loader

        use_native = native_loader.available()

    images, projs, kps, kps_after_crop, sq_boxes, pvjv = [], [], [], [], [], []
    for camera_name, view in frame["views"].items():
        bbox = geometry.get_square_bbox(tuple(view["box"]))
        bbox = geometry.scale_bbox(bbox, data_cfg.SCALE_BBOX)
        # --- pixels: mode-dependent (host crop vs DEVICE_CROP full frame)
        if device_crop:
            # DEVICE_CROP mode: decode the full frame only; the square-box
            # crop + resize runs on device (ops/image.py::crop_resize_uint8).
            cache_key = (view["path"], "full")
            cache_size = _effective_cache_size(data_cfg)
            image = VIEW_CACHE.get(cache_key) if cache_size > 0 else None
            if image is None:
                image = np.asarray(
                    Image.open(io.BytesIO(storage.read_bytes(view["path"])))
                )
                image = np.ascontiguousarray(image[..., ::-1])  # BGR flip
                if cache_size > 0:
                    VIEW_CACHE.put(cache_key, image, cache_size)
        else:
            cache_key = (
                view["path"], tuple(bbox),
                data_cfg.INPUT_WIDTH, data_cfg.INPUT_HEIGHT,
            )
            cache_size = getattr(data_cfg, "VIEW_CACHE_SIZE", 0)
            cached = VIEW_CACHE.get(cache_key) if cache_size > 0 else None
            image = cached
            if image is None and use_native:
                raw = storage.read_bytes(view["path"])
                # Native path fuses decode + crop + Lanczos + BGR flip.  The
                # bbox is given in original (RGB) image coordinates; the
                # reference's BGR flip (dataset.py:162) is channel-only, so
                # flipping after resize is equivalent.
                image = native_loader.decode_crop_resize(
                    raw, bbox, data_cfg.INPUT_WIDTH, data_cfg.INPUT_HEIGHT,
                    bgr_flip=True, fast_scale=fast_scale,
                )
            if image is None:  # PIL fallback (reference-exact path)
                image = np.asarray(
                    Image.open(io.BytesIO(storage.read_bytes(view["path"])))
                )
                image = image[..., ::-1]  # BGR flip (reference: dataset.py:162)
                # crop_image zero-fills to the exact bbox extent, so the
                # crop shape equals the bbox dims used below.
                image = geometry.crop_image(image, bbox)
                image = Image.fromarray(image).resize(
                    (data_cfg.INPUT_WIDTH, data_cfg.INPUT_HEIGHT),
                    resample=Image.LANCZOS,
                )
                image = np.asarray(image, dtype=np.uint8)
            if cached is None and cache_size > 0:
                VIEW_CACHE.put(cache_key, image, cache_size)

        # --- camera/keypoint math: identical in both modes (it depends on
        # the bbox, not on the pixels).
        cam = geometry.Camera(
            view["camera"]["R"],
            view["camera"]["t"],
            view["camera"]["K"],
            view["camera"]["dist"],
            name=camera_name,
        )
        crop_shape = (bbox[3] - bbox[1], bbox[2] - bbox[0])
        cam.update_after_crop(bbox)
        kps_after_crop.append(cam.project(kp3d).astype(np.float32))
        cam.update_after_resize(
            crop_shape, data_cfg.INPUT_WIDTH, data_cfg.INPUT_HEIGHT
        )
        projs.append(cam.projection.astype(np.float32))
        kps.append(cam.project(kp3d).astype(np.float32))
        images.append(image)
        sq_boxes.append(np.asarray(bbox, dtype=np.float32))
        pvjv.append(np.asarray(view["per_view_joint_valid"], dtype=bool))

    return {
        # [V, H, W, 3] uint8 crops; with DATA.DEVICE_CROP, full frames
        # (one shared frame size per dataset is required).
        "images": np.stack(images),
        "proj_matrices": np.stack(projs),  # [V, 3, 4]
        "2d_keypoints": np.stack(kps),  # [V, K, 2] post-resize
        "2d_after_crop": np.stack(kps_after_crop),
        "square_box": np.stack(sq_boxes),  # [V, 4]
        "per_view_joint_valid": np.stack(pvjv),  # [V, K]
        "3d_keypoints": np.asarray(frame["3d_keypoints"], dtype=np.float32)[:, :3],
        "joint_valid": np.asarray(frame["joint_valid"], dtype=bool),
        "sigma": np.float32(sigma),
        "pose": np.int64(frame["pose"]),
        "frame_id": np.int64(frame["frame_id"]),
        "guid": frame["guid"],
    }


@partial(
    jax.jit,
    static_argnames=("stride", "train", "num_aug", "magnitude", "use_rotation",
                     "use_image_aug", "const_magnitude"),
)
def device_prepare(
    images_u8: jnp.ndarray,  # [B, V, H, W, 3] uint8
    keypoints_2d: jnp.ndarray,  # [B, V, K, 2]
    sigma: jnp.ndarray,  # [B]
    rng_key: jax.Array,
    stride: int = 4,
    train: bool = False,
    num_aug: int = 0,
    magnitude: int = 0,
    use_rotation: bool = True,
    use_image_aug: bool = True,
    const_magnitude: bool = True,
):
    """Device-side batch finishing: GT heatmaps + aug + normalization.

    Returns (images [B, V, H, W, 3] f32 normalized,
             gt_heatmaps [B, V, h, w, K] f32).
    """
    B, V, H, W, _ = images_u8.shape
    h, w = H // stride, W // stride
    images = images_u8.astype(jnp.float32)
    kp_grid = keypoints_2d / float(stride)  # [B, V, K, 2]
    # sigma broadcasts against the [B, V, K, h, w] exponent.
    heat = heatmap.render_gaussian_heatmaps(
        kp_grid, h, w, sigma[:, None, None, None, None]
    )  # [B, V, K, h, w]
    heat = jnp.moveaxis(heat, 2, -1)  # [B, V, h, w, K]
    if train and num_aug > 0:
        images, heat = aug.rand_augment(
            rng_key,
            images.reshape(B * V, H, W, 3),
            heat.reshape(B * V, h, w, -1),
            num_aug=num_aug,
            magnitude=magnitude,
            use_rotation=use_rotation,
            use_image_aug=use_image_aug,
            const_magnitude=const_magnitude,
        )
        images = images.reshape(B, V, H, W, 3)
        heat = heat.reshape(B, V, h, w, -1)
    mean = jnp.asarray(geometry.IMAGENET_MEAN)
    std = jnp.asarray(geometry.IMAGENET_STD)
    images = (images / 255.0 - mean) / std
    return images, heat


class FrameLoader:
    """Iterate a FramePool's current `data` view in fixed-size batches.

    Single-controller sharding: with `num_shards > 1` (multi-process JAX),
    each process loads its `shard_index`-strided subset — the
    DistributedSampler equivalent (reference: strategy.py:747-760).
    A background thread prefetches `prefetch` batches so JPEG decode overlaps
    device compute.
    """

    def __init__(
        self,
        pool,
        data_cfg,
        gt_stride: int,
        batch_size: int,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        self.pool = pool
        self.data_cfg = data_cfg
        self.gt_stride = gt_stride
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._executor: ProcessPoolExecutor | None = None

    def __len__(self) -> int:
        if self.num_shards > 1:
            # Every shard emits the LONGEST shard's batch count: in a
            # multi-process run each batch is one collective step, so a
            # process with fewer frames must keep stepping with padded
            # (frame_valid=False) batches or the other processes deadlock
            # in the collectives — the DistributedSampler-padding
            # equivalent (reference: strategy.py:753).
            n = (len(self.pool.data) + self.num_shards - 1) // self.num_shards
        else:
            n = len(self.pool.data)
        return (n + self.batch_size - 1) // self.batch_size

    def _shard_guid_lists(self) -> List[List[str]]:
        """Per-shard guid lists, memoized per pool-data snapshot: the
        scoring loop asks for a layout once per batch, and re-slicing the
        whole pool for every shard each time is O(pool^2/batch) on big
        pools.  pool.data is REBOUND (never mutated) by the resample
        methods, so the cache validates with an `is` check against the
        very list object it sliced — NOT id(), whose values CPython reuses
        after GC (a fresh equal-length list at a recycled address would
        silently serve the OLD layout, mis-keying every score).  Holding
        the strong reference also pins the snapshot against collection."""
        cached = getattr(self, "_shard_guids_cache", None)
        if cached is None or cached[0] is not self.pool.data:
            lists = [
                [f["guid"] for f in self.pool.data[s :: self.num_shards]]
                for s in range(self.num_shards)
            ]
            self._shard_guids_cache = (self.pool.data, lists)
            return lists
        return cached[1]

    def global_batch_layout(self, batch_index: int):
        """(guids, frame_valid) for EVERY shard's `batch_index`-th batch,
        concatenated in shard order — the host-side key layout matching a
        global device array assembled from the per-process batches
        (strategy._put row order: process p's rows sit at
        [p*B_local, (p+1)*B_local)).  Uses only pool metadata, so any
        process reconstructs every other shard's keys without IO."""
        B = self.batch_size
        guids: List[str] = []
        valid = np.zeros(self.num_shards * B, bool)
        shard_guids = self._shard_guid_lists()
        for shard in range(self.num_shards):
            frames = shard_guids[shard]
            start = batch_index * B
            chunk = list(frames[start : start + B])
            valid[shard * B : shard * B + len(chunk)] = True
            pad = (
                chunk[-1]
                if chunk
                else (frames[-1] if frames else self.pool.data[0]["guid"])
            )
            chunk += [pad] * (B - len(chunk))
            guids.extend(chunk)
        return guids, valid

    def _ensure_executor(self) -> ProcessPoolExecutor | None:
        """The decode worker pool (the torch DataLoader `num_workers`
        analog, reference: strategy.py:747-760).  Workers run only host
        code (JPEG decode / crop / resize — numpy, PIL, or the native
        loader) and come from the process-wide forkserver pool
        (`_shared_executor`): no fork-with-threads hazard, no re-fork of an
        ever-larger parent per AL iteration, and worker-local caches
        persist across loaders.
        """
        if self.num_workers > 0:
            # Re-fetch every sweep: the shared pool may have been grown (and
            # the old one retired) by a loader with a larger worker count.
            # Ref-counted so a retired pool shuts down once its last holder
            # lets go (close / the swap below) instead of idling til exit.
            ex = _acquire_shared_executor(self.num_workers)
            if ex is self._executor:
                _release_shared_executor(ex)  # already hold a ref
            else:
                _release_shared_executor(self._executor)
                self._executor = ex
        return self._executor

    def close(self) -> None:
        # Release the liveness ref: the executor is process-shared (the
        # current pool stays warm; a grown-past one shuts down with its
        # last holder — see _release_shared_executor).
        ex, self._executor = self._executor, None
        _release_shared_executor(ex)

    def __enter__(self) -> "FrameLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _prepared(self, frames) -> Iterator[Dict]:
        """Per-frame host prep, in order; overlapped across `num_workers`
        processes with a bounded in-flight window (unbounded submission
        would buffer ~1 MB/frame of decoded views for the whole epoch).

        Warm-sweep fast path: each worker process owns a PRIVATE
        VIEW_CACHE and the executor assigns frames to arbitrary workers,
        so a second sweep over the same pool would still re-decode and
        re-pickle ~6 MB/frame of views (measured: 3.2 of the 3.85 s/batch
        warm pool-sweep cost, BENCH_NOTES round 3).  Instead (a) every
        worker result back-fills the PARENT's VIEW_CACHE, and (b) a frame
        whose views are all hot in the parent is prepared inline — no
        decode, no IPC — which is every frame from the second AL-iteration
        sweep on."""
        ex = self._ensure_executor()
        if ex is None:
            for f in frames:
                yield prepare_views_host(f, self.data_cfg, self.gt_stride)
            return
        cache_size = _effective_cache_size(self.data_cfg)
        window = max(2 * self.num_workers, self.batch_size)
        pending: deque = deque()  # prepared dicts or (future, view_keys)

        def submit(f):
            if cache_size > 0:
                keys = _frame_view_keys(f, self.data_cfg)
                if all(VIEW_CACHE.get(k) is not None for k in keys):
                    return prepare_views_host(f, self.data_cfg, self.gt_stride)
            else:
                keys = None
            return (
                ex.submit(prepare_views_host, f, self.data_cfg, self.gt_stride),
                keys,
            )

        def resolve(item):
            if isinstance(item, dict):
                return item
            fut, keys = item
            out = fut.result()
            if keys is not None:
                for key, img in zip(keys, out["images"]):
                    VIEW_CACHE.put(key, img, cache_size)
            return out

        it = iter(frames)

        def fill():
            # Keep up to `window` WORKER futures in flight, but pause the
            # lookahead when every pending item is an inline cache-hit:
            # eager windowing exists to overlap the worker processes, an
            # inline hit is already done, and queueing prepared frames ahead
            # only grows the live-buffer set (measured: the extra live ~6 MB
            # dicts break malloc's block reuse for the 24 MB batch stacks
            # downstream — 0.68 s/stack vs 12 ms, BENCH_NOTES round 3).
            # On a MIXED hot/cold sweep (pool grew since the last one) the
            # lookahead keeps running while any future is outstanding, so an
            # interleaved hot frame does not collapse the decode overlap to
            # one in-flight worker.
            while len(pending) < window:
                if (
                    pending
                    and isinstance(pending[-1], dict)
                    and all(isinstance(p, dict) for p in pending)
                ):
                    return
                try:
                    f = next(it)
                except StopIteration:
                    return
                pending.append(submit(f))

        try:
            fill()
            while pending:
                out = resolve(pending.popleft())
                fill()
                yield out
        finally:
            while pending:
                item = pending.popleft()
                if not isinstance(item, dict):
                    item[0].cancel()

    def _batches(self) -> Iterator[Dict]:
        frames = self.pool.data[self.shard_index :: self.num_shards]
        B = self.batch_size
        n_batches = len(self)  # equalized across shards when num_shards > 1
        prepared_it = self._prepared(frames)
        pad_frame = None
        for b in range(n_batches):
            start = b * B
            n_real = max(0, min(B, len(frames) - start))
            prepared = [next(prepared_it) for _ in range(n_real)]
            valid = np.zeros(B, bool)
            valid[:n_real] = True
            if prepared:
                pad_frame = prepared[-1]
            elif pad_frame is None:
                # This shard is shorter than the longest one and has no
                # frames at all — prepare any pool frame once as padding
                # (every row is frame_valid=False).
                pad_frame = prepare_views_host(
                    self.pool.data[0], self.data_cfg, self.gt_stride
                )
            while len(prepared) < B:  # pad to fixed shape
                prepared.append(pad_frame)
            batch = {
                key: np.stack([p[key] for p in prepared])
                for key in prepared[0]
                if key != "guid"
            }
            batch["guid"] = [p["guid"] for p in prepared]
            batch["frame_valid"] = valid
            yield batch

    def __iter__(self) -> Iterator[Dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: Queue = Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        error: List[BaseException] = []

        def put(item) -> bool:
            # Bounded put that gives up when the consumer abandoned the
            # iterator (e.g. the train loop `break`s mid-epoch) so the
            # prefetch thread never leaks blocked on a full queue.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except Exception:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not put(b):
                        return
            except BaseException as e:  # surface loader errors in the consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
