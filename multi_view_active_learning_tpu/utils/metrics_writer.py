"""Experiment metrics: JSONL always, TensorBoard when available.

The reference writes scalars, PCK curves, rendered matplotlib figures and
SAL histograms to TensorBoard (strategy.py:651-679, 791-848; SURVEY.md §5).
Here every record also lands in ``metrics.jsonl`` (machine-readable, no TB
dependency); TensorBoard mirrors it when the `tensorboard` package exists.
The scalar taxonomy matches the reference (lr, loss/train, 3D MKPE,
"3DPCK@t/average", per-keypoint curves, sal/* histograms).
"""

from __future__ import annotations

import json
import time
import weakref
from typing import Sequence

import numpy as np

from . import storage


def _close_quietly(f) -> None:
    try:
        f.close()
    except Exception:
        pass


def _try_tb(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except Exception:
        return None


class MetricsWriter:
    def __init__(self, log_dir: str):
        storage.makedirs(log_dir)
        self.log_dir = log_dir
        if storage.is_remote(log_dir):
            # Object-store backends (gcsfs, s3fs) do not support append, so
            # each writer attachment streams a fresh uniquely-numbered
            # shard ("w" mode); re-attaching to the same dir (the AL
            # writer does, once per iteration) extends the record instead
            # of truncating it.  Readers concatenate metrics-*.jsonl in
            # name order.
            existing = [
                n for n in storage.listdir(log_dir)
                if n.startswith("metrics-") and n.endswith(".jsonl")
            ]
            name = "metrics-%03d.jsonl" % len(existing)
            self._jsonl = storage.open_file(storage.join(log_dir, name), "w")
        else:
            self._jsonl = storage.open_file(
                storage.join(log_dir, "metrics.jsonl"), "a"
            )
        # TB's SummaryWriter only writes local files; remote log dirs keep
        # the JSONL record (the product contract) and skip TB.
        self._tb = None if storage.is_remote(log_dir) else _try_tb(log_dir)
        # Remote streams upload on close; the AL writer is long-lived and
        # has no explicit close path, so flush it at GC/interpreter exit.
        self._finalizer = weakref.finalize(self, _close_quietly, self._jsonl)

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._write({"tag": tag, "value": float(value), "step": int(step)})
        if self._tb:
            self._tb.add_scalar(tag, float(value), step)

    def add_histogram(self, tag: str, values, step: int) -> None:
        arr = np.asarray(values, dtype=np.float64)
        self._write(
            {
                "tag": tag,
                "kind": "histogram",
                "step": int(step),
                "count": int(arr.size),
                "mean": float(arr.mean()) if arr.size else 0.0,
                "std": float(arr.std()) if arr.size else 0.0,
                "min": float(arr.min()) if arr.size else 0.0,
                "max": float(arr.max()) if arr.size else 0.0,
            }
        )
        if self._tb:
            self._tb.add_histogram(tag, arr, step)

    def add_text(self, tag: str, text: str, step: int = 0) -> None:
        self._write({"tag": tag, "kind": "text", "text": text, "step": int(step)})
        if self._tb:
            self._tb.add_text(tag, text, step)

    def add_image(self, tag: str, image, step: int) -> None:
        """HWC uint8 image record: PNG artifact under <log_dir>/images/ +
        JSONL pointer + TB mirror (reference: writer.add_image with
        dataformats="HWC", strategy.py:836-848)."""
        arr = np.ascontiguousarray(np.asarray(image, dtype=np.uint8))
        rel = "images/%s-%d.png" % (tag.replace("/", "_"), int(step))
        path = storage.join(self.log_dir, "images",
                            "%s-%d.png" % (tag.replace("/", "_"), int(step)))
        storage.makedirs(storage.join(self.log_dir, "images"))
        try:
            from PIL import Image
            import io as _io

            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            with storage.open_file(path, "wb") as f:
                f.write(buf.getvalue())
        except Exception:
            rel = None
        self._write(
            {
                "tag": tag,
                "kind": "image",
                "step": int(step),
                "height": int(arr.shape[0]),
                "width": int(arr.shape[1]),
                "file": rel,
            }
        )
        if self._tb:
            self._tb.add_image(tag, arr, step, dataformats="HWC")

    def add_pck_curves(
        self, metric_name: str, step: int, thresholds: Sequence[float], pcks,
        render_figures: bool = True,
    ) -> None:
        """The reference's per-threshold average + per-keypoint scalars plus
        the rendered PCK-curve figure images (strategy.py:808-848)."""
        from . import visualization

        num_joints = len(pcks[0])
        per_joint = [[] for _ in range(num_joints)]
        avgs = []
        for threshold, pck in zip(thresholds, pcks):
            avg = float(np.mean(pck))
            avgs.append(avg)
            self.add_scalar("%s@%.1f/average" % (metric_name, threshold), avg, step)
            for kp_id, v in enumerate(pck):
                self.add_scalar(
                    "%s@%.1f/keypoint-%d" % (metric_name, threshold, kp_id), v, step
                )
                per_joint[kp_id].append(v)
        for kp_id in range(num_joints):
            self.add_scalar(
                "%s-AVG/keypoint-%d" % (metric_name, kp_id),
                float(np.mean(per_joint[kp_id])),
                step,
            )
            if render_figures:
                self.add_image(
                    "%s/keypoint-%d" % (metric_name, kp_id),
                    visualization.plot_pckh_figure(thresholds, per_joint[kp_id]),
                    step,
                )
        if render_figures:
            self.add_image(
                "%s/average" % metric_name,
                visualization.plot_pckh_figure(thresholds, avgs),
                step,
            )

    def _write(self, record: dict) -> None:
        record["time"] = time.time()
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        # Explicit close must PROPAGATE: for remote shards close() is the
        # upload, and a swallowed failure here would silently discard the
        # whole metrics record.  Only the GC/exit finalizer is quiet.
        self._finalizer.detach()
        try:
            self._jsonl.close()
        finally:
            if self._tb:
                self._tb.close()
