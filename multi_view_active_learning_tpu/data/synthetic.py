"""Synthetic dataset generator for tests and benchmarks.

Writes a miniature CMU-Panoptic-schema tree (labels.json / boxes.json /
split.json / pose/hdImgs/<cam>/<cam>_<frame>.jpg) — the exact JSON layout the
reference reads (dataset/panoptic_dataset.py:21-66, schema produced by
dataset/panoptic_utils/aggregate_labels.py) — and an InterHand2.6M-schema
variant.  The reference has no offline fixture story at all (its dataset
tests require manifold access, SURVEY.md §4); this generator is what makes
the data layer testable hermetically.

Scenes are camera rings around a randomly drifting K-joint "skeleton"; each
joint renders as a bright disc so a model can actually learn localization.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np
from PIL import Image

from ..ops import geometry

FULL_W, FULL_H = 256, 256


def _ring_camera(idx: int, num: int, radius: float, focal: float) -> Dict:
    ang = 2 * np.pi * idx / num + 0.07
    pos = np.array(
        [radius * np.cos(ang), 30.0 + 8.0 * np.sin(3 * ang), radius * np.sin(ang)]
    )
    z = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    t = -R @ pos
    K = np.array([[focal, 0.0, FULL_W / 2], [0.0, focal, FULL_H / 2], [0, 0, 1.0]])
    return {
        "R": R.tolist(),
        "t": t.tolist(),
        "K": K.tolist(),
        "dist": [0.0, 0.0, 0.0, 0.0, 0.0],
    }


def _skeleton_walk(rng, num_frames: int, num_joints: int, scale: float):
    base = rng.normal(scale=scale, size=(num_joints, 3))
    frames = []
    cur = base
    for _ in range(num_frames):
        cur = 0.9 * cur + 0.1 * base + rng.normal(scale=scale * 0.08, size=cur.shape)
        frames.append(cur.copy())
    return frames


def _render_view(kp2d: np.ndarray, rng, cam_index: int = 0) -> np.ndarray:
    """Bright discs at projected joints over a static per-camera background.

    The background is deterministic per camera (a seeded texture), NOT
    per-frame noise: iid per-frame backgrounds invite shortcut memorization
    — a model can key heatmaps off the unique noise pattern of each training
    frame and never learn the discs, making validation metrics on the
    synthetic set meaningless.
    """
    bg_rng = np.random.default_rng(1000 + cam_index)
    base = bg_rng.integers(10, 60, size=(8, 8, 3)).astype(np.uint8)
    img = np.asarray(
        Image.fromarray(base).resize((FULL_W, FULL_H), Image.BILINEAR)
    ).copy()
    ys, xs = np.mgrid[0:FULL_H, 0:FULL_W]
    for k, (x, y) in enumerate(kp2d):
        if not (0 <= x < FULL_W and 0 <= y < FULL_H):
            continue
        d2 = (xs - x) ** 2 + (ys - y) ** 2
        mask = d2 < 16.0
        color = np.array(
            [80 + (k * 37) % 175, 80 + (k * 73) % 175, 80 + (k * 101) % 175],
            np.uint8,
        )
        img[mask] = color
    return img


def generate_panoptic_tree(
    root: str,
    num_train_frames: int = 12,
    num_val_frames: int = 6,
    num_joints: int = 19,
    num_cameras: int = 4,
    sample_rate: int = 25,
    seed: int = 0,
    image_quality: int = 90,
) -> str:
    """Build the tree and return `root`.  Frame ids are multiples of
    `sample_rate` so the indexer's strided walk hits every frame."""
    rng = np.random.default_rng(seed)
    cameras = {
        "00_%02d" % i: _ring_camera(i, num_cameras, radius=170.0, focal=300.0)
        for i in range(num_cameras)
    }
    cam_names = sorted(cameras.keys())
    labels: Dict = {"train": {}, "val": {}}
    boxes: Dict = {"train": {}, "val": {}}
    split: Dict = {
        "train": {},
        "val": {},
        "test": {},
        "cameras": {"train": cam_names, "val": cam_names, "test": cam_names},
    }

    for split_name, pose_name, n_frames in (
        ("train", "171026_pose1", num_train_frames),
        ("val", "171026_pose2", num_val_frames),
    ):
        skels = _skeleton_walk(rng, n_frames, num_joints, scale=18.0)
        labels[split_name][pose_name] = {
            "cameras": cameras,
        }
        boxes[split_name][pose_name] = {}
        split[split_name][pose_name] = [[0, n_frames * sample_rate]]
        for i, skel in enumerate(skels):
            frame_id = i * sample_rate
            # schema: [4, K] rows x, y, z, confidence
            labels[split_name][pose_name][str(frame_id)] = np.vstack(
                [skel.T, np.ones((1, num_joints))]
            ).tolist()
            boxes[split_name][pose_name][str(frame_id)] = {}
            for cam_name in cam_names:
                cam = geometry.Camera(
                    cameras[cam_name]["R"],
                    cameras[cam_name]["t"],
                    cameras[cam_name]["K"],
                    cameras[cam_name]["dist"],
                )
                kp2d = cam.project(skel)
                left, top = kp2d.min(axis=0) - 12
                right, bottom = kp2d.max(axis=0) + 12
                boxes[split_name][pose_name][str(frame_id)][cam_name] = [
                    int(left),
                    int(top),
                    int(right),
                    int(bottom),
                ]
                img_dir = os.path.join(root, pose_name, "hdImgs", cam_name)
                os.makedirs(img_dir, exist_ok=True)
                img = _render_view(kp2d, rng, cam_index=cam_names.index(cam_name))
                Image.fromarray(img).save(
                    os.path.join(img_dir, "%s_%08d.jpg" % (cam_name, frame_id)),
                    quality=image_quality,
                )
    # test split reuses val poses (labels for test live under "val",
    # panoptic_dataset.py:31)
    split["test"] = dict(split["val"])

    with open(os.path.join(root, "labels.json"), "w") as f:
        json.dump(labels, f)
    with open(os.path.join(root, "boxes.json"), "w") as f:
        json.dump(boxes, f)
    with open(os.path.join(root, "split.json"), "w") as f:
        json.dump(split, f)
    return root


def generate_ih26m_tree(
    root: str,
    num_frames: int = 6,
    num_joints: int = 42,
    num_cameras: int = 4,
    seed: int = 0,
) -> str:
    """Miniature InterHand2.6M-schema tree (annotations/<split>/*.json +
    images/<split>/...), matching the fields read at
    dataset/ih26m_dataset.py:19-119."""
    rng = np.random.default_rng(seed)
    cam_names = ["cam%02d" % i for i in range(num_cameras)]
    for split_name in ("train", "val", "test"):
        camrot, campos, focal, princpt = {}, {}, {}, {}
        cams = {}
        for i, name in enumerate(cam_names):
            c = _ring_camera(i, num_cameras, radius=170.0, focal=300.0)
            R = np.asarray(c["R"])
            t = np.asarray(c["t"])
            camrot[name] = R.tolist()
            campos[name] = (-R.T @ t).tolist()
            focal[name] = [c["K"][0][0], c["K"][1][1]]
            princpt[name] = [c["K"][0][2], c["K"][1][2]]
            cams[name] = c
        camera_json = {"0": {"camrot": camrot, "campos": campos,
                             "focal": focal, "princpt": princpt}}
        skels = _skeleton_walk(rng, num_frames, num_joints, scale=18.0)
        images: List[Dict] = []
        annotations: List[Dict] = []
        joint_3d: Dict = {"0": {}}
        for i, skel in enumerate(skels):
            joint_3d["0"][str(i)] = {
                "world_coord": skel.tolist(),
                "joint_valid": [[1.0]] * num_joints,
                "hand_type": "interacting",
            }
            for name in cam_names:
                cam = geometry.Camera(cams[name]["R"], cams[name]["t"], cams[name]["K"])
                kp2d = cam.project(skel)
                left, top = kp2d.min(axis=0) - 12
                right, bottom = kp2d.max(axis=0) + 12
                file_name = "img_%d_%s.jpg" % (i, name)
                img_path = os.path.join(root, "images", split_name, file_name)
                os.makedirs(os.path.dirname(img_path), exist_ok=True)
                Image.fromarray(
                    _render_view(kp2d, rng, cam_index=cam_names.index(name))
                ).save(img_path, quality=90)
                images.append(
                    {
                        "capture": 0,
                        "frame_idx": i,
                        "camera": name,
                        "file_name": file_name,
                    }
                )
                annotations.append(
                    {
                        "bbox": [
                            float(left),
                            float(top),
                            float(right - left),
                            float(bottom - top),
                        ],
                        "joint_valid": [[1.0]] * num_joints,
                    }
                )
        ann_dir = os.path.join(root, "annotations", split_name)
        os.makedirs(ann_dir, exist_ok=True)
        with open(
            os.path.join(ann_dir, "InterHand2.6M_%s_camera.json" % split_name), "w"
        ) as f:
            json.dump(camera_json, f)
        with open(
            os.path.join(ann_dir, "InterHand2.6M_%s_data.json" % split_name), "w"
        ) as f:
            json.dump({"images": images, "annotations": annotations}, f)
        with open(
            os.path.join(ann_dir, "InterHand2.6M_%s_joint_3d.json" % split_name), "w"
        ) as f:
            json.dump(joint_3d, f)
    return root
