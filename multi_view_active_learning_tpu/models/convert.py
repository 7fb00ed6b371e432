"""torch .pth <-> flax parameter conversion.

Purpose: load reference checkpoints (saved by strategy.py:697-706 as
{"state_dict": ...}) and ImageNet-pretrained trunks into the Flax models for
MPJPE-parity evaluation, and support the reference's pretrained-init
semantics (PoseResNet drops final_layer.*, HRNet filters by
pretrained_layers; reference strategy.py:722-742).

Tensor transforms (torch -> flax, NCHW -> NHWC):
  Conv2d weight [O, I, kh, kw]        -> kernel [kh, kw, I, O]
  ConvTranspose2d weight [I, O, kh, kw] -> kernel [kh, kw, I, O] with the
    spatial taps rot180'd: conv_transpose(x, w) == conv(dilate(x), rot180(w))
    and flax's lax.conv_transpose(transpose_kernel=False) is the latter.
  BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats.

Name mapping covers PoseResNet (pose_resnet.py layer naming) and HRNet
(hrnet.py transition/stage/fuse naming).  Both directions are provided so
tests can verify bijectivity without shipping a torch model definition.
"""

from __future__ import annotations

import io
import re
from typing import Dict, Tuple

import numpy as np

from ..utils import get_logger

_logger = get_logger(__name__)


# --------------------------------------------------------------- tensor level


def conv_weight_to_flax(w: np.ndarray) -> np.ndarray:
    """[O, I, kh, kw] -> [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_weight_to_torch(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))


def deconv_weight_to_flax(w: np.ndarray) -> np.ndarray:
    """[I, O, kh, kw] -> [kh, kw, I, O], spatially rotated 180 degrees."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def deconv_weight_to_torch(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1]


# ----------------------------------------------------------------- name level


def _posresnet_torch_to_flax(name: str) -> Tuple[str, ...]:
    """torch state_dict key (module path, no param leaf) -> flax module path."""
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.(conv\d|bn\d)", name)
    if m:
        return ("layer%s_%s" % (m.group(1), m.group(2)), m.group(3))
    m = re.fullmatch(r"layer(\d+)\.(\d+)\.downsample\.(\d)", name)
    if m:
        leaf = "downsample_conv" if m.group(3) == "0" else "downsample_bn"
        return ("layer%s_%s" % (m.group(1), m.group(2)), leaf)
    m = re.fullmatch(r"deconv_layers\.(\d+)", name)
    if m:
        idx = int(m.group(1))
        if idx % 3 == 0:
            return ("deconv%d" % (idx // 3),)
        if idx % 3 == 1:
            return ("deconv_bn%d" % (idx // 3),)
        raise KeyError(name)
    if name in ("conv1", "bn1", "final_layer"):
        return (name,)
    raise KeyError("Unmapped PoseResNet module: %s" % name)


def _hrnet_torch_to_flax(name: str) -> Tuple[str, ...]:
    if name in ("conv1", "bn1", "conv2", "bn2", "final_layer"):
        return (name,)
    m = re.fullmatch(r"layer1\.(\d+)\.(conv\d|bn\d)", name)
    if m:
        return ("layer1_%s" % m.group(1), m.group(2))
    m = re.fullmatch(r"layer1\.(\d+)\.downsample\.(\d)", name)
    if m:
        leaf = "downsample_conv" if m.group(2) == "0" else "downsample_bn"
        return ("layer1_%s" % m.group(1), leaf)
    # transitions — existing branch: transition{t}.{i}.{0|1}
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d)", name)
    if m:
        leaf = "conv" if m.group(3) == "0" else "bn"
        return ("transition%s_%s_%s" % (m.group(1), m.group(2), leaf),)
    # transitions — new branch chain: transition{t}.{i}.{j}.{0|1}
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d+)\.(\d)", name)
    if m:
        leaf = "conv" if m.group(4) == "0" else "bn"
        return (
            "transition%s_%s_%s%s" % (m.group(1), m.group(2), leaf, m.group(3)),
        )
    # stage branches: stage{s}.{m}.branches.{b}.{i}.(conv#|bn#)
    m = re.fullmatch(r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.(conv\d|bn\d)", name)
    if m:
        return (
            "stage%s_module%s" % (m.group(1), m.group(2)),
            "branch%s_block%s" % (m.group(3), m.group(4)),
            m.group(5),
        )
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.(\d)", name
    )
    if m:
        leaf = "downsample_conv" if m.group(5) == "0" else "downsample_bn"
        return (
            "stage%s_module%s" % (m.group(1), m.group(2)),
            "branch%s_block%s" % (m.group(3), m.group(4)),
            leaf,
        )
    # fuse j > i (up): stage{s}.{m}.fuse_layers.{i}.{j}.{0|1}
    m = re.fullmatch(r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d)", name)
    if m:
        leaf = "conv" if m.group(5) == "0" else "bn"
        return (
            "stage%s_module%s" % (m.group(1), m.group(2)),
            "fuse%s_%s_%s" % (m.group(3), m.group(4), leaf),
        )
    # fuse j < i (down chain): stage{s}.{m}.fuse_layers.{i}.{j}.{k}.{0|1}
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.(\d)", name
    )
    if m:
        leaf = "conv" if m.group(6) == "0" else "bn"
        return (
            "stage%s_module%s" % (m.group(1), m.group(2)),
            "fuse%s_%s_%s%s" % (m.group(3), m.group(4), leaf, m.group(5)),
        )
    raise KeyError("Unmapped HRNet module: %s" % name)


_MAPPERS = {"POSE_RESNET": _posresnet_torch_to_flax, "HRNET": _hrnet_torch_to_flax}


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray], model_type: str
) -> Tuple[Dict, Dict]:
    """Convert a torch state_dict to (params, batch_stats) nested dicts."""
    mapper = _MAPPERS[model_type]
    params: Dict = {}
    batch_stats: Dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = value

    for key, value in state_dict.items():
        key = key.replace("module.", "")  # DDP prefix
        if key.endswith("num_batches_tracked"):
            continue
        module, param = key.rsplit(".", 1)
        path = mapper(module)
        arr = np.asarray(value)
        if param == "weight":
            if arr.ndim == 4:
                # torch ConvTranspose2d lives only at PoseResNet's
                # deconv_layers.{0,3,6}; detect by module name.
                if model_type == "POSE_RESNET" and re.fullmatch(
                    r"deconv_layers\.(0|3|6)", module
                ):
                    put(params, path, "kernel", deconv_weight_to_flax(arr))
                else:
                    put(params, path, "kernel", conv_weight_to_flax(arr))
            else:  # BN scale
                put(params, path, "scale", arr)
        elif param == "bias":
            put(params, path, "bias", arr)
        elif param == "running_mean":
            put(batch_stats, path, "mean", arr)
        elif param == "running_var":
            put(batch_stats, path, "var", arr)
        else:
            raise KeyError("Unknown param leaf: %s" % key)
    return params, batch_stats


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth (full checkpoint dict or bare state_dict)."""
    import torch

    with open(path, "rb") as f:
        ckpt = torch.load(io.BytesIO(f.read()), map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() for k, v in state_dict.items()}


def _merge_into(dst: Dict, src: Dict, prefix="") -> int:
    """Recursively overwrite dst leaves present in src; returns count."""
    n = 0
    for key, value in src.items():
        if key not in dst:
            _logger.warning("Skipping unmatched converted entry: %s%s" % (prefix, key))
            continue
        if isinstance(value, dict):
            n += _merge_into(dst[key], value, prefix + key + "/")
        else:
            if np.shape(dst[key]) != np.shape(value):
                raise ValueError(
                    "Shape mismatch at %s%s: %s vs %s"
                    % (prefix, key, np.shape(dst[key]), np.shape(value))
                )
            dst[key] = value.astype(np.asarray(dst[key]).dtype)
            n += 1
    return n


def _flax_to_torch_name(path: Tuple[str, ...], leaf: str, model_type: str) -> str:
    """Inverse of the torch->flax module mapping for one parameter."""
    mapper = _MAPPERS[model_type]
    # Invert by searching candidate torch names is unnecessary: the flax
    # names were derived mechanically, so reverse the string transforms.
    mod = "/".join(path)
    name = None
    if model_type == "POSE_RESNET":
        m = re.fullmatch(r"layer(\d+)_(\d+)/(conv\d|bn\d)", mod)
        if m:
            name = "layer%s.%s.%s" % m.groups()
        m = re.fullmatch(r"layer(\d+)_(\d+)/downsample_(conv|bn)", mod)
        if m:
            idx = "0" if m.group(3) == "conv" else "1"
            name = "layer%s.%s.downsample.%s" % (m.group(1), m.group(2), idx)
        m = re.fullmatch(r"deconv(\d)", mod)
        if m:
            name = "deconv_layers.%d" % (int(m.group(1)) * 3)
        m = re.fullmatch(r"deconv_bn(\d)", mod)
        if m:
            name = "deconv_layers.%d" % (int(m.group(1)) * 3 + 1)
        if mod in ("conv1", "bn1", "final_layer"):
            name = mod
    if model_type == "HRNET":
        if mod in ("conv1", "bn1", "conv2", "bn2", "final_layer"):
            name = mod
        m = re.fullmatch(r"layer1_(\d+)/(conv\d|bn\d)", mod)
        if m:
            name = "layer1.%s.%s" % m.groups()
        m = re.fullmatch(r"layer1_(\d+)/downsample_(conv|bn)", mod)
        if m:
            idx = "0" if m.group(2) == "conv" else "1"
            name = "layer1.%s.downsample.%s" % (m.group(1), idx)
        m = re.fullmatch(r"transition(\d)_(\d+)_(conv|bn)", mod)
        if m:
            idx = "0" if m.group(3) == "conv" else "1"
            name = "transition%s.%s.%s" % (m.group(1), m.group(2), idx)
        m = re.fullmatch(r"transition(\d)_(\d+)_(conv|bn)(\d+)", mod)
        if m:
            idx = "0" if m.group(3) == "conv" else "1"
            name = "transition%s.%s.%s.%s" % (m.group(1), m.group(2), m.group(4), idx)
        m = re.fullmatch(r"stage(\d)_module(\d+)/branch(\d+)_block(\d+)/(conv\d|bn\d)", mod)
        if m:
            name = "stage%s.%s.branches.%s.%s.%s" % m.groups()
        m = re.fullmatch(
            r"stage(\d)_module(\d+)/branch(\d+)_block(\d+)/downsample_(conv|bn)", mod
        )
        if m:
            idx = "0" if m.group(5) == "conv" else "1"
            name = "stage%s.%s.branches.%s.%s.downsample.%s" % (
                m.group(1), m.group(2), m.group(3), m.group(4), idx,
            )
        m = re.fullmatch(r"stage(\d)_module(\d+)/fuse(\d+)_(\d+)_(conv|bn)", mod)
        if m:
            idx = "0" if m.group(5) == "conv" else "1"
            name = "stage%s.%s.fuse_layers.%s.%s.%s" % (
                m.group(1), m.group(2), m.group(3), m.group(4), idx,
            )
        m = re.fullmatch(r"stage(\d)_module(\d+)/fuse(\d+)_(\d+)_(conv|bn)(\d+)", mod)
        if m:
            idx = "0" if m.group(5) == "conv" else "1"
            name = "stage%s.%s.fuse_layers.%s.%s.%s.%s" % (
                m.group(1), m.group(2), m.group(3), m.group(4), m.group(6), idx,
            )
    if name is None:
        raise KeyError("Cannot invert flax path %s for %s" % (mod, model_type))
    # sanity: the forward mapping must agree
    assert mapper(name) == path, (name, path)
    suffix = {
        "kernel": "weight", "scale": "weight", "bias": "bias",
        "mean": "running_mean", "var": "running_var",
    }[leaf]
    return "%s.%s" % (name, suffix)


def flax_to_torch_state_dict(params, batch_stats, model_type: str) -> Dict:
    """Export flax (params, batch_stats) to a torch-style state_dict of
    numpy arrays (PoseResNet and HRNet) — the reverse interop direction,
    so models trained here can be evaluated in the reference stack."""

    out: Dict[str, np.ndarray] = {}

    def walk(tree, path, is_stats):
        for key, value in tree.items():
            if isinstance(value, dict):
                walk(value, path + (key,), is_stats)
                continue
            name = _flax_to_torch_name(path, key, model_type)
            arr = np.asarray(value)
            if key == "kernel":
                if name.startswith("deconv_layers"):
                    arr = deconv_weight_to_torch(arr)
                else:
                    arr = conv_weight_to_torch(arr)
            out[name] = arr

    walk(params, (), False)
    walk(batch_stats, (), True)
    return out


def load_pretrained(cfg, path: str, state):
    """Reference pretrained-init semantics (strategy.py:722-742):
    PoseResNet drops final_layer.*; HRNet keeps only PRETRAINED_LAYERS
    prefixes.  Non-.pth paths fall back to an orbax params-only restore."""
    if not path.endswith(".pth"):
        from ..utils import checkpoint as ckpt_utils

        return ckpt_utils.restore_params_only(path, state)
    sd = load_torch_checkpoint(path)
    model_type = cfg.POSE_ESTIMATOR.TYPE
    if model_type == "POSE_RESNET":
        sd.pop("final_layer.weight", None)
        sd.pop("final_layer.bias", None)
    elif model_type == "HRNET":
        allowed = cfg.POSE_ESTIMATOR.HRNET.PRETRAINED_LAYERS
        if allowed and allowed[0] != "*":
            sd = {
                k: v
                for k, v in sd.items()
                if k.replace("module.", "").split(".")[0] in allowed
            }
    params, batch_stats = torch_state_dict_to_flax(sd, model_type)
    import jax

    new_params = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))
    new_stats = jax.tree_util.tree_map(np.asarray, jax.device_get(state.batch_stats))
    n1 = _merge_into(new_params, params)
    n2 = _merge_into(new_stats, batch_stats)
    _logger.info("Loaded %d param and %d stat tensors from %s" % (n1, n2, path))
    return state.replace(params=new_params, batch_stats=new_stats)
