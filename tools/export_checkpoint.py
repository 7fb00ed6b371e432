"""Export an orbax checkpoint to the reference's ``.pth`` format.

The torch->flax direction (models/convert.py::load_pretrained) lets
reference users bring their checkpoints here; this tool is the return
ticket: a model trained in this framework, saved back as the exact dict
the reference writes (``{"epoch", "global_step", "state_dict",
"optimizer"}`` — reference strategy.py:697-706) so it strict-loads into
the reference's DDP-wrapped estimators (strategy.py:713-721) and can be
evaluated or fine-tuned in the original stack.

Reference-format details reproduced:
  - state_dict keys carry the DDP ``module.`` prefix (the reference saves
    ``pose_estimator.state_dict()`` of the DDP wrapper and strict-loads
    into the same wrapper; ``--bare`` strips it for plain nn.Module use).
  - every BatchNorm gets a ``num_batches_tracked`` int64 scalar (torch's
    strict load requires the key; set to global_step, which is what a
    momentum-BN run of that length would have accumulated).
  - ``optimizer`` is an empty Adam-style state_dict placeholder: the
    reference saves optimizer state but never restores it (SURVEY.md §5),
    so nothing downstream reads the field.

Usage:
  python tools/export_checkpoint.py --ckpt <orbax dir> --out CKPT.pth \
      [--config_file experiments/foo.yaml] [--model POSE_RESNET]
      [--num_layers 50] [--num_joints 19] [--bare]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export_checkpoint(cfg, ckpt_path: str, out_path: str, bare: bool = False):
    """Restore `ckpt_path` (orbax) for the model `cfg` describes and write
    the reference-format torch checkpoint to `out_path`.  Returns the saved
    dict (state_dict values as torch tensors)."""
    import torch

    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.models.convert import (
        flax_to_torch_state_dict,
    )
    from multi_view_active_learning_tpu.utils import checkpoint as ckpt_utils

    import jax

    engine = Engine(cfg)
    state = engine.init_state(
        jax.random.PRNGKey(0),
        input_shape=(1, cfg.DATA.INPUT_HEIGHT, cfg.DATA.INPUT_WIDTH, 3),
    )
    state = ckpt_utils.restore_checkpoint(ckpt_path, state)
    step = int(np.asarray(state.step))

    sd = flax_to_torch_state_dict(
        jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        cfg.POSE_ESTIMATOR.TYPE,
    )
    out = {}
    for name, arr in sd.items():
        key = name if bare else "module." + name
        out[key] = torch.from_numpy(np.ascontiguousarray(arr))
        if name.endswith(".running_mean"):
            nbt = key[: -len("running_mean")] + "num_batches_tracked"
            out[nbt] = torch.tensor(step, dtype=torch.int64)
    payload = {
        "epoch": 0,
        "global_step": step,
        "state_dict": out,
        # Saved-but-never-restored in the reference (strategy.py:713-721
        # reads only state_dict); shape of torch.optim.Adam.state_dict().
        "optimizer": {"state": {}, "param_groups": []},
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    torch.save(payload, out_path)
    return payload


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    parser.add_argument("--out", required=True, help=".pth output path")
    parser.add_argument("--config_file", default=None)
    parser.add_argument("--model", default=None, help="POSE_RESNET | HRNET")
    parser.add_argument("--num_layers", type=int, default=None)
    parser.add_argument("--num_joints", type=int, default=None)
    parser.add_argument(
        "--bare", action="store_true",
        help="no DDP 'module.' prefix (plain nn.Module load)",
    )
    args = parser.parse_args()

    import jax

    # Weight plumbing only — never grab the TPU for it (and through the
    # tunnel a second client would FailedPrecondition anyway).  The site
    # hook pre-imports jax, so force the platform via the config API.
    jax.config.update("jax_platforms", "cpu")

    from multi_view_active_learning_tpu.config import load_config
    from multi_view_active_learning_tpu.utils import enable_compilation_cache

    enable_compilation_cache("/tmp/jax_cache")
    cfg = load_config(args.config_file)
    if args.model:
        cfg.POSE_ESTIMATOR.TYPE = args.model
    if args.num_layers is not None:
        cfg.POSE_ESTIMATOR.NUM_LAYERS = args.num_layers
    if args.num_joints is not None:
        cfg.DATA.NUM_JOINTS = args.num_joints
    payload = export_checkpoint(cfg, args.ckpt, args.out, bare=args.bare)
    print(
        "wrote %s: %d tensors, global_step=%d (%.1f MB)"
        % (
            args.out,
            len(payload["state_dict"]),
            payload["global_step"],
            os.path.getsize(args.out) / 1e6,
        )
    )


if __name__ == "__main__":
    main()
