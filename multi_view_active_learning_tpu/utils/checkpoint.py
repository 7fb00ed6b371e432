"""Orbax checkpointing with the reference's file layout.

Reference behavior (strategy.py:681-745): two artifacts per save point —
step-named ``CKPT-E{step}-MKPE{mkpe}`` and rolling ``CKPT-FINAL`` — saved
under ``<log_dir>/<expr_name>/checkpoints``; strict restore for
resume/eval; filtered non-strict load for pretrained init.  The reference
saves optimizer state but never restores it (SURVEY.md §5) — we restore it,
fixing that quirk, while `restore_params_only` reproduces the reference
semantics when needed.
"""

from __future__ import annotations

import os
import re
import shutil
import orbax.checkpoint as ocp

from . import get_logger

_logger = get_logger(__name__)
_checkpointer = None


def _ckpt():
    global _checkpointer
    if _checkpointer is None:
        import jax

        if jax.process_count() > 1:
            # Process-LOCAL checkpointer.  A stock StandardCheckpointer
            # syncs every process inside save()/restore(); saves here are
            # gated to process 0 by the callers (the reference's rank-0
            # semantics, strategy.py:693-696) and restores read host-local
            # numpy from the shared filesystem, so a barrier involving the
            # other processes would pair with whatever collective THEY are
            # executing (observed: gloo "received data size doesn't match
            # expected size" aborts in the 2-process training smoke).
            idx = jax.process_index()
            _checkpointer = ocp.Checkpointer(
                ocp.StandardCheckpointHandler(),
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=idx,
                    active_processes={idx},
                    barrier_sync_key_prefix="proc%d" % idx,
                ),
            )
        else:
            _checkpointer = ocp.StandardCheckpointer()
    return _checkpointer


def _as_tree(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(path: str, state, epoch: int = 0) -> str:
    """Save (overwriting like the reference, strategy.py:693-696)."""
    import jax

    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
        _logger.info("Overwriting checkpoint: %s" % path)
    tree = dict(_as_tree(state))
    tree["epoch"] = epoch
    # Fetch the whole tree in one batched device->host pass: leaf-by-leaf
    # fetches inside the serializer cost one tunnel round-trip each
    # (~25 ms x ~120 leaves measured).
    tree = jax.device_get(tree)
    _ckpt().save(path, tree)
    wait = getattr(_ckpt(), "wait_until_finished", None)
    if wait is not None:  # the multi-process Checkpointer is synchronous
        wait()
    _logger.info("Checkpoint saved at %s." % path)
    return path


def save_checkpoints(paths, state, epoch: int = 0) -> None:
    """Save the same state under several paths: one device->host fetch +
    one orbax serialize, then host-side directory copies for the rest.

    The fetch is tunnel-bandwidth-bound (~5.5 s for a ResNet-18 Adam state
    measured); serializing twice doubled the cost for identical bytes.
    NOTE: a background-thread variant was measured SLOWER overall — the
    fetch contends with the training dispatch stream on the tunneled
    runtime's single connection — so this stays synchronous."""
    first = save_checkpoint(paths[0], state, epoch)
    for path in paths[1:]:
        path = os.path.abspath(path)
        if os.path.exists(path):
            shutil.rmtree(path)
            _logger.info("Overwriting checkpoint: %s" % path)
        shutil.copytree(first, path)
        _logger.info("Checkpoint saved at %s." % path)


def restore_checkpoint(path: str, state):
    """Strict full restore into a template TrainState (params + batch stats
    + optimizer state + step)."""
    path = os.path.abspath(path)
    import jax

    # Host-numpy template: the restore is a process-local disk read (each
    # process restores independently in multi-process runs — no barriers,
    # no sharded-array reconstruction); callers re-place on device via
    # strategy._maybe_replicate.
    template = jax.device_get(dict(_as_tree(state)))
    template["epoch"] = 0
    restored = _ckpt().restore(path, template)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def restore_params_only(path: str, state):
    """Reference semantics: only the model weights come back
    (strategy.py:713-721 reads just state_dict)."""
    restored = restore_checkpoint(path, state)
    return state.replace(
        params=restored.params, batch_stats=restored.batch_stats
    )


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(path)


def final_ckpt_path(log_dir: str, expr_name: str, sub: str = "") -> str:
    parts = [log_dir, expr_name] + ([sub] if sub else []) + [
        "checkpoints", "CKPT-FINAL",
    ]
    return os.path.join(*parts)
