"""Experiment driver / CLI.

Reference: workflow.py:29-273 — which spawns one NCCL process per GPU per AL
iteration with file-based rendezvous.  The TPU runtime is single-controller:
one Python process drives every device through jit/GSPMD, so the "process
boundary per iteration" becomes a plain loop that rebuilds pools and model
state per iteration (state isolation preserved: datasets are reconstructed
and weights restored from the previous iteration's CKPT-FINAL, matching
workflow.py:48-73).

Fixes vs the reference (SURVEY.md quirks): the CLI actually works
(workflow.py:211 called argparse.add_argument on the module), and CLUSTER
experiments are reachable (the reference compared against the typo
"CLUSETER", workflow.py:99).

Usage:
  python -m multi_view_active_learning_tpu.workflow --config_file exp.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
from datetime import datetime
from typing import Dict, List, NamedTuple

import jax
import numpy as np

from . import config as config_lib
from .data import build_dataset
from .parallel import mesh_from_config
from .strategy import ActiveLearningStrategy
from .utils import storage
from .utils import enable_compilation_cache, get_logger
from .utils import checkpoint as ckpt


class FlowOutput(NamedTuple):
    """Result summary (reference: workflow.py:142-206)."""

    sizes: List[int]
    mkpes: List[float]
    pck_thresholds: List[float]
    pcks: List[List[float]]
    pckh_thresholds: List[float]
    pckhs: List[List[float]]
    avg_mkpe: float
    avg_pcks: List[float]
    avg_pckhs: List[float]
    strategy: str
    num_aug: int
    magnitude_aug: int
    pose_estimator: str
    dataset: str
    sigma: float
    input_cfg: str
    expr_name: str


def prepare_output(cfg, eval_dict: Dict) -> FlowOutput:
    sizes, mkpes, pcks, avg_pcks = [], [], [], []
    pckhs, avg_pckhs = [], []
    pck_thresholds: List[float] = []
    pckh_thresholds: List[float] = [0.0]
    for size in eval_dict:
        sizes.append(int(size))
        mkpes.append(eval_dict[size]["mkpe"])
        pcks.append(eval_dict[size]["pcks"])
        avg_pcks.append(float(np.mean(eval_dict[size]["pcks"])))
        pck_thresholds = eval_dict[size]["thresholds"]
        if "pckh_thresholds" in eval_dict[size]:
            pckh_thresholds = eval_dict[size]["pckh_thresholds"]
            pckhs.append(eval_dict[size]["pckh_pcks"])
            avg_pckhs.append(float(np.mean(eval_dict[size]["pckh_pcks"])))
        else:
            pckhs.append([0.0])
            avg_pckhs.append(0.0)
    return FlowOutput(
        sizes=sizes,
        mkpes=mkpes,
        pck_thresholds=pck_thresholds,
        pcks=pcks,
        pckh_thresholds=pckh_thresholds,
        pckhs=pckhs,
        avg_mkpe=float(np.mean(mkpes)) if mkpes else float("nan"),
        avg_pcks=avg_pcks,
        avg_pckhs=avg_pckhs,
        strategy=cfg.AL.STRATEGY,
        num_aug=cfg.DATA.NUM_AUG,
        magnitude_aug=cfg.DATA.AUG_MAGNITUDE,
        pose_estimator=cfg.POSE_ESTIMATOR.TYPE,
        dataset=cfg.DATA.TYPE,
        sigma=cfg.DATA.SIGMA,
        input_cfg=cfg.dump(),
        expr_name=cfg.EXPR_NAME,
    )


def run_al_iteration(cfg, mesh, iteration: int) -> None:
    """One AL/SAL iteration: restore pools from guid logs, score+select,
    retrain (reference: workflow.py:36-80)."""
    logger = get_logger("workflow")
    it_cfg = cfg.clone()
    it_cfg.AL.CURRENT_ITER = iteration
    strategy = ActiveLearningStrategy(it_cfg, mesh)
    if jax.process_index() == 0:
        # Reattach the experiment-level AL writer (sal/* histograms,
        # reference strategy.py:83-109) — this strategy instance is fresh
        # per iteration, mirroring the reference's fresh processes.
        from .utils.metrics_writer import MetricsWriter

        strategy.al_writer = MetricsWriter(strategy._expr_dir("AL"))
    state = strategy.new_state(salt=iteration)
    if iteration == 0:
        amount = cfg.AL.INITIAL_AMOUNT
    else:
        restore_path = os.path.join(
            cfg.LOG_DIR,
            cfg.EXPR_NAME,
            "ITER-%d" % (iteration - 1),
            "checkpoints",
            "CKPT-FINAL",
        )
        logger.info("Restoring scorer weights from %s" % restore_path)
        state = strategy._maybe_replicate(ckpt.restore_params_only(restore_path, state))
        amount = cfg.AL.ITER_AMOUNT
    train_pool = build_dataset(it_cfg, "train")
    val_pool = build_dataset(it_cfg, "val")
    train_pool = strategy.restore_dataset(train_pool, iteration)
    train_pool = strategy.sample_next_batch(
        train_pool,
        amount,
        cfg.SAL.NUM_FRAMES[iteration]
        if iteration < len(cfg.SAL.NUM_FRAMES)
        else cfg.SAL.NUM_FRAMES[-1],
        state,
        iteration,
    )
    # Fresh model per iteration (reference: workflow.py:72-73).
    fresh_state = strategy.new_state(salt=1000 + iteration)
    strategy.al_iteration(fresh_state, train_pool, val_pool, iteration)


def run_experiment(cfg) -> Dict:
    """Dispatch on EXPR_TYPE; returns the eval dict for summary printing."""
    logger = get_logger("workflow")
    from .parallel import initialize_distributed

    if initialize_distributed():
        logger.info(
            "Distributed: process %d/%d" % (jax.process_index(), jax.process_count())
        )
    mesh = mesh_from_config(cfg)
    logger.info("Mesh: %s" % (mesh,))
    result: Dict = {}

    if cfg.EXPR_TYPE in ("AL", "SAL"):
        strategy = ActiveLearningStrategy(cfg, mesh)
        strategy.prepare_al_experiments()
        if cfg.AL.START_ITER != 0:
            if not cfg.AL.PREVIOUS_AL_LOG_DIR:
                raise ValueError(
                    "AL.START_ITER != 0 requires AL.PREVIOUS_AL_LOG_DIR"
                )
            # Process-0-only, like every other write to the shared log dir:
            # concurrent copytree to one destination races/truncates the
            # orbax files the first iteration then restores.
            if jax.process_index() == 0:
                strategy._copy_previous_checkpoints()
            from .parallel import process_barrier

            process_barrier("copy-prev-ckpts/%s" % cfg.EXPR_NAME)
        for iteration in range(cfg.AL.START_ITER, cfg.AL.ITERATIONS):
            run_al_iteration(cfg, mesh, iteration)
        eval_cfg = cfg.clone()
        eval_cfg.EXPR_TYPE = "AL_EVAL"
        eval_cfg.AL.INFERENCE.TRAINING_EXPR_NAME = eval_cfg.EXPR_NAME
        result = run_experiment_eval(eval_cfg, mesh)
    elif cfg.EXPR_TYPE == "SUPERVISED":
        strategy = ActiveLearningStrategy(cfg, mesh)
        train_pool = build_dataset(cfg, "train")
        val_pool = build_dataset(cfg, "val")
        strategy.run_fully_supervised_training(
            strategy.new_state(), train_pool, val_pool
        )
        eval_cfg = cfg.clone()
        eval_cfg.EXPR_TYPE = "EVAL"
        eval_cfg.AL.INFERENCE.RESTORE_FROM = ckpt.final_ckpt_path(
            cfg.LOG_DIR, cfg.EXPR_NAME, "FULLY_SUPERVISED"
        )
        result = run_experiment_eval(eval_cfg, mesh)
    elif cfg.EXPR_TYPE in ("AL_EVAL", "EVAL"):
        result = run_experiment_eval(cfg, mesh)
    elif cfg.EXPR_TYPE == "CLUSTER":
        strategy = ActiveLearningStrategy(cfg, mesh)
        train_pool = build_dataset(cfg, "train")
        strategy.cluster(strategy.new_state(), train_pool)
    else:
        raise ValueError("Unknown EXPR_TYPE: %s" % cfg.EXPR_TYPE)

    if result and cfg.RESULTS:
        with storage.open_file(cfg.RESULTS, "w") as f:
            json.dump(result, f)
    return result


def run_experiment_eval(cfg, mesh) -> Dict:
    strategy = ActiveLearningStrategy(cfg, mesh)
    state = strategy.new_state()
    test_pool = build_dataset(cfg, "test")
    if cfg.EXPR_TYPE == "AL_EVAL":
        return strategy.run_al_eval(state, test_pool)
    return strategy.run_eval(state, test_pool)


def main(argv=None) -> FlowOutput | None:
    argparser = argparse.ArgumentParser()
    argparser.add_argument(
        "--config_file", help="Path to experiment config file.", default=""
    )
    args = argparser.parse_args(argv)
    cfg = config_lib.get_default_configs()
    if args.config_file:
        cfg.merge_from_file(args.config_file)

    # First-time jit compiles cost minutes on small hosts; the persistent
    # cache makes repeat experiment launches start in seconds.  Forced via
    # the config API because env vars are too late once jax is imported.
    enable_compilation_cache()
    # Multi-host bring-up (no-op outside pod/explicit-coordinator envs) —
    # the NCCL-rendezvous replacement (reference: workflow.py:228-230).
    from . import parallel

    parallel.initialize_distributed()
    logger = get_logger("workflow")
    logger.info("Merged configuration from %s." % (args.config_file or "<defaults>"))
    logger.info("Experiment type: %s" % cfg.EXPR_TYPE)
    # Every artifact path hangs off the timestamped EXPR_NAME; a
    # per-process datetime would diverge at microsecond resolution and
    # non-zero processes would then restore checkpoints/guid logs from
    # paths only process 0 writes — broadcast process 0's stamp.
    cfg.EXPR_NAME = cfg.EXPR_NAME + "-" + parallel.broadcast_string(
        "mval/expr_stamp", datetime.now().strftime("%m.%d.%Y:%H:%M.%f")
    )
    if not cfg.RESULTS:
        with tempfile.NamedTemporaryFile(delete=False, suffix=".json") as f:
            cfg.RESULTS = f.name
    logger.info("Results will be saved to %s" % cfg.RESULTS)

    result = run_experiment(cfg)
    if result:
        output = prepare_output(cfg, result)
        print(output)
        return output
    print("Experiment type %s does not have output." % cfg.EXPR_TYPE)
    return None


if __name__ == "__main__":
    main()
