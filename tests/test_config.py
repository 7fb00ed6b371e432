"""Config tree: YAML merge semantics (reference: yacs merge_from_file at
workflow.py:214-215)."""

import os

import pytest

from multi_view_active_learning_tpu.config import get_default_configs, load_config


def test_yaml_merge(tmp_path):
    path = os.path.join(str(tmp_path), "exp.yaml")
    with open(path, "w") as f:
        f.write(
            """
EXPR_TYPE: "SAL"
RANDOM_SEED: 42
AL:
  STRATEGY: "MPE"
  ITERATIONS: 3
SAL:
  NUM_FRAMES: [0, 5, 5]
TRAIN:
  OPTIM:
    LR: 0.01
DATA:
  NUM_JOINTS: 42
TPU:
  COMPUTE_DTYPE: "float32"
"""
        )
    cfg = load_config(path)
    assert cfg.EXPR_TYPE == "SAL"
    assert cfg.RANDOM_SEED == 42
    assert cfg.AL.STRATEGY == "MPE" and cfg.AL.ITERATIONS == 3
    assert cfg.SAL.NUM_FRAMES == [0, 5, 5]
    assert cfg.TRAIN.OPTIM.LR == 0.01
    assert cfg.DATA.NUM_JOINTS == 42
    assert cfg.TPU.COMPUTE_DTYPE == "float32"
    # untouched defaults survive
    assert cfg.TRAIN.BATCH_SIZE == 2
    assert cfg.AL.INITIAL_AMOUNT == 200


def test_unknown_key_raises(tmp_path):
    path = os.path.join(str(tmp_path), "bad.yaml")
    with open(path, "w") as f:
        f.write("AL:\n  NOT_A_KEY: 1\n")
    cfg = get_default_configs()
    with pytest.raises(KeyError):
        cfg.merge_from_file(path)


def test_type_mismatch_raises():
    cfg = get_default_configs()
    with pytest.raises(TypeError):
        cfg.merge_from_dict({"TRAIN": {"BATCH_SIZE": "two"}})


def test_int_float_coercion():
    cfg = get_default_configs()
    cfg.merge_from_dict({"TRAIN": {"OPTIM": {"LR": 1}}})  # int -> float field
    assert cfg.TRAIN.OPTIM.LR == 1.0
    assert isinstance(cfg.TRAIN.OPTIM.LR, float)


def test_clone_is_deep():
    cfg = get_default_configs()
    clone = cfg.clone()
    clone.AL.STRATEGY = "HP"
    clone.SAL.NUM_FRAMES.append(99)
    assert cfg.AL.STRATEGY == "RANDOM"
    assert 99 not in cfg.SAL.NUM_FRAMES


def test_dump_roundtrip(tmp_path):
    import yaml

    cfg = get_default_configs()
    cfg.AL.STRATEGY = "BSB"
    dumped = yaml.safe_load(cfg.dump())
    assert dumped["AL"]["STRATEGY"] == "BSB"
    assert dumped["POSE_ESTIMATOR"]["HRNET"]["STAGE4"]["NUM_MODULES"] == 3


def test_shipped_sample_configs_parse():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("sample-config.yaml", "synthetic-smoke.yaml",
                 "tpu-deployment.yaml"):
        cfg = load_config(os.path.join(here, "experiments", name))
        assert cfg.EXPR_TYPE in ("AL", "SAL", "SUPERVISED")


def test_reference_sample_config_loads_unchanged():
    # The reference's own experiments/sample-config.yaml sets SAL.NUM_FRAMES
    # to a scalar (20) for a list-typed key; merging must coerce it to a
    # singleton list instead of raising (reference: workflow.py:214-215).
    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "reference-sample-config.yaml"
    )
    cfg = load_config(path)
    assert cfg.SAL.NUM_FRAMES == [20]
    assert cfg.AL.START_ITER == 1
    assert cfg.TRAIN.OPTIM.TOTAL_STEPS == 170
    assert cfg.TRAIN.LOSS_CLIP_VALUE == 10.0
