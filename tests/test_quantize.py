"""Int8 quantized scoring path (models/quantize.py, TPU.INT8_SCORING)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.models.pose_resnet import PoseResNet
from multi_view_active_learning_tpu.models.quantize import (
    quantized_pose_resnet_forward,
)


@pytest.mark.parametrize("layers", [18, 50])
def test_quantized_forward_close_to_float(layers):
    """Untrained random weights are the quantization worst case (no
    learned structure); the int8 forward must still track the float one
    closely enough that decode ranks survive."""
    model = PoseResNet(num_joints=7, num_layers=layers, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(
        quantized_pose_resnet_forward(
            variables["params"], variables["batch_stats"], x, layers
        )
    )
    assert got.shape == ref.shape
    a, b = ref.ravel(), got.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos
    # Per-map argmax decode agreement: the quantity AL scoring consumes.
    B, h, w, K = ref.shape
    ref_pk = ref.reshape(B, h * w, K).argmax(1)
    got_pk = got.reshape(B, h * w, K).argmax(1)
    agree = float((ref_pk == got_pk).mean())
    assert agree > 0.8, agree


@pytest.mark.heavy
def test_int8_engine_scoring_preserves_ranking():
    """Engine-level: score_step with TPU.INT8_SCORING ranks frames like
    the float path on the controlled-corruption problem (the selection
    contract, not bitwise heatmaps)."""
    from multi_view_active_learning_tpu.engine import Engine
    from multi_view_active_learning_tpu.ops import triangulate

    def _cfg(int8):
        cfg = get_default_configs()
        cfg.DATA.NUM_JOINTS = 4
        cfg.DATA.INPUT_WIDTH = 32
        cfg.DATA.INPUT_HEIGHT = 32
        cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.INT8_SCORING = int8
        return cfg

    B, V, K = 6, 4, 4
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, size=(B, V, 32, 32, 3)).astype(np.uint8)
    )
    proj = jnp.asarray(
        np.tile(
            np.array(
                [[300.0, 0, 16, 10], [0, 300.0, 16, 10], [0, 0, 1, 300.0]],
                np.float32,
            ),
            (B, V, 1, 1),
        )
    )
    valid = jnp.ones((B, K), bool)
    gt = jnp.asarray(rng.normal(size=(B, K, 3)).astype(np.float32))
    pairs = jnp.asarray(triangulate.all_view_pairs(V))
    key = jax.random.PRNGKey(3)

    outs = {}
    state = None
    for int8 in (False, True):
        engine = Engine(_cfg(int8))
        if state is None:
            state = engine.init_state(
                jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3)
            )
        outs[int8] = jax.device_get(
            engine.score_step(
                state.params, state.batch_stats, images, proj, valid,
                pairs, gt, key, al_strategy="TRIANGULATION",
            )
        )
    f32, i8 = outs[False], outs[True]
    assert np.isfinite(i8["al_metric"]).all()
    # Triangulated poses land in the same place (untrained-net decode can
    # move borderline peaks; bulk agreement is the requirement).
    d = np.linalg.norm(f32["keypoints_3d"] - i8["keypoints_3d"], axis=-1)
    assert np.median(d) < 2.0, d


def test_static_calibrated_scales_match_dynamic():
    """collect_scales -> act_scales round trip: the static-scale forward
    (the fast path the scoring sweep uses) must match the dynamic-scale
    forward exactly on the calibration batch, and stay close on other
    batches drawn from the same distribution."""
    model = PoseResNet(num_joints=5, num_layers=18, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x_cal = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    x_new = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x_cal, train=False)
    p, s = variables["params"], variables["batch_stats"]

    dyn_cal, scales = quantized_pose_resnet_forward(
        p, s, x_cal, 18, collect_scales=True
    )
    assert len(scales) > 8  # stem + every block conv recorded
    stat_cal = quantized_pose_resnet_forward(p, s, x_cal, 18, act_scales=scales)
    np.testing.assert_allclose(
        np.asarray(stat_cal), np.asarray(dyn_cal), rtol=1e-5, atol=1e-7
    )

    ref_new = np.asarray(model.apply(variables, x_new, train=False))
    stat_new = np.asarray(
        quantized_pose_resnet_forward(p, s, x_new, 18, act_scales=scales)
    )
    a, b = ref_new.ravel(), stat_new.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.98, cos


def test_quantized_hrnet_forward_close_to_float():
    from multi_view_active_learning_tpu.models.hrnet import (
        PoseHighResolutionNet,
    )
    from multi_view_active_learning_tpu.models.quantize import (
        quantized_hrnet_forward,
    )

    model = PoseHighResolutionNet(num_joints=7, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    got, scales = quantized_hrnet_forward(
        variables["params"], variables["batch_stats"], x,
        model.stage2, model.stage3, model.stage4, model.final_conv_kernel,
        collect_scales=True,
    )
    got = np.asarray(got)
    assert got.shape == ref.shape
    a, b = ref.ravel(), got.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos
    # Static table reproduces the dynamic path on the calibration batch.
    stat = np.asarray(
        quantized_hrnet_forward(
            variables["params"], variables["batch_stats"], x,
            model.stage2, model.stage3, model.stage4,
            model.final_conv_kernel, act_scales=scales,
        )
    )
    np.testing.assert_allclose(stat, got, rtol=1e-5, atol=1e-7)


@pytest.mark.heavy
def test_int8_evaluation_path(tmp_path):
    """_evaluate_all with TPU.INT8_EVAL: eval-loop calibration wiring
    (strategy.py) produces finite MKPE/PCK close to the float path.  Eval
    defaults to float regardless of the INT8_SCORING default."""
    from multi_view_active_learning_tpu.data import build_dataset
    from multi_view_active_learning_tpu.data.synthetic import (
        generate_panoptic_tree,
    )
    from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy

    tree = generate_panoptic_tree(
        str(tmp_path / "tree"), num_train_frames=2, num_val_frames=4,
        num_joints=19, num_cameras=4,
    )
    results = {}
    state = None
    for int8 in (False, True):
        cfg = get_default_configs()
        cfg.DATA.TYPE = "synthetic"
        cfg.DATA.SYNTHETIC_ROOT = tree
        cfg.DATA.NUM_JOINTS = 19
        cfg.DATA.INPUT_WIDTH = 64
        cfg.DATA.INPUT_HEIGHT = 64
        cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.INT8_EVAL = int8
        cfg.LOG_DIR = str(tmp_path / "logs")
        strategy = ActiveLearningStrategy(cfg)
        val = build_dataset(cfg, "val")
        val.label_all()
        val.resample_frames(-1, rng=np.random.default_rng(0))
        if state is None:
            state = strategy.new_state()
        loader = strategy._get_loader(val, 2, num_workers=0)
        results[int8] = strategy._evaluate_all(-1, state, loader)
    f32, i8 = results[False], results[True]
    assert np.isfinite(i8["mkpe"])
    # Untrained-net triangulations are noise-driven; the two paths must
    # stay in the same regime, not bitwise equal.
    assert abs(i8["mkpe"] - f32["mkpe"]) / max(f32["mkpe"], 1e-6) < 0.5, (
        f32["mkpe"], i8["mkpe"],
    )


def test_int8_default_gated_per_model_family():
    """TPU.INT8_SCORING defaults on only where int8 measures FASTER:
    PoseResNet (MXU-peak-bound).  HRNet's small-channel exchange units are
    tiling-bound and int8 measured a net loss (133-141 vs 145 fps,
    BENCH_NOTES round 3), so HRNet needs the TPU.INT8_SCORING_HRNET
    opt-in."""
    from multi_view_active_learning_tpu.engine import Engine

    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    assert cfg.TPU.INT8_SCORING  # framework default
    assert Engine(cfg).use_int8  # PoseResNet: on

    cfg_hr = get_default_configs()
    cfg_hr.DATA.NUM_JOINTS = 4
    cfg_hr.POSE_ESTIMATOR.TYPE = "HRNET"
    assert not Engine(cfg_hr).use_int8  # HRNet: off by default (measured)
    cfg_hr.TPU.INT8_SCORING_HRNET = True
    assert Engine(cfg_hr).use_int8  # explicit opt-in still works
    cfg_hr.TPU.INT8_SCORING = False
    assert not Engine(cfg_hr).use_int8  # master switch still wins


def test_int8_default_gated_per_strategy():
    """TPU.INT8_SCORING applies only to strategies with MEASURED selection
    parity (tools/validate_learning.py --int8_compare, BENCH_NOTES round
    4): MPE rank_corr 0.45 and BSB 0.79 on a trained checkpoint — they
    rank raw heatmap values, which int8 requant perturbs — so they must
    score float even under the default.  TPU.INT8_SCORING_FORCE is the
    explicit escape hatch (and the evidence harness's raw-measurement
    knob)."""
    from multi_view_active_learning_tpu.engine import Engine

    def engine(strategy, force=False):
        cfg = get_default_configs()
        cfg.DATA.NUM_JOINTS = 4
        cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
        cfg.AL.STRATEGY = strategy
        cfg.TPU.INT8_SCORING_FORCE = force
        return Engine(cfg)

    # Evidence-backed safe set stays int8 under the default.
    for strategy in ("TRIANGULATION", "HP", "CORESET", "RANDOM"):
        assert engine(strategy).use_int8, strategy
        assert strategy in Engine.INT8_SAFE_STRATEGIES
    # Measured-unsafe strategies score float...
    for strategy in ("MPE", "BSB"):
        assert not engine(strategy).use_int8, strategy
        assert strategy not in Engine.INT8_SAFE_STRATEGIES
        # ...unless the user forces the bypass explicitly.
        assert engine(strategy, force=True).use_int8, strategy

    # CORESET + EMBEDDING features runs the float features-forward in
    # score_step regardless, so use_int8 must report False (else the
    # sweep pays a never-used int8 calibration compile).
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.AL.STRATEGY = "CORESET"
    cfg.AL.CORESET_FEATURES = "EMBEDDING"
    assert not Engine(cfg).use_int8
    # ...but INT8_SCORING_FORCE overrides every gate — it is how
    # non-scoring surfaces (tools/export_serving.py --int8-calib) request
    # the int8 backbone regardless of the config's AL strategy.
    cfg.TPU.INT8_SCORING_FORCE = True
    assert Engine(cfg).use_int8
    cfg.TPU.INT8_SCORING_FORCE = False
    cfg.AL.CORESET_FEATURES = "POSE"
    assert Engine(cfg).use_int8


def test_float_tail_stages_reduce_quant_error():
    """Mixed-precision float tail (quantized_pose_resnet_forward
    float_tail_stages / TPU.INT8_FLOAT_TAIL_STAGES): the forward stays
    exact in structure, and moving trailing stages to bf16 moves the
    output monotonically toward the float forward — the mechanism behind
    the MPE/BSB mixed gate (Engine.INT8_MIXED_TAIL)."""
    model = PoseResNet(num_joints=5, num_layers=18, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))

    errs = {}
    for tail in (0, 1, 4):
        got = np.asarray(
            quantized_pose_resnet_forward(
                variables["params"], variables["batch_stats"], x, 18,
                float_tail_stages=tail,
            )
        )
        assert got.shape == ref.shape and np.isfinite(got).all()
        errs[tail] = float(
            np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        )
    # More float stages -> closer to the float forward.
    assert errs[1] < errs[0], errs
    assert errs[4] < errs[1], errs
    # With every residual stage float, well under half the full-int8
    # error remains (what's left is the still-quantized stem plus the
    # bf16 compute floor — tail=4 measures ~0.40x on both CPU and TPU).
    assert errs[4] < 0.5 * errs[0], errs


def test_engine_mixed_gate_wiring():
    """Engine.use_int8 honors INT8_MIXED_TAIL and int8_float_tail raises
    the config knob to the measured-safe minimum (and not under FORCE)."""
    from multi_view_active_learning_tpu.engine import Engine

    cfg = get_default_configs()
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.AL.STRATEGY = "MPE"
    engine = Engine(cfg)
    if "MPE" in Engine.INT8_MIXED_TAIL:
        assert engine.use_int8
        assert engine.int8_float_tail >= Engine.INT8_MIXED_TAIL["MPE"]
    else:
        assert not engine.use_int8  # MPE stays float without evidence
    # FORCE measures RAW configs: no automatic tail raise.
    cfg2 = get_default_configs()
    cfg2.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg2.AL.STRATEGY = "MPE"
    cfg2.TPU.INT8_SCORING_FORCE = True
    engine2 = Engine(cfg2)
    assert engine2.use_int8
    assert engine2.int8_float_tail == 0
    cfg2.TPU.INT8_FLOAT_TAIL_STAGES = 1
    assert Engine(cfg2).int8_float_tail == 1


def test_int8_space_to_depth_stem_exact():
    """The int8 stem accepts space-to-depth'd inputs and computes the
    same function: quantization commutes with the SpaceToDepthStem kernel
    remap (a weight permutation + zero padding), and the s32 accumulator
    sums the same integer products, so outputs match the plain int8 stem
    to float rounding."""
    from multi_view_active_learning_tpu.models.pose_resnet import (
        space_to_depth,
    )

    model = PoseResNet(num_joints=5, num_layers=18, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    plain = np.asarray(
        quantized_pose_resnet_forward(
            variables["params"], variables["batch_stats"], x, 18
        )
    )
    s2d = np.asarray(
        quantized_pose_resnet_forward(
            variables["params"], variables["batch_stats"],
            space_to_depth(x), 18,
        )
    )
    assert s2d.shape == plain.shape
    np.testing.assert_allclose(s2d, plain, rtol=1e-4, atol=1e-4)
