"""Engine: LR schedule, train-step skip semantics, loss decrease, cluster
loss step (reference: strategy.py:405-546, 473-484)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_view_active_learning_tpu.config import get_default_configs
from multi_view_active_learning_tpu.engine import Engine, make_lr_schedule


def _cfg(total=10, clip=10.0):
    cfg = get_default_configs()
    cfg.DATA.NUM_JOINTS = 4
    cfg.DATA.INPUT_WIDTH = 32
    cfg.DATA.INPUT_HEIGHT = 32
    cfg.POSE_ESTIMATOR.NUM_LAYERS = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TRAIN.LOSS_CLIP_VALUE = clip
    cfg.TRAIN.OPTIM.TOTAL_STEPS = total
    return cfg


def test_lr_schedule_steplr_semantics():
    cfg = _cfg()
    cfg.TRAIN.OPTIM.LR = 0.001
    cfg.TRAIN.OPTIM.LR_DECAY_STEP_SIZE = 3000
    sched = make_lr_schedule(cfg)
    assert abs(float(sched(0)) - 0.001) < 1e-9
    assert abs(float(sched(2999)) - 0.001) < 1e-9
    assert abs(float(sched(3000)) - 0.0001) < 1e-9
    assert abs(float(sched(6000)) - 0.00001) < 1e-9


def _batch(B=2, V=2, K=4, rng=None):
    rng = rng or np.random.default_rng(0)
    images = rng.normal(size=(B, V, 32, 32, 3)).astype(np.float32)
    gt = rng.random((B, V, 8, 8, K)).astype(np.float32) * 0.1
    pvjv = np.ones((B, V, K), bool)
    fv = np.ones(B, bool)
    return tuple(jnp.asarray(a) for a in (images, gt, pvjv, fv))


def test_train_step_decreases_loss():
    cfg = _cfg()
    cfg.TRAIN.OPTIM.LR = 0.002
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    batch = _batch()
    losses = []
    for _ in range(8):
        state, metrics = engine.train_step(state, *batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert not any(np.isnan(losses))


def test_train_step_skips_on_loss_clip():
    cfg = _cfg(clip=1e-12)  # everything exceeds the clip -> always skip
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    batch = _batch()
    p0 = jax.device_get(state.params)
    state, metrics = engine.train_step(state, *batch)
    assert bool(metrics["skipped"])
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)  # params untouched
    assert int(state.step) == 1  # step still advances


def test_padded_frames_contribute_zero_loss():
    """A padded tail batch must train exactly like the pad-free batch of
    its real rows: zero loss from the padding AND a denominator counting
    only real crops (the reference's loaders never pad with zero-loss
    rows, pose_estimators/loss.py:14-20 divides by the real leading dim)."""
    cfg = _cfg()
    engine = Engine(cfg)
    # train_step donates its state: use two identically-seeded states.
    state_a = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    state_b = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    images, gt, pvjv, _ = _batch()
    # Padding row duplicates the real row: train-mode BatchNorm statistics
    # are then identical between the padded 2-frame batch and the pad-free
    # 1-frame batch (duplicating rows changes neither mean nor variance),
    # isolating the loss normalization under test from BN batch effects.
    images = jnp.concatenate([images[:1], images[:1]])
    gt = jnp.concatenate([gt[:1], gt[:1]])
    fv_half = jnp.asarray(np.array([True, False]))
    _, m_half = engine.train_step(state_a, images, gt, pvjv, fv_half)
    _, m_solo = engine.train_step(
        state_b,
        images[:1],
        gt[:1],
        pvjv[:1],
        jnp.asarray(np.ones(1, bool)),
    )
    # rtol covers f32 reduction-order noise between the two executables
    # (measured ~8e-5); the dilution bug under test was a 2x error.
    np.testing.assert_allclose(
        float(m_half["loss"]), float(m_solo["loss"]), rtol=1e-3
    )


def test_lr_schedule_advances_across_skipped_steps():
    """The LR schedule must advance on skipped steps (the reference calls
    lr_scheduler.step() outside the skip guard, strategy.py:486), while
    Adam's own state rolls back — regression test for the schedule count
    living inside opt_state, where the skip rollback rewound it."""
    cfg = _cfg(clip=1e-12)  # everything exceeds the clip -> always skip
    cfg.TRAIN.OPTIM.LR = 0.001
    cfg.TRAIN.OPTIM.LR_DECAY_STEP_SIZE = 2
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    batch = _batch()
    lrs = []
    for _ in range(4):
        state, metrics = engine.train_step(state, *batch)
        assert bool(metrics["skipped"])
        lrs.append(float(metrics["lr"]))
    # lr applied at (0-based) step k is schedule(k); decay every 2 steps
    # regardless of the 4 consecutive skips.
    np.testing.assert_allclose(lrs, [1e-3, 1e-3, 1e-4, 1e-4], rtol=1e-6)


def test_all_padding_batch_applies_no_update():
    """An all-padding batch (multi-process shard equalization) has zero
    loss and zero gradients — it must be step-skipped, not apply a
    pure-momentum Adam update."""
    cfg = _cfg()
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    images, gt, pvjv, fv = _batch()
    # One real step first so Adam's momentum is non-zero (at init the
    # moments are zero and even a buggy update would be a no-op).
    state, m = engine.train_step(state, images, gt, pvjv, fv)
    assert not bool(m["skipped"])
    p1 = jax.device_get(state.params)
    fv_none = jnp.asarray(np.zeros(2, bool))
    state, m = engine.train_step(state, images, gt, pvjv, fv_none)
    assert bool(m["skipped"])
    p2 = jax.device_get(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
    assert int(state.step) == 2  # step (and hence the LR schedule) advances


def test_loss_step_per_frame():
    cfg = _cfg()
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    images, gt, _, _ = _batch()
    losses = np.asarray(
        engine.loss_step(state.params, state.batch_stats, images, gt)
    )
    assert losses.shape == (2,)
    assert (losses > 0).all()


def test_remat_train_step_matches_no_remat():
    import jax.numpy as jnp

    cfg = _cfg()
    engine_a = Engine(cfg)
    cfg_r = _cfg()
    cfg_r.TPU.REMAT = True
    engine_b = Engine(cfg_r)
    state_a = engine_a.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    state_b = engine_b.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    batch = _batch()
    sa, ma = engine_a.train_step(state_a, *batch)
    sb, mb = engine_b.train_step(state_b, *batch)
    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-6
    for x, y in zip(
        jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sb.params)
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.parametrize("loss_type", ["INTEGRAL", "MSE+INTEGRAL"])
def test_train_step_integral_loss_decreases(loss_type):
    from multi_view_active_learning_tpu.ops import heatmap as hm_ops

    cfg = _cfg()
    cfg.TRAIN.LOSS = loss_type
    cfg.TRAIN.OPTIM.LR = 0.002
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    rng = np.random.default_rng(3)
    B, V, K = 2, 2, 4
    images = jnp.asarray(rng.normal(size=(B, V, 32, 32, 3)).astype(np.float32))
    kp = jnp.asarray(rng.uniform(1, 7, size=(B, V, K, 2)).astype(np.float32))
    gt = jnp.moveaxis(
        hm_ops.render_gaussian_heatmaps(kp, 8, 8, 1.0), 2, -1
    )  # [B, V, 8, 8, K]
    pvjv = jnp.asarray(np.ones((B, V, K), bool))
    fv = jnp.asarray(np.ones(B, bool))
    losses = []
    for _ in range(8):
        state, metrics = engine.train_step(state, images, gt, pvjv, fv)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert not any(np.isnan(losses))


def test_train_step_unknown_loss_raises():
    cfg = _cfg()
    cfg.TRAIN.LOSS = "BOGUS"
    engine = Engine(cfg)
    state = engine.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    with pytest.raises(NotImplementedError):
        engine.train_step(state, *_batch())
