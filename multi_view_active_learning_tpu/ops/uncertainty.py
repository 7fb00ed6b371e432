"""Active-learning uncertainty metrics, batched on device.

Replaces the reference's per-(view, joint) CPU loops over
skimage.peak_local_max / torch softmax (reference: strategy.py:1149-1215)
with fixed-shape tensor programs over [B, V, K, h, w] heatmaps:

  * MPE  — multi-peak entropy: local peaks -> softmax over peak values ->
    entropy (reference: strategy.py:1160-1176).
  * HP   — highest probability: 1 - max(row-softmax(heatmap))
    (reference: strategy.py:1178-1193).
  * BSB  — best-vs-second-best: |p0 - p1| of the two highest local peaks of
    the row-softmaxed heatmap (reference: strategy.py:1195-1215).

Peak finding mirrors skimage.feature.peak_local_max(min_distance=2) at
version 0.19.3 — the last generation supporting the `indices=True` kwarg
the reference passes (strategy.py:1168-1170), pinned by golden tests
against the line-faithful port in tests/oracle_ports.py:
a point is a peak iff it equals the (2d+1)x(2d+1) max-filter output,
exceeds the image minimum, and is at least `min_distance` away from the
border (skimage's default exclude_border=True); then skimage's
`ensure_spacing` pass greedily thins candidates closer than
`min_distance` in Chebyshev distance, keeping the earlier point in
descending-intensity stable order.  Because any two candidates within
each other's max-filter window are provably equal-valued, that order
reduces to row-major among plateau ties — implemented here as a
fixed-shape fixpoint iteration (`_thin_plateaus`).

Softmax quirk replicated: the reference calls torch.nn.functional.softmax
on a 2D heatmap without `dim`, which resolves to dim=1 — softmax over each
ROW independently, not over the whole map.  HP and BSB inherit that
behavior here (softmax over the trailing `w` axis) for score parity.

AVG/STD aggregation over valid (view, joint) pairs matches
AL.MPE_CONFIG / HP_CONFIG / BSB_CONFIG; STD is the population std (numpy
default) as in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """x[..., i, j] -> x[..., i + dy, j + dx], `fill` outside bounds."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(-dy, 0), max(dy, 0)),
        (max(-dx, 0), max(dx, 0)),
    ]
    padded = jnp.pad(x, pad, constant_values=fill)
    start = [0] * (x.ndim - 2) + [max(dy, 0), max(dx, 0)]
    return jax.lax.dynamic_slice(padded, start, x.shape[:-2] + (h, w))


def _thin_plateaus(cand: jnp.ndarray, min_distance: int) -> jnp.ndarray:
    """skimage 0.19.3 `ensure_spacing` over a candidate-peak mask.

    skimage accepts candidates in descending-intensity (stable) order and
    rejects any later candidate with Chebyshev distance < min_distance
    from an accepted one.  Two candidates that close lie inside each
    other's (2*min_distance+1)^2 max-filter window, so they are
    equal-valued; ordering among them is therefore row-major (np.nonzero
    order under a stable sort).  Greedy semantics: a candidate is
    ACCEPTED once every row-major-earlier candidate in its rejection
    neighborhood is REJECTED, and REJECTED once any of them is ACCEPTED —
    a rejected point never rejects others.  Iterate to fixpoint (each
    pass decides at least the earliest undecided point of every
    dependency chain, so the loop terminates).
    """
    earlier = [
        (dy, dx)
        for dy in range(-(min_distance - 1), min_distance)
        for dx in range(-(min_distance - 1), min_distance)
        if (dy, dx) != (0, 0) and (dy < 0 or (dy == 0 and dx < 0))
    ]
    if not earlier:
        return cand

    def body(state):
        acc, rej, _ = state
        unrejected_earlier = jnp.zeros_like(cand)
        accepted_earlier = jnp.zeros_like(cand)
        for dy, dx in earlier:
            unrejected_earlier |= _shift2d(cand & ~rej, dy, dx, False)
            accepted_earlier |= _shift2d(acc, dy, dx, False)
        new_acc = acc | (cand & ~rej & ~unrejected_earlier)
        new_rej = rej | (cand & accepted_earlier)
        changed = jnp.any(new_acc != acc) | jnp.any(new_rej != rej)
        return new_acc, new_rej, changed

    def cond(state):
        return state[2]

    init = (jnp.zeros_like(cand), jnp.zeros_like(cand), jnp.asarray(True))
    acc, _, _ = jax.lax.while_loop(cond, body, init)
    return acc


def local_peak_mask(heatmaps: jnp.ndarray, min_distance: int = 2) -> jnp.ndarray:
    """Boolean mask of local maxima over the trailing (h, w) axes.

    heatmaps: [..., h, w] -> bool [..., h, w].  Matches
    skimage.feature.peak_local_max(min_distance=...) at 0.19.3 exactly,
    including plateau thinning (golden-tested against
    tests/oracle_ports.peak_local_max).
    """
    size = 2 * min_distance + 1
    ndim = heatmaps.ndim
    window = (1,) * (ndim - 2) + (size, size)
    maxf = jax.lax.reduce_window(
        heatmaps,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=window,
        window_strides=(1,) * ndim,
        padding=[(0, 0)] * (ndim - 2) + [(min_distance, min_distance)] * 2,
    )
    is_peak = (heatmaps == maxf) & (
        heatmaps > jnp.min(heatmaps, axis=(-2, -1), keepdims=True)
    )
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    interior = (
        ((ys >= min_distance) & (ys < h - min_distance))[:, None]
        & ((xs >= min_distance) & (xs < w - min_distance))[None, :]
    )
    return _thin_plateaus(is_peak & interior, min_distance)


def _row_softmax(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """torch F.softmax(x) on a 2D tensor without dim == softmax over rows."""
    return jax.nn.softmax(heatmaps, axis=-1)


def _masked_entropy(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Entropy of softmax over `values` restricted to `mask`, trailing 2 axes.

    values/mask: [..., h, w] -> [...].
    """
    flat_v = values.reshape(values.shape[:-2] + (-1,))
    flat_m = mask.reshape(mask.shape[:-2] + (-1,))
    logits = jnp.where(flat_m, flat_v, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    logp = jnp.where(flat_m & (p > 0), jnp.log(jnp.maximum(p, 1e-38)), 0.0)
    return -jnp.sum(p * logp, axis=-1)


def _aggregate(per_vk: jnp.ndarray, valid: jnp.ndarray, aggregate: str) -> jnp.ndarray:
    """AVG or STD over valid (view, joint) entries.

    per_vk: [B, V, K]; valid: [B, K] -> [B].
    """
    mask = jnp.broadcast_to(valid[:, None, :], per_vk.shape).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
    mean = jnp.sum(per_vk * mask, axis=(1, 2)) / n
    if aggregate == "AVG":
        return mean
    if aggregate == "STD":
        var = jnp.sum(jnp.square(per_vk - mean[:, None, None]) * mask, axis=(1, 2)) / n
        return jnp.sqrt(var)
    raise ValueError("aggregate must be AVG or STD, got %s" % aggregate)


@partial(jax.jit, static_argnames=("aggregate", "min_distance"))
def multi_peak_entropy(
    heatmaps: jnp.ndarray,
    valid_joints: jnp.ndarray,
    aggregate: str = "AVG",
    min_distance: int = 2,
) -> jnp.ndarray:
    """MPE scores: heatmaps [B, V, h, w, K], valid [B, K] -> [B]."""
    hm = jnp.moveaxis(heatmaps, -1, 2)  # [B, V, K, h, w]
    peaks = local_peak_mask(hm, min_distance)
    ent = _masked_entropy(hm, peaks)  # [B, V, K]
    return _aggregate(ent, valid_joints, aggregate)


@partial(jax.jit, static_argnames=("aggregate",))
def highest_probability(
    heatmaps: jnp.ndarray,
    valid_joints: jnp.ndarray,
    aggregate: str = "AVG",
) -> jnp.ndarray:
    """HP scores: 1 - max of the row-softmaxed heatmap, aggregated."""
    hm = jnp.moveaxis(heatmaps, -1, 2)  # [B, V, K, h, w]
    probs = _row_softmax(hm)
    hp = 1.0 - jnp.max(probs, axis=(-2, -1))  # [B, V, K]
    return _aggregate(hp, valid_joints, aggregate)


@partial(jax.jit, static_argnames=("aggregate", "min_distance"))
def best_vs_second_best(
    heatmaps: jnp.ndarray,
    valid_joints: jnp.ndarray,
    aggregate: str = "AVG",
    min_distance: int = 2,
) -> jnp.ndarray:
    """BSB scores: |p0 - p1| between the two strongest local peaks of the
    row-softmaxed heatmap, aggregated over valid (view, joint)."""
    hm = jnp.moveaxis(heatmaps, -1, 2)  # [B, V, K, h, w]
    probs = _row_softmax(hm)
    peaks = local_peak_mask(probs, min_distance)
    flat_p = probs.reshape(probs.shape[:-2] + (-1,))
    flat_m = peaks.reshape(peaks.shape[:-2] + (-1,))
    masked = jnp.where(flat_m, flat_p, _NEG_INF)
    top2 = jax.lax.top_k(masked, 2)[0]  # [B, V, K, 2]
    # Degenerate single-peak maps (the reference would IndexError there):
    # treat the missing second peak as probability 0.
    second = jnp.where(top2[..., 1] <= _NEG_INF / 2, 0.0, top2[..., 1])
    first = jnp.where(top2[..., 0] <= _NEG_INF / 2, 0.0, top2[..., 0])
    bsb = jnp.abs(first - second)
    return _aggregate(bsb, valid_joints, aggregate)
