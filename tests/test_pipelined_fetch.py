"""Unit tests for ActiveLearningStrategy._pipelined_fetch — the bounded
dispatch-ahead pipelining shared by the pool-scoring, 3D/2D-eval, and
cluster sweeps (strategy.py).  Pure host-side: exercised on a stub self so
no Engine/model build is needed."""

import numpy as np

from multi_view_active_learning_tpu.strategy import ActiveLearningStrategy


class _StubStrategy:
    """Duck-typed receiver for the unbound _pipelined_fetch: the helper
    touches only SWEEP_INFLIGHT_WINDOW and _fetch_global."""

    SWEEP_INFLIGHT_WINDOW = ActiveLearningStrategy.SWEEP_INFLIGHT_WINDOW

    def __init__(self):
        self.fetch_calls = []

    def _fetch_global(self, tree):
        self.fetch_calls.append(tree)
        return tree


def _run(n_batches, window=None):
    stub = _StubStrategy()
    if window is not None:
        stub.SWEEP_INFLIGHT_WINDOW = window
    dispatched = []
    inflight_at_yield = []

    def gen():
        for k in range(n_batches):
            dispatched.append(k)
            yield ("meta-%d" % k), {"value": np.full((2,), k)}

    results = []
    for meta, tree in ActiveLearningStrategy._pipelined_fetch(stub, gen()):
        # In-flight batches = dispatched but not yet fetched (this yield
        # included, since _fetch_global just ran for it).
        inflight_at_yield.append(len(dispatched) - len(stub.fetch_calls))
        results.append((meta, tree))
    return stub, results, inflight_at_yield


def test_order_and_meta_passthrough():
    stub, results, _ = _run(7)
    assert [m for m, _ in results] == ["meta-%d" % k for k in range(7)]
    for k, (_, tree) in enumerate(results):
        np.testing.assert_array_equal(tree["value"], np.full((2,), k))
    # Exactly one tree fetch per batch (single device round-trip each).
    assert len(stub.fetch_calls) == 7


def test_inflight_residency_is_bounded():
    window = 3
    _, results, inflight = _run(10, window=window)
    assert len(results) == 10
    # The window is a hard residency bound: dispatched-unfetched batches
    # never exceed it.  After each in-loop fetch, window-1 stay queued; the
    # drain phase only shrinks the queue.
    assert max(inflight) <= window - 1
    assert inflight[0] == window - 1  # first fetch at `window` dispatches


def test_short_sweeps_drain_completely():
    for n in (0, 1, ActiveLearningStrategy.SWEEP_INFLIGHT_WINDOW + 1):
        stub, results, _ = _run(n)
        assert len(results) == n
        assert len(stub.fetch_calls) == n
