"""Shared utilities: logging and small host-side helpers.

Reference equivalent: utils/__init__.py:15-84 (colorlog logger with
rank-gated levels and a tqdm bridge).  In the single-controller JAX runtime
there is one process, so rank-gating maps to process_index-gating.
"""

import logging
import sys

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"
_configured = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache through the config API.

    Env vars (JAX_COMPILATION_CACHE_DIR, ...) are read once at jax-import
    time; in environments where jax is pre-imported by a site hook, setting
    them from Python is silently too late.  Routing through
    jax.config.update works at any point before (and even between)
    compilations.  `path` defaults to $JAX_COMPILATION_CACHE_DIR or a
    per-platform /tmp directory.  Safe to call repeatedly."""
    import os

    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        # Derive the default directory from the CONFIGURED platform, never
        # from jax.default_backend(): that call initializes the backend as
        # a side effect, which freezes jax_platforms and would lock callers
        # (e.g. __graft_entry__.dryrun_multichip) out of switching to a
        # virtual CPU mesh afterwards.
        platform = (
            getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS")
            or ""
        ).split(",")[0]
        # The tunneled TPU registers as the "axon" plugin platform.
        is_tpu = platform in ("tpu", "axon")
        path = "/tmp/jax_cache_tpu" if is_tpu else "/tmp/jax_cache"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def get_logger(name: str = "mval_tpu", level: int = logging.INFO) -> logging.Logger:
    """Process-aware logger: non-zero JAX process indices log at WARNING,
    mirroring the reference's rank-gated console levels
    (reference: utils/__init__.py:58-63)."""
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root = logging.getLogger("mval")
        root.addHandler(handler)
        root.setLevel(level)
        root.propagate = False
        _configured = True
    logger = logging.getLogger("mval." + name)
    try:
        import jax
        from jax._src import xla_bridge

        # Only consult the process index when a backend ALREADY exists:
        # jax.process_index() initializes one as a side effect, and this
        # runs at module-import time in contexts that must never touch a
        # backend — e.g. the forked decode workers (native_loader's
        # module logger), where a fork-inherited jax initializing XLA
        # deadlocked intermittently (observed: workers asleep pre-task,
        # whole scoring sweep hung).  Non-zero processes call get_logger
        # again after jax.distributed.initialize via strategy/workflow,
        # so rank-gating still engages where it matters.
        if (
            xla_bridge.backends_are_initialized()
            and jax.process_index() != 0
        ):
            logger.setLevel(logging.WARNING)
    except Exception:  # jax not importable/initialised; keep default level.
        pass
    return logger


class RateLogger:
    """Periodic progress lines for long sweeps — the role the reference
    fills by bridging tqdm into its logger (reference:
    utils/__init__.py:15-33, TqdmToLogger).  A tqdm bar is wrong for
    rank-gated multi-process logs and useless in captured files, so this
    logs at most one line per `interval` seconds:

        scored 1280/8448 frames (15.2%, 212.3 frames/s)

    Call `tick(n)` per item (or batch, with n=items); `close()` is
    deliberately absent — the sweep's own summary line is the final word.
    """

    def __init__(self, logger, verb: str, total: int, unit: str = "frames",
                 interval: float = 15.0):
        import time as _time

        self._logger = logger
        self._verb = verb
        self._total = int(total)
        self._unit = unit
        self._interval = interval
        self._time = _time
        self._t0 = _time.monotonic()
        self._last = self._t0
        self._count = 0

    def tick(self, n: int = 1) -> None:
        self._count += int(n)
        now = self._time.monotonic()
        if now - self._last < self._interval or self._count >= self._total:
            return
        self._last = now
        rate = self._count / max(now - self._t0, 1e-9)
        pct = 100.0 * self._count / max(self._total, 1)
        self._logger.info(
            "%s %d/%d %s (%.1f%%, %.1f %s/s)"
            % (self._verb, self._count, self._total, self._unit, pct, rate,
               self._unit)
        )
