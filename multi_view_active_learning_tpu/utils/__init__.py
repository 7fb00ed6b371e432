"""Shared utilities: logging and small host-side helpers.

Reference equivalent: utils/__init__.py:15-84 (colorlog logger with
rank-gated levels and a tqdm bridge).  In the single-controller JAX runtime
there is one process, so rank-gating maps to process_index-gating.
"""

import logging
import sys

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"
_configured = False


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

        if jax.process_index() != 0:
            logger.setLevel(logging.WARNING)
    except Exception:  # jax not initialised yet; keep default level.
        pass
    return logger
