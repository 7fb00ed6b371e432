"""Test configuration: force an 8-device virtual CPU mesh so sharding and
collective paths are exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# Must be set before jax is imported anywhere.  Override (not setdefault):
# the driver environment exports JAX_PLATFORMS=axon (the tunneled TPU) and
# tests must run hermetically on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: this box has one CPU core and recompiles
# dominate test time; cached executables make re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# A site hook pre-imports jax at interpreter startup with the driver's
# JAX_PLATFORMS=axon already parsed, so the env overrides above are too late
# for the config defaults — force them through the config API as well (still
# before any backend initializes).  This matters most for the compilation
# cache: without it every pytest process recompiles every train/score step
# from scratch (the cache env vars above are read at jax-import time, which
# the site hook has already passed), and the warm fast suite measures 14
# minutes of XLA compiles instead of ~4 of test logic.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from multi_view_active_learning_tpu.utils import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])
