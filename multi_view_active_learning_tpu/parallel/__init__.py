"""Device mesh + sharding helpers.

The reference scales with one process per GPU, DDP gradient all-reduce, and
DistributedSampler (reference: workflow.py:125-139, 239-266; SURVEY.md §2.6).
The TPU-native equivalent is a single-controller ``Mesh(('data', 'view'))``:

  * 'data'  — shards frames (the DDP/DistributedSampler axis),
  * 'view'  — shards camera views within a frame (the reference's implicit
    scaling dimension, SURVEY.md §5 "long-context": V = 8..32 views).

Everything downstream is plain ``jax.jit``: batches carry NamedShardings,
params are replicated, and GSPMD inserts the psum for gradients and the
small [B, V, K, 2] keypoint all-gather the triangulation contraction needs —
the collectives ride ICI without any NCCL-style hand-rolled communication.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
VIEW_AXIS = "view"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up: call once at program start on multi-slice /
    multi-host deployments.  With no arguments, jax.distributed.initialize
    discovers the coordinator from the TPU environment; single-host runs
    (and the CPU test mesh) skip it.  Explicit arguments force a rendezvous
    at `coordinator_address` (process_id 0 hosts the coordinator) — used by
    the 2-process CPU smoke test and by non-TPU launchers.  Replaces the
    reference's file-based NCCL rendezvous (reference: workflow.py:228-230)
    — no rendezvous files, no per-experiment tempfile plumbing."""
    import os

    if jax.distributed.is_initialized():
        return True
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False


def process_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous every process at `name` via the distributed KV store —
    host-side only, no device collectives, so it is safe around rank-0
    critical sections (e.g. checkpoint writes) where a device collective
    from one process would mismatch the others' programs.  `name` must be
    unique per use (KV barriers are one-shot).  No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


_BROADCAST_COUNTS: dict = {}


def broadcast_string(key: str, value: str, timeout_ms: int = 600_000) -> str:
    """Process 0 publishes `value` under `key` in the distributed KV
    store; every process returns process 0's value.  Used for host-side
    run metadata that must agree across processes (e.g. the timestamped
    EXPR_NAME every artifact path hangs off).  Single-process: identity.

    KV keys are write-once (a second key_value_set of the same key fails)
    and late readers would otherwise be served a previous call's value, so
    the wire key is suffixed with a per-key invocation counter — identical
    across processes as long as every process reaches each broadcast site
    the same number of times (the multi-controller SPMD contract this
    whole module assumes).  A second workflow.main() in one distributed
    session therefore gets a fresh stamp instead of a crash or run 1's."""
    if jax.process_count() == 1:
        return value
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return value
    n = _BROADCAST_COUNTS.get(key, 0)
    _BROADCAST_COUNTS[key] = n + 1
    wire_key = "%s/%d" % (key, n)
    if jax.process_index() == 0:
        client.key_value_set(wire_key, value)
        return value
    return client.blocking_key_value_get(wire_key, timeout_ms)


def make_mesh(
    data_axis: int = -1, view_axis: int = 1, devices=None
) -> Mesh:
    """Build the ('data', 'view') mesh.  data_axis == -1 infers it from the
    device count (all devices not used by 'view')."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if view_axis < 1 or n % view_axis != 0:
        raise ValueError(
            "view_axis (%d) must divide the device count (%d)" % (view_axis, n)
        )
    if data_axis == -1:
        data_axis = n // view_axis
    if data_axis * view_axis != n:
        raise ValueError(
            "mesh %dx%d does not match %d devices" % (data_axis, view_axis, n)
        )
    arr = np.asarray(devices).reshape(data_axis, view_axis)
    return Mesh(arr, (DATA_AXIS, VIEW_AXIS))


def mesh_from_config(cfg) -> Mesh:
    return make_mesh(cfg.TPU.DATA_AXIS, cfg.TPU.VIEW_AXIS)


def batch_sharding(mesh: Mesh, ndim: int, view_dim: Optional[int] = 1) -> NamedSharding:
    """[B, V, ...] arrays: B over 'data', V over 'view' (when view_dim is not
    None), rest replicated."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if view_dim is not None and ndim > view_dim:
        spec[view_dim] = VIEW_AXIS
    return NamedSharding(mesh, P(*spec))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """[B, ...] arrays: B over 'data' only."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, view_keys=()) -> dict:
    """device_put a host batch dict with [B, V, ...] / [B, ...] shardings.

    view_keys: keys whose dim 1 is the camera-view axis."""
    out = {}
    for key, value in batch.items():
        if not hasattr(value, "ndim"):
            out[key] = value
            continue
        if key in view_keys:
            sh = batch_sharding(mesh, value.ndim, view_dim=1)
        else:
            sh = data_sharding(mesh, value.ndim)
        out[key] = jax.device_put(value, sh)
    return out


def replicate_tree(mesh: Mesh, tree):
    """Host tree -> fully replicated device arrays over `mesh`.

    Multi-process, jax.device_put with a non-addressable replicated
    sharding routes through a multihost allgather — a gloo/ICI collective
    with a hard rendezvous deadline, paid per leaf, exactly when processes
    are maximally skewed (model-init and checkpoint-restore happen right
    after bring-up, behind minutes of per-process compiles).  But the
    caller's contract here is that the HOST values are already identical
    on every process (deterministic PRNG init, shared checkpoint reads,
    KV-broadcast run names), so each process can just place its own local
    shards: make_array_from_callback with a replicated sharding touches no
    collective at all."""
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated(mesh))
    sharding = replicated(mesh)

    def _leaf(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map(_leaf, tree)
