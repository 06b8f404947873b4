"""Multi-host (multi-process) readiness: jax.distributed + per-host data.

The reference has no distributed code at all (SURVEY.md §2.11 — Lightning's
``gpus: -1`` flag is its only parallelism).  The TPU-native equivalent for
multi-host slices is:

1. ``jax.distributed.initialize`` once per process (coordinator address +
   process id from the environment, or TPU-pod auto-detection),
2. every process feeds its *local* shard of the global batch
   (``Loader(num_shards=process_count, shard_id=process_index)``),
3. ``jax.make_array_from_process_local_data`` assembles the global sharded
   array; XLA emits ICI/DCN collectives from the sharding annotations.

Single-process behavior is identical to before: ``maybe_initialize`` is a
no-op without coordinator env vars, process_count() == 1, and
``host_local_batch`` degrades to a plain ``device_put``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when configured; no-op otherwise.

    Configuration sources, in precedence order: explicit args, the env vars
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    (also honoring jax's own ``COORDINATOR_ADDRESS`` spelling), or — with no
    configuration at all — returns False and leaves the process single-host.
    On TPU pods, calling ``jax.distributed.initialize()`` with no args
    auto-detects from the TPU metadata; we only do that when
    ``JAX_AUTO_DISTRIBUTED=1`` so local/dev runs never try to reach a
    coordinator.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    addr = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID")

    if addr and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
        _INITIALIZED = True
        return True
    if os.environ.get("JAX_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()     # TPU-pod metadata auto-detection
        _INITIALIZED = True
        return True
    return False


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def data_shard() -> tuple:
    """(num_shards, shard_id) for per-host input sharding — the
    DistributedSampler analogue, keyed by process."""
    return jax.process_count(), jax.process_index()


def host_local_batch(mesh, array, spec: P = P("data")):
    """Place one host's *local* slice of a globally-sharded batch array.

    Multi-process: ``array`` is this process's shard (global_batch /
    process_count rows); assembled into one global jax.Array via
    ``make_array_from_process_local_data``.  Single-process: plain sharded
    device_put of the full array.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, array)
    return jax.device_put(array, sharding)
