"""Mesh construction + sharding helpers.

The reference's only parallelism is Lightning's ``gpus: -1`` flag
(configs/config.yaml:59, SURVEY.md §2.11) — no DDP, no collectives in repo
code.  Here data parallelism is first-class and TPU-native: a 1-D
``Mesh(('data',))`` over all devices, batch inputs sharded on 'data', params
and optimizer state replicated.  The train step is a plain ``jax.jit`` with
sharding annotations, so XLA emits the gradient all-reduce (and global
BatchNorm reductions) as ICI collectives — the pjit/GSPMD recipe, not a
hand-written NCCL translation.

The mesh carries a second, size-1 'model' axis so later tensor-parallel
sharding of wide conv channels is an annotation change, not a redesign
(SURVEY.md §2.11 TP row).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a ('data', 'model') mesh; default all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading dim = global batch) onto
    the mesh, sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
