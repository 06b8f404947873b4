"""Mesh construction + sharding helpers.

The reference's only parallelism is Lightning's ``gpus: -1`` flag
(configs/config.yaml:59, SURVEY.md §2.11) — no DDP, no collectives in repo
code.  Here data parallelism is first-class and TPU-native: a 1-D
``Mesh(('data',))`` over all devices, batch inputs sharded on 'data', params
and optimizer state replicated.  The train step is a plain ``jax.jit`` with
sharding annotations, so XLA emits the gradient all-reduce (and global
BatchNorm reductions) as ICI collectives — the pjit/GSPMD recipe, not a
hand-written NCCL translation.

The mesh carries a second 'model' axis (size 1 by default) for tensor
parallelism: ``model_parallel_shardings`` splits conv output channels over
it, and ``tests/test_train.py::test_model_axis_tensor_parallel_step`` proves
a full train step on a (data=4, model=2) mesh matches the single-device step
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


def model_parallel_shardings(mesh: Mesh, tree, min_dim: int = 8):
    """Tensor-parallel sharding rule for the 'model' mesh axis.

    Returns a sharding pytree matching ``tree``: every array whose *last*
    dimension is divisible by the 'model' axis size and at least ``min_dim``
    is sharded on that dimension — conv kernels [H, W, I, O] split their
    output channels, and the matching bias / BatchNorm scale/bias/mean/var
    vectors [O] split the same way, so each model-shard holds a contiguous
    slice of every layer's filters.  Everything else (scalars, tiny heads)
    is replicated.  Under jit, XLA/GSPMD propagates the channel sharding
    through the activations and inserts the (reduce-)scatter/all-gather
    collectives — the pjit recipe, no manual comm code.

    With model axis size 1 this degrades to all-replicated, which is why the
    default mesh carries the axis at size 1 (annotation-compatible).
    """
    m = mesh.shape["model"]

    def rule(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[-1] % m == 0 and shape[-1] >= max(
                m, min_dim):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_model_parallel(mesh: Mesh, tree, min_dim: int = 8):
    """device_put ``tree`` according to ``model_parallel_shardings``."""
    shardings = model_parallel_shardings(mesh, tree, min_dim)
    return jax.tree.map(jax.device_put, tree, shardings)
