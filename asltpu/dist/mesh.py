"""Mesh construction and sharding rules.

Design (SURVEY.md §2.4): data-parallel over a ``data`` axis is the only
parallelism these workloads NEED (models ≤ I3D fit one chip with room to
spare; sequences are ≤64 tokens). The mesh keeps a trailing ``model``
axis — size 1 by default; round 5 added a working tensor-parallel path
over it for the transformer head (``asltpu.dist.tp``: Megatron placements
as pure GSPMD annotations, equivalence-tested), so C17 is exercised, not
just reserved.

Gradient reduction: params are replicated, batches sharded over ``data``;
under jit, XLA GSPMD lowers the gradient sum to ``psum`` over ICI — no
hand-written collectives needed on this path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel`` sizes the trailing ``model`` axis (default 1 =
    pure data parallelism). With >1, pair it with
    :func:`asltpu.dist.tp.tp_shard_variables` to run the transformer head
    tensor-parallel; device count must divide evenly."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(devices) % model_parallel:
        raise ValueError(
            f"{len(devices)} devices not divisible by "
            f"model_parallel={model_parallel}"
        )
    arr = np.asarray(devices).reshape(-1, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over ``data``; everything else local."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
