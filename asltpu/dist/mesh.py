"""Mesh construction and sharding rules.

Design (SURVEY.md §2.4): data-parallel over a ``data`` axis is the only
parallelism these workloads need (models ≤ I3D fit one chip with room to
spare; sequences are ≤64 tokens). The mesh keeps a trailing ``model`` axis
of size 1 so tensor parallelism is addable without re-plumbing callers —
recorded as out of scope for v1, not built.

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
) -> Mesh:
    """Build a (data, model=1) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    arr = np.asarray(devices).reshape(len(devices), 1)
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
