"""Multi-host scaling (C16 extension): process bring-up + cross-host batch
assembly.

Single-slice multi-chip needs nothing beyond ``make_mesh`` (XLA collectives
ride ICI). Across hosts/slices, JAX needs (a) a coordinator handshake at
startup and (b) per-process data feeding where each host contributes its
local shard of the global batch — DCN only carries gradient collectives,
never input data.

This host has one process/one chip, so these paths are exercised in
single-process form (``assemble_global_batch`` degenerates to
``shard_batch``) and documented for real pods; ``dryrun_multichip``
validates the sharded train step itself on a virtual mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from asltpu.dist.mesh import batch_sharding, make_mesh  # noqa: F401


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-process JAX (no-op when already initialized or
    single-process with no coordinator configured).

    On TPU pods the arguments default from the environment
    (``jax.distributed.initialize()`` with no args); pass them explicitly
    for manual bring-up. Returns the process index.
    """
    if jax.process_count() > 1:
        return jax.process_index()
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        # else: single process, nothing to do — calling initialize() without
        # env configuration would block waiting for a coordinator.
    except RuntimeError:
        pass  # already initialized
    return jax.process_index()


def assemble_global_batch(mesh: jax.sharding.Mesh, local_batch: Any):
    """Build a global batch-sharded array from each process's LOCAL data.

    ``local_batch`` is this host's shard (leading axis =
    global_batch / process_count). Uses
    ``jax.make_array_from_process_local_data`` so no host ever materializes
    the full global batch; single-process this equals ``shard_batch``.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )


def local_batch_size(global_batch: int) -> int:
    """Per-process share of a global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}"
        )
    return global_batch // n
