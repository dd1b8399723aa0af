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
    """Initialize multi-process JAX and return the process index.

    - Explicit args → manual bring-up with those args.
    - No args on a TPU pod (cluster env detected: JAX_COORDINATOR_ADDRESS /
      COORDINATOR_ADDRESS / CLOUD_TPU_TASK_ID present) →
      ``jax.distributed.initialize()`` auto-configuration.
    - No args, no cluster env → single-process, returns 0.

    Bring-up failures PROPAGATE: silently continuing single-process on a
    pod would train independent replicas with wrong gradients.
    """
    import os

    # Idempotency check WITHOUT touching the backend: jax.process_count()
    # would initialize XLA, after which jax.distributed.initialize() raises
    # ("must be called before any JAX calls...") — the bring-up below would
    # be unreachable on every pod.
    if jax.distributed.is_initialized():
        return jax.process_index()
    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "CLOUD_TPU_TASK_ID")
    ):
        jax.distributed.initialize()
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
