"""Multi-host helpers (single-process form on the 8-device virtual mesh)."""

import numpy as np
import jax

from asltpu.dist.mesh import make_mesh
from asltpu.dist.multihost import (
    assemble_global_batch,
    init_distributed,
    local_batch_size,
)


def test_init_distributed_single_process_noop():
    assert init_distributed() == 0
    assert jax.process_count() == 1


def test_local_batch_size_single_process():
    assert local_batch_size(32) == 32


def test_assemble_global_batch_shards_over_mesh():
    mesh = make_mesh()
    batch = {
        "frames": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "labels": np.arange(8, dtype=np.int32),
    }
    global_batch = assemble_global_batch(mesh, batch)
    assert global_batch["frames"].shape == (8, 3)
    # Sharded over the 8-device data axis: one row per device.
    assert len(global_batch["frames"].addressable_shards) == 8
    np.testing.assert_array_equal(
        np.asarray(global_batch["frames"]), batch["frames"]
    )
    # Usable inside jit with the expected values.
    s = jax.jit(lambda b: b["frames"].sum() + b["labels"].sum())(global_batch)
    assert float(s) == batch["frames"].sum() + batch["labels"].sum()
