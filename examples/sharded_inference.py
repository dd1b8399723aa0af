"""Data-parallel batched inference over a device mesh (GSPMD).

On a multi-chip TPU slice this runs as-is and XLA shards the batch over
ICI. With no slice available, set a virtual CPU mesh first:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_inference.py

(The test conftest uses the same trick; this image's sitecustomize may pin
the TPU platform, in which case force CPU in-process as below.)
"""

import os
import sys

# Runnable straight from a source checkout (no install needed).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    if os.environ.get("ASLTPU_EXAMPLE_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax

    from asltpu.api import load_model
    from asltpu.dist.mesh import batch_sharding, make_mesh

    model = load_model(
        "mobilenet_gru",
        gru_hidden=16,
        preprocess={
            "num_frames": 4,
            "staging_size": (48, 48),
            "resize_short": 40,
            "crop": 32,
        },
    )
    pp = model.cfg.preprocess
    mesh = make_mesh()  # (data, model=1); see tensor_parallel.py for TP
    n = mesh.devices.size
    print(f"mesh: {n} devices, axes {mesh.axis_names}")

    # Batch sharded over the data axis; params replicated. XLA partitions
    # the whole preprocess→backbone→head program — no per-device code.
    frames = np.random.randint(
        0, 256, size=(2 * n, pp.num_frames, *pp.staged_frame_shape),
        dtype=np.uint8,
    )
    frames = jax.device_put(frames, batch_sharding(mesh))
    fn = model.predict_fn()
    logits = jax.block_until_ready(fn(model.variables, frames))
    print(f"logits {logits.shape} computed across {n} devices; "
          f"per-device batch {2 * n // n}")


if __name__ == "__main__":
    main()
