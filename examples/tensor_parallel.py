"""Tensor parallelism over the mesh's ``model`` axis (asltpu.dist.tp).

The transformer head's attention and MLP weights shard Megatron-style
(column/row pairing) as pure GSPMD annotations — same flax module, no
model rewrite; XLA inserts the ICI collectives. The same placements apply
to TRAINING: on a full TrainState they shard the adamw moments with their
params, and the TP train step walks the replicated trajectory exactly
(tests/unit/test_tp.py). From the CLI: ``asl train --model-parallel N``.

On a multi-chip slice this runs as-is. With no slice available:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/tensor_parallel.py
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
    import jax.numpy as jnp

    from asltpu.config import TrainConfig
    from asltpu.dist.mesh import batch_sharding, make_mesh
    from asltpu.dist.tp import tp_shard_variables, validate_tp_divisibility
    from asltpu.models.temporal import TransformerHead
    from asltpu.train.loop import create_train_state, make_train_step

    head = TransformerHead(
        num_classes=16, d_model=64, num_heads=4, num_layers=2,
        mlp_ratio=4, dropout=0.0, dtype=jnp.float32,
    )
    validate_tp_divisibility(num_heads=4, d_model=64, mlp_ratio=4,
                             model_parallel=2)

    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 5, 64), jnp.float32)
    )

    # Replicated reference.
    variables = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    want = jax.jit(head.apply)(variables, feats)

    # (data, model=2) mesh: batch shards over `data`, attention heads and
    # MLP hidden width shard over `model`.
    mesh = make_mesh(model_parallel=2)
    print(f"mesh: {dict(mesh.shape)}")
    sharded = tp_shard_variables(variables, mesh)
    k = sharded["params"]["layer0"]["mlp1"]["kernel"]
    print(f"mlp1 kernel spec: {k.sharding.spec}")
    got = jax.jit(head.apply)(
        sharded, jax.device_put(feats, batch_sharding(mesh))
    )
    print("TP logits equal replicated:",
          bool(np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)))

    # TP training: the SAME placements on the full TrainState shard the
    # adamw moments with their params; gradients of sharded params stay
    # sharded and GSPMD inserts the backward collectives.
    cfg = TrainConfig(batch_size=8, num_steps=2, warmup_steps=0,
                      ckpt_dir="/tmp/asltpu_tp_example_ck")
    state = tp_shard_variables(
        create_train_state(head, cfg, (feats[:1],), seed=0), mesh
    )
    step = make_train_step(head, cfg, mesh=mesh, state_template=state)
    labels = np.arange(8, dtype=np.int32) % 16
    state, metrics = step(state, feats, labels)
    print(f"TP train step: loss {float(metrics['loss']):.4f}, "
          f"step {int(state.step)}")


if __name__ == "__main__":
    main()
