"""Tensor parallelism over the ``model`` mesh axis (asltpu.dist.tp).

The claim under test is NUMERICAL EQUIVALENCE: the same flax module with
the same weights must produce the same logits whether its params are
replicated or Megatron-sharded over the model axis — GSPMD's inserted
collectives (head-sharded attention partial outputs, ff-sharded MLP
partials) must reconstruct the exact math. A wrong placement rule fails
loudly here (wrong shapes) or produces garbage logits (wrong reduction).
Runs on the 8-device virtual CPU mesh from tests/conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asltpu.dist.mesh import DATA_AXIS, make_mesh
from asltpu.dist.tp import (
    tp_shard_variables,
    tp_variable_shardings,
    validate_tp_divisibility,
)
from asltpu.models.temporal import TransformerHead


def _head_and_inputs(dtype=jnp.float32):
    module = TransformerHead(
        num_classes=16, d_model=64, num_heads=4, num_layers=2,
        mlp_ratio=4, dropout=0.0, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 64), jnp.float32)
    variables = module.init(rng, feats)
    return module, variables, feats


def test_tp_head_matches_replicated():
    module, variables, feats = _head_and_inputs()
    want = module.apply(variables, feats)

    for mp in (2, 4):
        mesh = make_mesh(model_parallel=mp)
        assert mesh.shape == {DATA_AXIS: 8 // mp, "model": mp}
        sharded = tp_shard_variables(variables, mesh)
        got = jax.jit(module.apply)(sharded, feats)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )


def test_tp_placements_actually_shard():
    """The MLP/attention params must really live sharded (not silently
    replicated — the equivalence test alone would pass on a no-op)."""
    module, variables, feats = _head_and_inputs()
    mesh = make_mesh(model_parallel=4)
    sh = tp_variable_shardings(variables, mesh)
    p = sh["params"]
    spec = lambda leaf: leaf.spec  # noqa: E731
    assert spec(p["layer0"]["mlp1"]["kernel"]) == (None, "model")
    assert spec(p["layer0"]["mlp1"]["bias"]) == ("model",)
    assert spec(p["layer0"]["mlp2"]["kernel"]) == ("model", None)
    assert spec(p["layer0"]["mlp2"]["bias"]) == ()
    assert spec(p["layer0"]["attn"]["query"]["kernel"]) == (
        None, "model", None)
    assert spec(p["layer0"]["attn"]["out"]["kernel"]) == (
        "model", None, None)
    # Non-TP params replicated.
    assert spec(p["fc"]["kernel"]) == ()
    assert spec(p["layer0"]["ln1"]["scale"]) == ()
    # And the placed arrays are genuinely distributed.
    sharded = tp_shard_variables(variables, mesh)
    k = sharded["params"]["layer0"]["mlp1"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_tp_batch_sharded_input():
    """TP composes with DP: batch over ``data`` × params over ``model``."""
    from asltpu.dist.mesh import batch_sharding

    module, variables, feats = _head_and_inputs()
    want = module.apply(variables, feats)
    mesh = make_mesh(model_parallel=2)  # (4 data, 2 model)
    sharded = tp_shard_variables(variables, mesh)
    feats_s = jax.device_put(feats, batch_sharding(mesh))
    got = jax.jit(module.apply)(sharded, feats_s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_tp_divisibility_validation():
    validate_tp_divisibility(8, 512, 4, 4)  # contract head: fine
    with pytest.raises(ValueError, match="num_heads"):
        validate_tp_divisibility(6, 512, 4, 4)
    with pytest.raises(ValueError, match="devices not divisible"):
        make_mesh(model_parallel=3)
