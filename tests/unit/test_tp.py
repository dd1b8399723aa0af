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


def test_tp_train_step_matches_replicated():
    """TP training: the full production train step (loss → grads → adamw)
    with Megatron-sharded params + moments must walk the SAME trajectory
    as the unsharded step — gradients of sharded params stay sharded and
    GSPMD's backward collectives must reconstruct the exact math."""
    from asltpu.config import TrainConfig
    from asltpu.train.loop import create_train_state, make_train_step

    module = TransformerHead(
        num_classes=8, d_model=64, num_heads=4, num_layers=2,
        mlp_ratio=4, dropout=0.0, dtype=jnp.float32,
    )
    cfg = TrainConfig(
        batch_size=8, num_steps=4, learning_rate=1e-3, warmup_steps=0,
        weight_decay=1e-4, label_smoothing=0.1, grad_clip_norm=1.0, seed=0,
    )
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 5, 64), jnp.float32)
    )
    labels = np.arange(8, dtype=np.int32) % 8
    dummy = (jnp.zeros((1, 5, 64), jnp.float32),)

    ref_state = create_train_state(module, cfg, dummy, seed=0)
    ref_step = make_train_step(module, cfg)  # single-device
    for _ in range(2):
        ref_state, ref_metrics = ref_step(ref_state, feats, labels)

    mesh = make_mesh(model_parallel=2)  # (4 data, 2 model)
    tp_state = tp_shard_variables(create_train_state(module, cfg, dummy,
                                                     seed=0), mesh)
    # The sharded-state placements must be live before the step runs.
    k = tp_state.params["layer0"]["mlp1"]["kernel"]
    assert not k.sharding.is_fully_replicated
    tp_step = make_train_step(module, cfg, mesh=mesh, state_template=tp_state)
    for _ in range(2):
        tp_state, tp_metrics = tp_step(tp_state, feats, labels)

    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    # Adam moments shard WITH their params (path-matched inside opt_state).
    mu_sh = [
        leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(tp_state.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 2
    ]
    assert not all(mu_sh), "no sharded optimizer moment found"
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_state.params)[0]
    tp_flat = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
    for (path, ref_leaf), (_, tp_leaf) in zip(ref_flat, tp_flat):
        segs = [getattr(k, "key", str(k)) for k in path]
        if segs[-2:] == ["key", "bias"]:
            # The attention KEY bias has an analytically ZERO gradient (a
            # constant shift of every key moves all logits of a query by
            # the same amount — softmax-invariant), so its trajectory is
            # adam normalizing pure fp summation noise: reduction order
            # legitimately changes it. Every real direction is compared.
            continue
        np.testing.assert_allclose(
            np.asarray(tp_leaf), np.asarray(ref_leaf), atol=2e-5, rtol=1e-4,
            err_msg="/".join(segs),
        )


def test_tp_contract_head_bf16():
    """TP at the CONTRACT head shape (BASELINE.json:8 — d_model 512,
    8 heads, 4 layers, ff 2048) under the production bf16 compute dtype,
    mp=4: placements must divide the real shapes and the logits must
    match the replicated run to bf16-accumulation tolerance (argmax
    exactly)."""
    module = TransformerHead(
        num_classes=100, d_model=512, num_heads=8, num_layers=4,
        mlp_ratio=4, dropout=0.0, dtype=jnp.bfloat16,
    )
    validate_tp_divisibility(8, 512, 4, 4)
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (8, 16, 512), jnp.float32
    )
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), feats)
    want = np.asarray(jax.jit(module.apply)(variables, feats))

    mesh = make_mesh(model_parallel=4)
    sharded = tp_shard_variables(variables, mesh)
    q = sharded["params"]["layer0"]["attn"]["query"]["kernel"]
    assert q.shape == (512, 8, 64) and not q.sharding.is_fully_replicated
    got = np.asarray(jax.jit(module.apply)(sharded, feats))
    # bf16 accumulation differs across the split reductions; logits are
    # O(1) — 0.05 absolute is ~few ULP of bf16 at that scale.
    np.testing.assert_allclose(got, want, atol=0.05)
    # Argmax may only flip where the replicated run's own top-2 margin is
    # within that accumulation noise (random-init logits have near-ties).
    for row in range(want.shape[0]):
        if got[row].argmax() != want[row].argmax():
            top2 = np.sort(want[row])[-2:]
            assert top2[1] - top2[0] < 0.1, (
                f"row {row}: argmax flipped across a "
                f"{top2[1] - top2[0]:.3f} margin"
            )


def test_tp_eval_step_matches_replicated():
    """The pad-aware eval step under TP: top-1/top-5 counts from the
    TP-sharded state must equal the unsharded step's, including label==-1
    pad rows counting zero."""
    from asltpu.config import TrainConfig
    from asltpu.train.loop import create_train_state, make_eval_step

    module = TransformerHead(
        num_classes=8, d_model=64, num_heads=4, num_layers=1,
        mlp_ratio=4, dropout=0.0, dtype=jnp.float32,
    )
    cfg = TrainConfig(batch_size=8, num_steps=2, warmup_steps=0, seed=0)
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 5, 64), jnp.float32)
    )
    labels = np.asarray([0, 1, 2, 3, 4, 5, -1, -1], np.int32)  # 2 pad rows
    dummy = (jnp.zeros((1, 5, 64), jnp.float32),)

    state = create_train_state(module, cfg, dummy, seed=0)
    ref_t1, ref_t5 = make_eval_step(module)(state, feats, labels)

    mesh = make_mesh(model_parallel=2)
    tp_state = tp_shard_variables(
        create_train_state(module, cfg, dummy, seed=0), mesh
    )
    eval_fn = make_eval_step(module, mesh=mesh, state_template=tp_state)
    tp_t1, tp_t5 = eval_fn(tp_state, feats, labels)
    assert int(tp_t1) == int(ref_t1)
    assert int(tp_t5) == int(ref_t5)
    assert int(tp_t5) <= 6  # pads can never score


def test_tp_state_checkpoint_roundtrip(tmp_path):
    """TP-sharded TrainState → orbax save (device_get assembles the global
    arrays) → restore on host → re-place under TP → continue training:
    the resumed trajectory must be BITWISE the uninterrupted one (same
    program, same placements — any drift means the gather or re-place
    corrupted a shard)."""
    from asltpu import ckpt as _ckpt
    from asltpu.config import TrainConfig
    from asltpu.train.loop import create_train_state, make_train_step

    module = TransformerHead(
        num_classes=8, d_model=64, num_heads=4, num_layers=1,
        mlp_ratio=4, dropout=0.0, dtype=jnp.float32,
    )
    cfg = TrainConfig(batch_size=8, num_steps=4, learning_rate=1e-3,
                      warmup_steps=0, seed=0,
                      ckpt_dir=str(tmp_path / "ck"))
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 5, 64), jnp.float32)
    )
    labels = np.arange(8, dtype=np.int32) % 8
    dummy = (jnp.zeros((1, 5, 64), jnp.float32),)
    mesh = make_mesh(model_parallel=2)

    def fresh():
        return tp_shard_variables(
            create_train_state(module, cfg, dummy, seed=0), mesh
        )

    state = fresh()
    step = make_train_step(module, cfg, mesh=mesh, state_template=state)

    # Uninterrupted: two steps.
    ref = fresh()
    for _ in range(2):
        ref, _ = step(ref, feats, labels)

    # Interrupted: one step, save (sharded!), restore into a host template,
    # re-place (the train() resume flow), one more step.
    state, _ = step(state, feats, labels)
    _ckpt.save_train_state(cfg.ckpt_dir, state)
    restored = _ckpt.try_restore_train_state(cfg.ckpt_dir, fresh())
    restored = tp_shard_variables(restored, mesh)
    assert not restored.params["layer0"]["mlp1"][
        "kernel"].sharding.is_fully_replicated
    restored, _ = step(restored, feats, labels)

    assert int(restored.step) == int(ref.step) == 2
    for a, b in zip(jax.tree.leaves(ref.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_rules_cover_fusion_cross_attention():
    """The fusion model's cross-attention modules are named ``*_attn``
    (models/fusion.py) — the out-projection row-parallel rule must match
    them, not only the encoder's ``attn``."""
    from asltpu.dist.tp import _spec_for

    class _Key(str):
        @property
        def key(self):
            return str(self)

    path = tuple(_Key(s) for s in ("xblock0", "a_from_b_attn", "out", "kernel"))
    assert tuple(_spec_for(path)) == ("model", None, None)
    path = tuple(_Key(s) for s in ("xblock0", "a_from_b_attn", "query", "kernel"))
    assert tuple(_spec_for(path)) == (None, "model", None)


def test_tp_divisibility_validation():
    validate_tp_divisibility(8, 512, 4, 4)  # contract head: fine
    with pytest.raises(ValueError, match="num_heads"):
        validate_tp_divisibility(6, 512, 4, 4)
    with pytest.raises(ValueError, match="devices not divisible"):
        make_mesh(model_parallel=3)
