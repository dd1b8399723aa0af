"""Orbax checkpoint paths: variables roundtrip, train-checkpoint → inference
projection, load_model(checkpoint=...)."""

import numpy as np
import jax
import jax.numpy as jnp

from asltpu import api, ckpt


def _model():
    return api.load_model("pose_bilstm", num_classes=4, hidden_size=16,
                          num_frames=4)


def test_variables_roundtrip(tmp_path):
    m = _model()
    d = str(tmp_path / "ck")
    ckpt.save_variables(d, m.variables, step=7)
    restored = ckpt.restore_variables(d, m.variables)
    for a, b in zip(jax.tree.leaves(m.variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_model_from_orbax(tmp_path):
    m = _model()
    # Perturb then save, load into a fresh model: logits must match saved.
    perturbed = jax.tree.map(lambda x: x + 0.01, m.variables)
    d = str(tmp_path / "ck")
    ckpt.save_variables(d, perturbed, step=0)
    m2 = api.load_model("pose_bilstm", num_classes=4, hidden_size=16,
                        num_frames=4, checkpoint=d)
    lm = np.random.default_rng(0).random((1, 4, 543, 3), np.float32)
    _, want = api.predict(api.Model(m.cfg, m.module, perturbed), lm)
    _, got = api.predict(m2, lm)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_inference_restore_from_train_checkpoint(tmp_path):
    """A save_train_state checkpoint (params+opt+rng+step) must load for
    inference via restore_variables / load_model."""
    m = _model()

    class FakeState:
        step = jnp.int32(4)
        params = jax.tree.map(lambda x: x + 0.5, m.variables["params"])
        batch_stats = {}
        opt_state = {"mu": m.variables["params"]}
        rng = jax.random.PRNGKey(0)

    d = str(tmp_path / "train_ck")
    ckpt.save_train_state(d, FakeState)
    restored = ckpt.restore_variables(d, m.variables)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored["params"])[0]),
        np.asarray(jax.tree.leaves(FakeState.params)[0]),
    )
    # And through the public entry point:
    m3 = api.load_model("pose_bilstm", num_classes=4, hidden_size=16,
                        num_frames=4, checkpoint=d)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(m3.variables["params"])[0]),
        np.asarray(jax.tree.leaves(FakeState.params)[0]),
    )


def test_save_train_state_prunes_old_steps(tmp_path):
    import os

    m = _model()

    class S:
        params = m.variables["params"]
        batch_stats = {}
        opt_state = {}
        rng = jax.random.PRNGKey(0)

    d = str(tmp_path / "prune")
    for step in (2, 4, 6, 8):
        S.step = jnp.int32(step)
        ckpt.save_train_state(d, S, keep=2)
    assert sorted(int(x) for x in os.listdir(d) if x.isdigit()) == [6, 8]
    # Latest restore still works after pruning.
    restored = ckpt.restore_variables(d, {"params": m.variables["params"]})
    assert "params" in restored
