"""Golden-logit stability (SURVEY.md §4.2): a fixed synthetic clip through
seed-0 models must reproduce stored logits across refactors. Regenerate
goldens ONLY on intentional model-semantics changes:

    python tests/integration/test_goldens.py regen
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

_SPECS = {
    "mobilenet_gru": dict(
        name="mobilenet_gru", num_classes=6, gru_hidden=32,
        compute_dtype="float32",
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    ),
    "pose_bilstm": dict(
        name="pose_bilstm", num_classes=6, hidden_size=16, num_frames=8,
    ),
    "resnet_transformer": dict(
        name="resnet_transformer", num_classes=6, d_model=512,
        compute_dtype="float32",
        preprocess={"num_frames": 3, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    ),
    "i3d": dict(
        name="i3d", num_classes=6, compute_dtype="float32",
        preprocess={"num_frames": 8, "staging_size": (40, 40),
                    "resize_short": 36, "crop": 32},
    ),
    "two_stream": dict(
        name="two_stream", num_classes=6, d_model=64, num_frames=4,
        compute_dtype="float32",
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    ),
}


def _compute(spec_key):
    from asltpu import api
    from asltpu.data.synthetic import synthetic_landmarks

    spec = dict(_SPECS[spec_key])
    name = spec.pop("name")
    model = api.load_model(name, seed=0, **spec)
    if model.takes_rgb:
        rng = np.random.default_rng(1234)
        pp = model.cfg.preprocess
        clip = rng.integers(
            0, 256, size=(pp.num_frames, *pp.staging_size, 3), dtype=np.uint8
        )
        if model.takes_landmarks:  # fusion
            lm = synthetic_landmarks(1, pp.num_frames, seed=1234)[0]
            _, logits = api.predict(model, clip, landmarks=lm)
        else:
            _, logits = api.predict(model, clip)
    else:
        lm = synthetic_landmarks(1, 8, seed=1234)[0]
        _, logits = api.predict(model, lm)
    return logits


def _golden_path(key):
    return os.path.join(GOLDEN_DIR, f"{key}.npy")


def test_goldens_stable():
    for key in _SPECS:
        want = np.load(_golden_path(key))
        got = _compute(key)
        np.testing.assert_allclose(
            got, want, atol=5e-3,
            err_msg=f"golden drift for {key} — intentional model change? "
            "regen with: python tests/integration/test_goldens.py regen",
        )


if __name__ == "__main__" and "regen" in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for key in _SPECS:
        np.save(_golden_path(key), _compute(key))
        print("wrote", _golden_path(key))
