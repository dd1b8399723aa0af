"""Deployment-export tests (asltpu.export): serialize the inference
program + weights + config to a directory, reload WITHOUT model code, and
get the same logits.

Runs on the CPU mesh (conftest); the artifact's platform list therefore
records 'cpu' here. The TPU lane (Pallas preprocess → Mosaic custom call
serialization) is exercised on the real device — recorded in ROUND_NOTES;
serialization succeeded with an EMPTY disabled-checks list because the
Mosaic TPU custom calls are in jax.export's guaranteed-stable set.
"""

import json
import os

import numpy as np
import pytest

from asltpu.api import load_model
from asltpu.export import export_model, load_exported


@pytest.fixture(scope="module")
def tiny_rgb_model():
    return load_model(
        "mobilenet_gru", width_mult=0.5, gru_hidden=32, num_classes=7,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 36, "crop": 32},
    )


@pytest.fixture(scope="module")
def rgb_artifact(tiny_rgb_model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exp") / "artifact")
    export_model(tiny_rgb_model, path, batch_size=3)
    return path


def test_export_roundtrip_matches_predict_fn(tiny_rgb_model, rgb_artifact):
    em = load_exported(rgb_artifact)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(3, 4, 64, 64, 3), dtype=np.uint8)
    got = em.predict_batch(frames=frames)
    want = np.asarray(
        tiny_rgb_model.predict_fn()(tiny_rgb_model.variables, frames)
    )
    assert got.shape == (3, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_config_roundtrip(tiny_rgb_model, rgb_artifact):
    em = load_exported(rgb_artifact)
    # Tuples restored from JSON lists; the rebuilt config passes through
    # get_config so config-time validation reruns.
    assert em.cfg == tiny_rgb_model.cfg
    assert em.cfg.preprocess.staging_size == (64, 64)
    assert em.takes_rgb and not em.takes_landmarks


def test_export_single_clip_predict_pads(tiny_rgb_model, rgb_artifact):
    em = load_exported(rgb_artifact)
    rng = np.random.default_rng(1)
    clip = rng.integers(0, 255, size=(4, 64, 64, 3), dtype=np.uint8)
    gloss, logits = em.predict(frames=clip)
    assert logits.shape == (7,)
    want = np.asarray(tiny_rgb_model.predict_fn()(
        tiny_rgb_model.variables,
        np.repeat(clip[None], 3, axis=0),
    ))[0]
    np.testing.assert_allclose(logits, want, atol=1e-5)
    assert gloss == int(want.argmax())


def test_export_shape_validation(rgb_artifact):
    em = load_exported(rgb_artifact)
    rng = np.random.default_rng(2)
    short = rng.integers(0, 255, size=(2, 4, 64, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="frames shape"):
        em.predict_batch(frames=short)
    with pytest.raises(ValueError, match="frames shape"):
        em.predict(frames=short[0, :2])


def test_export_pose_only_landmarks_input(tmp_path):
    pm = load_model("pose_bilstm", num_classes=5, hidden_size=16,
                    num_frames=6)
    export_model(pm, str(tmp_path / "a"), batch_size=2)
    pe = load_exported(str(tmp_path / "a"))
    assert pe.takes_landmarks and not pe.takes_rgb
    rng = np.random.default_rng(3)
    lm = rng.standard_normal((2, 6, 543, 3)).astype(np.float32)
    got = pe.predict_batch(landmarks=lm)
    want = np.asarray(pm.predict_fn()(pm.variables, lm))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_two_stream_both_inputs(tmp_path):
    fm = load_model(
        "two_stream", num_classes=4, d_model=32, num_heads=2,
        num_fusion_layers=1,
        preprocess={"num_frames": 4, "staging_size": (28, 28),
                    "resize_short": 26, "crop": 24},
    )
    export_model(fm, str(tmp_path / "f"), batch_size=2)
    fe = load_exported(str(tmp_path / "f"))
    assert fe.takes_rgb and fe.takes_landmarks
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, size=(2, 4, 28, 28, 3), dtype=np.uint8)
    lm = rng.standard_normal((2, 4, 543, 3)).astype(np.float32)
    got = fe.predict_batch(frames=frames, landmarks=lm)
    want = np.asarray(fm.predict_fn()(fm.variables, frames, lm))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Single-clip path pads BOTH inputs coherently.
    gloss, logits = fe.predict(frames=frames[0], landmarks=lm[0])
    np.testing.assert_allclose(logits, want[0], atol=1e-5)


def test_export_resnet_transformer_roundtrip(tmp_path):
    m = load_model(
        "resnet_transformer", num_classes=5, d_model=64, num_heads=2,
        num_tx_layers=1,
        preprocess={"num_frames": 4, "staging_size": (40, 40),
                    "resize_short": 36, "crop": 32},
    )
    export_model(m, str(tmp_path / "r"), batch_size=2)
    em = load_exported(str(tmp_path / "r"))
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, size=(2, 4, 40, 40, 3), dtype=np.uint8)
    got = em.predict_batch(frames=frames)
    want = np.asarray(m.predict_fn()(m.variables, frames))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_i3d_roundtrip(tmp_path):
    # Full-width I3D at the smallest legal temporal extent (frames=8: the
    # Mixed_4f (2,2,2) VALID pool needs T'>=2 after the two stride-2
    # temporal reductions) — covers the s2d stem + 3D-conv lane through
    # export, completing roundtrip coverage of all five families.
    m = load_model(
        "i3d", num_classes=5,
        preprocess={"num_frames": 8, "staging_size": (40, 40),
                    "resize_short": 36, "crop": 32},
    )
    export_model(m, str(tmp_path / "i"), batch_size=2)
    em = load_exported(str(tmp_path / "i"))
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, size=(2, 8, 40, 40, 3), dtype=np.uint8)
    got = em.predict_batch(frames=frames)
    want = np.asarray(m.predict_fn()(m.variables, frames))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_load_exported_rejects_non_artifact(tmp_path):
    with pytest.raises(IOError, match="not an export artifact"):
        load_exported(str(tmp_path))


def test_load_exported_rejects_future_format(tmp_path, rgb_artifact):
    import shutil

    dst = str(tmp_path / "fut")
    shutil.copytree(rgb_artifact, dst)
    meta = json.load(open(os.path.join(dst, "meta.json")))
    meta["format_version"] = 999
    json.dump(meta, open(os.path.join(dst, "meta.json"), "w"))
    with pytest.raises(IOError, match="format_version"):
        load_exported(dst)


def test_cli_export_and_predict_exported(tmp_path):
    """The CLI lane end-to-end: asl export --verify-clip, then
    asl predict --exported on a fresh clip."""
    from asltpu.cli.main import main
    from asltpu.data.synthetic import write_video

    clip = str(tmp_path / "c.mp4")
    write_video(clip, num_frames=12, size=(80, 80), seed=7)
    out = str(tmp_path / "artifact")
    rc = main([
        "export", "--model", "mobilenet_gru", "--num-classes", "5",
        "--set", "width_mult=0.5", "--set", "gru_hidden=16",
        "--set", "preprocess.num_frames=4",
        "--set", "preprocess.staging_size=(64,64)",
        "--set", "preprocess.resize_short=36", "--set", "preprocess.crop=32",
        "--out", out, "--batch", "2", "--verify-clip", clip,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "program.stablehlo"))
    rc = main(["predict", "--exported", out, clip])
    assert rc == 0


def test_cli_predict_exported_resolves_gloss_names(tmp_path, capsys):
    """--index must feed gloss names into the exported lane exactly like
    the normal predict lane (it was silently ignored at first)."""
    from asltpu.cli.main import main
    from asltpu.data.synthetic import make_synthetic_wlasl

    index, videos = make_synthetic_wlasl(
        str(tmp_path / "d"), num_glosses=5, clips_per_gloss=1,
        num_frames=8, size=(80, 80),
    )
    clip = os.path.join(videos, sorted(os.listdir(videos))[0])
    out = str(tmp_path / "artifact")
    rc = main([
        "export", "--model", "mobilenet_gru", "--num-classes", "5",
        "--set", "width_mult=0.5", "--set", "gru_hidden=16",
        "--set", "preprocess.num_frames=4",
        "--set", "preprocess.staging_size=(64,64)",
        "--set", "preprocess.resize_short=36", "--set", "preprocess.crop=32",
        "--out", out, "--batch", "2",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main(["predict", "--exported", out, "--index", index, clip])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(rec["gloss"], str)  # a NAME, not a bare id
    assert all(isinstance(e["gloss"], str) for e in rec["top5"])
