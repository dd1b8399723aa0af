"""The examples/ scripts must stay runnable — they are the user-facing
entry documentation (docs/API.md, docs/MIGRATION.md reference them)."""

import os
import runpy

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "..", "examples")


def _run(name, monkeypatch, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


def test_quickstart_predict(monkeypatch, capsys):
    _run("quickstart_predict.py", monkeypatch, ASLTPU_EXAMPLE_TINY="1")
    out = capsys.readouterr().out
    assert "predict: gloss id" in out
    assert out.count("stream:") == 4


@pytest.mark.slow
def test_train_resume(monkeypatch, capsys):
    _run("train_resume.py", monkeypatch)
    out = capsys.readouterr().out
    assert "crashed at step 6" in out
    assert "finished at step 10" in out


def test_export_deploy(monkeypatch, capsys):
    _run("export_deploy.py", monkeypatch, ASLTPU_EXAMPLE_TINY="1")
    out = capsys.readouterr().out
    assert "artifact predict: gloss id" in out
    assert "matches live model: True" in out


def test_continuous_recognition(monkeypatch, capsys):
    _run("continuous_recognition.py", monkeypatch, ASLTPU_EXAMPLE_TINY="1")
    out = capsys.readouterr().out
    assert "windows: 9" in out  # 120 frames, 25f window, 12f stride
    assert "segments:" in out


def test_tensor_parallel(capsys):
    runpy.run_path(
        os.path.join(EXAMPLES, "tensor_parallel.py"), run_name="__main__"
    )
    out = capsys.readouterr().out
    assert "TP logits equal replicated: True" in out
    assert "TP train step: loss" in out


def test_sharded_inference(capsys):
    # conftest already runs tests on the 8-device virtual CPU mesh, so the
    # example's in-process CPU forcing is unnecessary here.
    runpy.run_path(
        os.path.join(EXAMPLES, "sharded_inference.py"), run_name="__main__"
    )
    out = capsys.readouterr().out
    assert "mesh: 8 devices" in out
    assert "logits (16, 100)" in out
