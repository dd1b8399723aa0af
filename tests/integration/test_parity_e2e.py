"""COMPOSED end-to-end parity (VERDICT r4 item #6 / ``BASELINE.json:4``):
the SAME mp4 through

  (a) a full TORCH TWIN pipeline — cv2 decode → uniform temporal sample →
      short-side resize → center crop → imagenet normalize → torch model
      (the reference family's canonical OpenCV+PyTorch stack), and
  (b) the production asltpu path — ``load_clip`` (native/cv2 decode with
      host staging on the yuv420 wire) → ``predict`` (one/two XLA programs
      with the Pallas preprocess lane),

with SHARED weights via the C14 torch importer, asserting identical top-1
and logits within tolerance for every RGB family. Per-stage parity
(tests/unit/test_parity*.py) proves each module; THIS test closes the
composition: sampling conventions, resize/crop nesting, wire format, and
normalization all have to line up end to end.

Tolerance: the yuv420 wire re-quantizes chroma through one BGR→I420→RGB
round trip (±1 u8 LSB — tests/unit/test_preprocess.py measures the device
converter at atol 1.01 vs the cv2 oracle; the SOURCE mp4 is 4:2:0 anyway,
so this noise is at the codec's own fidelity floor). ±1 LSB ≈ 0.018 in
normalized units propagates to logit deltas well under 1e-1 for these
random-init nets; top-1 must still match exactly.
"""

import os
import sys

import numpy as np
import pytest

import cv2
import torch
import torch.nn as tnn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "unit"))
from test_parity import (  # noqa: E402
    TorchMobileNetV2GRU,
    TorchResNet18,
    _randomize_bn_stats,
)
from test_parity_more import TorchI3D, TorchTransformerHead  # noqa: E402

from asltpu import api, ckpt  # noqa: E402
from asltpu.data.synthetic import write_video  # noqa: E402
from asltpu.ops.preprocess import resize_plan, uniform_sample_indices  # noqa: E402

LOGIT_ATOL = 0.1  # see module docstring; top-1 must match exactly
T = 8  # contract pipeline at a CI-friendly clip length


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("e2e") / "clip.mp4")
    # Non-square source so the aspect-preserving resize actually resizes
    # AND crops (240x320: short side 240 -> 256 upscale, then 224 crop).
    write_video(p, num_frames=40, size=(240, 320), seed=42)
    return p


def _twin_pipeline(path: str, num_frames: int) -> torch.Tensor:
    """The reference-style OpenCV frame loop: decode ALL frames, uniform
    center-of-segment sampling, short-side resize to 256 (cv2 bilinear),
    center crop 224, /255 imagenet normalize → [1, T, 3, 224, 224]."""
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    idx = uniform_sample_indices(len(frames), num_frames)
    out = []
    for i in idx:
        bgr = frames[int(i)]
        rh, rw = resize_plan(bgr.shape[:2], 256)
        rh, rw = max(rh, 224), max(rw, 224)
        bgr = cv2.resize(bgr, (rw, rh), interpolation=cv2.INTER_LINEAR)
        y0, x0 = (rh - 224) // 2, (rw - 224) // 2
        rgb = bgr[y0:y0 + 224, x0:x0 + 224, ::-1]
        out.append(rgb.astype(np.float32) / 255.0)
    clip = np.stack(out)  # [T, 224, 224, 3]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    clip = (clip - mean) / std
    return torch.from_numpy(clip).permute(0, 3, 1, 2)[None]  # [1,T,3,H,W]


def _production_predict(model, path: str) -> np.ndarray:
    """The asltpu lane under test: load_clip on the model's (yuv420)
    staging config → predict → logits [1, C]."""
    clip = api.load_clip(path, model.cfg.preprocess)
    _, logits = api.predict(model, clip)
    return np.asarray(logits).reshape(1, -1)  # unbatched predict squeezes B


_PP = {
    # The bench/serving production wire: host resize+crop staging, half-byte
    # yuv420 transfer, Pallas device lane; fp32 numerics for the comparison
    # (the parity clause is an fp32-tolerance clause).
    "num_frames": T,
    "staging_size": (224, 224),
    "resize_short": 224,
    "host_resize_short": 256,
    "staging_format": "yuv420",
    "use_pallas": True,
    "out_dtype": "float32",
}


def _assert_composed_parity(model, twin_logits, video):
    got = _production_predict(model, video)
    want = twin_logits.numpy()
    assert got.shape == want.shape
    assert int(got.argmax()) == int(want.argmax()), (
        f"top-1 diverged: asltpu {got.argmax()} vs torch {want.argmax()}\n"
        f"asltpu: {np.round(got, 4)}\ntorch:  {np.round(want, 4)}"
    )
    np.testing.assert_allclose(got, want, atol=LOGIT_ATOL)


@pytest.mark.slow
def test_composed_parity_mobilenet_gru(video, tmp_path):
    torch.manual_seed(10)
    twin = TorchMobileNetV2GRU(num_classes=7, hidden=32).eval()
    _randomize_bn_stats(twin, seed=10)
    pt = str(tmp_path / "m.pt")
    torch.save(twin.state_dict(), pt)
    model = api.load_model(
        "mobilenet_gru", num_classes=7, gru_hidden=32,
        compute_dtype="float32", preprocess=_PP,
    )
    model.variables = ckpt.load_torch_checkpoint(pt, model.variables, model.cfg)
    with torch.no_grad():
        want = twin(_twin_pipeline(video, T))
    _assert_composed_parity(model, want, video)


@pytest.mark.slow
def test_composed_parity_resnet_transformer(video, tmp_path):
    torch.manual_seed(11)
    backbone = TorchResNet18().eval()
    _randomize_bn_stats(backbone, seed=11)
    head = TorchTransformerHead(7, 512, 8, 2, 4, T).eval()
    sd = dict(backbone.state_dict())
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    pt = str(tmp_path / "r.pt")
    torch.save(sd, pt)
    model = api.load_model(
        "resnet_transformer", num_classes=7, num_tx_layers=2,
        compute_dtype="float32", preprocess=_PP,
    )
    model.variables = ckpt.load_torch_checkpoint(pt, model.variables, model.cfg)
    with torch.no_grad():
        x = _twin_pipeline(video, T)  # [1,T,3,H,W]
        feats = backbone(x.reshape(T, 3, 224, 224)).reshape(1, T, 512)
        want = head(feats)
    _assert_composed_parity(model, want, video)


@pytest.mark.slow
def test_composed_parity_i3d(video, tmp_path):
    torch.manual_seed(12)
    twin = TorchI3D(num_classes=7).eval()
    g = torch.Generator().manual_seed(12)
    for m in twin.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
    sd = {
        k.replace("M3", "Mixed_3").replace("M4", "Mixed_4")
        .replace("M5", "Mixed_5"): v
        for k, v in twin.state_dict().items()
    }
    sd["logits.conv3d.weight"] = sd.pop("logits.weight").reshape(
        7, 1024, 1, 1, 1)
    sd["logits.conv3d.bias"] = sd.pop("logits.bias")
    pt = str(tmp_path / "i.pt")
    torch.save(sd, pt)
    model = api.load_model(
        "i3d", num_classes=7, num_frames=T,
        compute_dtype="float32", preprocess=_PP,
    )
    model.variables = ckpt.load_torch_checkpoint(pt, model.variables, model.cfg)
    with torch.no_grad():
        want = twin(_twin_pipeline(video, T).permute(0, 2, 1, 3, 4))
    _assert_composed_parity(model, want, video)
