"""fp32-tolerance parity vs minimal torch twins (the ``BASELINE.json:4``
parity clause; SURVEY.md §4.2). The twins replicate torchvision state-dict
layouts so they exercise the real C14 import path.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from asltpu import ckpt
from asltpu.api import load_model

ATOL = 2e-4  # fp32 tolerance: accumulation-order differences only


# --------------------------------------------------------------------------
# torch twins (torchvision layouts)
# --------------------------------------------------------------------------


def conv_bn_relu6(inp, oup, k, stride=1, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(inp, oup, k, stride, k // 2, groups=groups, bias=False),
        tnn.BatchNorm2d(oup),
        tnn.ReLU6(inplace=True),
    )


class TorchInvertedResidual(tnn.Module):
    def __init__(self, inp, oup, stride, t):
        super().__init__()
        hidden = inp * t
        layers = []
        if t != 1:
            layers.append(conv_bn_relu6(inp, hidden, 1))
        layers += [
            conv_bn_relu6(hidden, hidden, 3, stride, groups=hidden),
            tnn.Conv2d(hidden, oup, 1, bias=False),
            tnn.BatchNorm2d(oup),
        ]
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and inp == oup

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def build_torch_mobilenetv2():
    """features.* in exact torchvision mobilenet_v2 layout."""
    schedule = [
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    ]
    layers = [conv_bn_relu6(3, 32, 3, 2)]
    inp = 32
    for t, c, n, s in schedule:
        for i in range(n):
            layers.append(TorchInvertedResidual(inp, c, s if i == 0 else 1, t))
            inp = c
    layers.append(conv_bn_relu6(320, 1280, 1))
    return tnn.Sequential(*layers)


class TorchMobileNetV2GRU(tnn.Module):
    def __init__(self, num_classes=7, hidden=32):
        super().__init__()
        self.features = build_torch_mobilenetv2()
        self.gru = tnn.GRU(1280, hidden, batch_first=True)
        self.fc = tnn.Linear(hidden, num_classes)

    def forward(self, clip):  # [B, T, 3, H, W]
        b, t = clip.shape[:2]
        x = clip.flatten(0, 1)
        f = self.features(x).mean(dim=(2, 3)).reshape(b, t, -1)
        _, h = self.gru(f)
        return self.fc(h[-1])


class TorchBasicBlock(tnn.Module):
    def __init__(self, inp, oup, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, oup, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(oup)
        self.conv2 = tnn.Conv2d(oup, oup, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(oup)
        self.downsample = None
        if stride != 1 or inp != oup:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, oup, 1, stride, bias=False),
                tnn.BatchNorm2d(oup),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchResNet18(tnn.Module):
    """conv1/bn1/layer{1-4} in exact torchvision resnet18 layout."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [(64, 1), (128, 2), (256, 2), (512, 2)]
        inp = 64
        for i, (c, s) in enumerate(chans):
            blocks = [TorchBasicBlock(inp, c, s), TorchBasicBlock(c, c, 1)]
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            inp = c

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(model, seed=0):
    """Default BN stats (mean 0, var 1) hide layout bugs — randomize them."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_mobilenetv2_gru_parity(tmp_path):
    torch.manual_seed(0)
    twin = TorchMobileNetV2GRU(num_classes=7, hidden=32).eval()
    _randomize_bn_stats(twin)
    pt = str(tmp_path / "twin.pt")
    torch.save(twin.state_dict(), pt)

    model = load_model(
        "mobilenet_gru", num_classes=7, gru_hidden=32,
        compute_dtype="float32",
        preprocess={"num_frames": 3, "crop": 64},  # cheap init shapes
    )
    model.variables = ckpt.load_torch_checkpoint(pt, model.variables, model.cfg)

    clip = torch.rand(2, 3, 64, 64, 3)
    with torch.no_grad():
        want = twin(clip.permute(0, 1, 4, 2, 3)).numpy()
    got = np.asarray(
        model.module.apply(model.variables, clip.numpy(), False)
    )
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.slow
def test_resnet18_parity(tmp_path):
    torch.manual_seed(1)
    twin = TorchResNet18().eval()
    _randomize_bn_stats(twin, seed=1)

    from asltpu.models import ResNet18
    import jax, jax.numpy as jnp

    mod = ResNet18(dtype=jnp.float32)
    x = torch.rand(2, 3, 64, 64)
    variables = mod.init(jax.random.PRNGKey(0), x.permute(0, 2, 3, 1).numpy())
    variables = ckpt.import_resnet18(
        {k: v.numpy() for k, v in twin.state_dict().items()}, variables,
        prefix="",
    )
    with torch.no_grad():
        want = twin(x).numpy()
    got = np.asarray(mod.apply(variables, x.permute(0, 2, 3, 1).numpy(), False))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.slow
def test_pose_bilstm_parity(tmp_path):
    """BiLSTM head parity: torch twin = normalize → 2-layer BiLSTM → fc."""

    class TorchPoseBiLSTM(tnn.Module):
        def __init__(self, num_classes=5, hidden=16):
            super().__init__()
            self.hidden = hidden
            self.lstm = tnn.LSTM(
                543 * 3, hidden, num_layers=2, batch_first=True,
                bidirectional=True,
            )
            self.fc = tnn.Linear(2 * hidden, num_classes)

        def forward(self, x):  # [B, T, 543*3] already normalized
            out, _ = self.lstm(x)
            h = self.hidden
            pooled = torch.cat([out[:, -1, :h], out[:, 0, h:]], dim=-1)
            return self.fc(pooled)

    torch.manual_seed(2)
    twin = TorchPoseBiLSTM().eval()
    pt = str(tmp_path / "twin.pt")
    torch.save(twin.state_dict(), pt)

    model = load_model("pose_bilstm", num_classes=5, hidden_size=16)
    model.variables = ckpt.load_torch_checkpoint(pt, model.variables, model.cfg)

    from asltpu.data.synthetic import synthetic_landmarks
    from asltpu.models.bilstm import normalize_landmarks
    import jax.numpy as jnp

    lm = synthetic_landmarks(2, 6, seed=3)
    normed = np.asarray(normalize_landmarks(jnp.asarray(lm))).reshape(2, 6, -1)
    with torch.no_grad():
        want = twin(torch.from_numpy(normed)).numpy()
    got = np.asarray(model.module.apply(model.variables, lm, False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_split_predict_matches_fused():
    """The two-program inference chain (Model.split_predict_fn) must be
    numerically identical to the single fused XLA program — same modules,
    same params, only the program boundary differs."""
    import numpy as np

    from asltpu import api

    for name, overrides in [
        ("mobilenet_gru", dict(num_classes=5, gru_hidden=16)),
        ("resnet_transformer", dict(num_classes=5, d_model=32, num_heads=4,
                                    num_tx_layers=1)),
    ]:
        model = api.load_model(
            name,
            preprocess={"num_frames": 3, "staging_size": (48, 48),
                        "resize_short": 40, "crop": 32},
            **overrides,
        )
        rng = np.random.default_rng(0)
        frames = rng.integers(
            0, 256,
            (2, model.cfg.preprocess.num_frames, 48, 48, 3), np.uint8,
        )
        fused = np.asarray(model.predict_fn()(model.variables, frames))
        split = np.asarray(model.split_predict_fn()(model.variables, frames))
        np.testing.assert_allclose(fused, split, atol=1e-5), name


def test_raw_apply_fn_embeds_in_larger_program():
    """Model.raw_apply_fn is the UNJITTED inference math: it must match
    predict_fn exactly AND compose inside a larger jitted computation (the
    fori_loop single-dispatch measurement harness depends on this)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asltpu import api

    model = api.load_model(
        "mobilenet_gru", num_classes=5, gru_hidden=16,
        preprocess={"num_frames": 3, "staging_size": (48, 48),
                    "resize_short": 40, "crop": 32},
    )
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 3, 48, 48, 3), np.uint8)
    raw = model.raw_apply_fn()
    direct = np.asarray(model.predict_fn()(model.variables, frames))
    np.testing.assert_allclose(
        np.asarray(jax.jit(raw)(model.variables, frames)), direct, atol=1e-6)

    @jax.jit
    def looped(variables, x):
        def body(i, acc):
            return acc + raw(variables, x).astype(jnp.float32)
        return jax.lax.fori_loop(0, 3, body,
                                 jnp.zeros((2, 5), jnp.float32))

    np.testing.assert_allclose(
        np.asarray(looped(model.variables, frames)),
        3.0 * direct.astype(np.float32), rtol=2e-5)


def test_init_spatial_reduction_shape_invariant():
    """init_variables uses a 32² spatial dummy (fast eager CPU init); the
    parameter tree must be shape-identical to a full-resolution init for
    every config."""
    import functools

    import jax

    from asltpu.api import _dummy_inputs, build_module
    from asltpu.config import CONFIG_REGISTRY, get_config

    for name in CONFIG_REGISTRY:
        cfg = get_config(name)
        m = build_module(cfg)
        rng = jax.random.PRNGKey(0)
        full = jax.eval_shape(functools.partial(m.init, rng), *_dummy_inputs(cfg))
        small = jax.eval_shape(
            functools.partial(m.init, rng),
            *_dummy_inputs(cfg, init_spatial=32),
        )
        assert jax.tree.all(jax.tree.map(
            lambda a, b: a.shape == b.shape and a.dtype == b.dtype, full, small
        )), name
