"""fp32 parity for configs #3 (ResNet18+Transformer head) and #4 (I3D) —
completes torch-twin coverage of the model zoo (with test_parity.py)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from asltpu import ckpt

ATOL = 3e-4


# --------------------------------------------------------------------------
# Transformer head twin (pre-LN, names match ckpt.import_transformer_head)
# --------------------------------------------------------------------------


class TorchEncoderBlock(tnn.Module):
    def __init__(self, d, heads, mlp_ratio):
        super().__init__()
        self.ln1 = tnn.LayerNorm(d)
        self.attn = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.ln2 = tnn.LayerNorm(d)
        self.mlp1 = tnn.Linear(d, d * mlp_ratio)
        self.mlp2 = tnn.Linear(d * mlp_ratio, d)

    def forward(self, x):
        y = self.ln1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        y = self.ln2(x)
        y = self.mlp2(F.gelu(self.mlp1(y)))
        return x + y


class TorchTransformerHead(tnn.Module):
    def __init__(self, num_classes, d, heads, layers, mlp_ratio, t):
        super().__init__()
        self.cls = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos = tnn.Parameter(torch.randn(1, t + 1, d) * 0.02)
        self.layers = tnn.ModuleList(
            [TorchEncoderBlock(d, heads, mlp_ratio) for _ in range(layers)]
        )
        self.final_ln = tnn.LayerNorm(d)
        self.fc = tnn.Linear(d, num_classes)

    def forward(self, feats):  # [B, T, d]
        b = feats.shape[0]
        x = torch.cat([self.cls.expand(b, -1, -1), feats], dim=1) + self.pos
        for blk in self.layers:
            x = blk(x)
        return self.fc(self.final_ln(x)[:, 0])


@pytest.mark.slow
def test_transformer_head_parity():
    import jax
    import jax.numpy as jnp

    from asltpu.models.temporal import TransformerHead

    torch.manual_seed(0)
    d, heads, layers, t = 32, 4, 2, 5
    twin = TorchTransformerHead(7, d, heads, layers, 4, t).eval()

    mod = TransformerHead(
        num_classes=7, d_model=d, num_heads=heads, num_layers=layers,
        mlp_ratio=4, dropout=0.0, dtype=jnp.float32,
    )
    feats = torch.randn(3, t, d)
    variables = mod.init(jax.random.PRNGKey(0), feats.numpy())
    variables = ckpt.import_transformer_head(
        {k: v.numpy() for k, v in twin.state_dict().items()},
        variables, "", layers, heads,
    )
    with torch.no_grad():
        want = twin(feats).numpy()
    got = np.asarray(mod.apply(variables, feats.numpy(), False))
    np.testing.assert_allclose(got, want, atol=ATOL)


# --------------------------------------------------------------------------
# I3D twin (pytorch-i3d layout: Unit3D with TF-SAME padding)
# --------------------------------------------------------------------------


def _tf_same_pad(x, kernel, stride):
    """TF/flax 'SAME' padding for NCDHW conv/pool inputs (asymmetric)."""
    pads = []
    for dim, k, s in zip(x.shape[2:], kernel, stride):
        out = math.ceil(dim / s)
        total = max((out - 1) * s + k - dim, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad wants reversed (W, H, D) pairs flattened.
    flat = []
    for lo, hi in reversed(pads):
        flat += [lo, hi]
    return flat


class TorchUnit3D(tnn.Module):
    def __init__(self, inp, outp, kernel=(1, 1, 1), stride=(1, 1, 1)):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = tnn.Conv3d(inp, outp, kernel, stride, 0, bias=False)
        self.bn = tnn.BatchNorm3d(outp, eps=1e-3)

    def forward(self, x):
        x = F.pad(x, _tf_same_pad(x, self.kernel, self.stride))
        return F.relu(self.bn(self.conv3d(x)))


class TorchMixed(tnn.Module):
    def __init__(self, inp, ch):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = ch
        self.b0 = TorchUnit3D(inp, b0)
        self.b1a = TorchUnit3D(inp, b1a)
        self.b1b = TorchUnit3D(b1a, b1b, (3, 3, 3))
        self.b2a = TorchUnit3D(inp, b2a)
        self.b2b = TorchUnit3D(b2a, b2b, (3, 3, 3))
        self.b3b = TorchUnit3D(inp, b3b)

    def forward(self, x):
        p = F.pad(x, _tf_same_pad(x, (3, 3, 3), (1, 1, 1)), value=-1e30)
        pooled = F.max_pool3d(p, (3, 3, 3), (1, 1, 1))
        return torch.cat(
            [self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
             self.b3b(pooled)],
            dim=1,
        )


_MIXED = [
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
]


class TorchI3D(tnn.Module):
    def __init__(self, num_classes=9):
        super().__init__()
        self.Conv3d_1a_7x7 = TorchUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TorchUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TorchUnit3D(64, 192, (3, 3, 3))
        inp = 192
        for name, ch in _MIXED:
            setattr(self, name.replace("Mixed_", "M"), TorchMixed(inp, ch))
            inp = ch[0] + ch[2] + ch[4] + ch[5]
        self.logits = tnn.Linear(1024, num_classes)

    def _pool(self, x, k, s):
        x = F.pad(x, _tf_same_pad(x, k, s), value=-1e30)
        return F.max_pool3d(x, k, s)

    def forward(self, clip):  # [B, 3, T, H, W]
        x = self.Conv3d_1a_7x7(clip)
        x = self._pool(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = self._pool(x, (1, 3, 3), (1, 2, 2))
        for name, _ in _MIXED:
            x = getattr(self, name.replace("Mixed_", "M"))(x)
            if name == "Mixed_3c":
                x = self._pool(x, (3, 3, 3), (2, 2, 2))
            elif name == "Mixed_4f":
                x = F.max_pool3d(x, (2, 2, 2), (2, 2, 2))
        # pytorch-i3d head: AvgPool3d((2, 7, 7), stride 1) → logits conv →
        # temporal mean (spatial kernel generalized to the full extent).
        kt = 2 if x.shape[2] > 1 else 1
        x = F.avg_pool3d(x, (kt, x.shape[3], x.shape[4]), stride=(1, 1, 1))
        x = x.squeeze(4).squeeze(3).transpose(1, 2)  # [B, T'-1, 1024]
        return self.logits(x).mean(dim=1)


@pytest.mark.slow
def test_i3d_parity():
    import jax
    import jax.numpy as jnp

    from asltpu.models import I3D

    torch.manual_seed(3)
    twin = TorchI3D(num_classes=9).eval()
    # Randomize BN stats so layout bugs can't hide behind identity stats.
    g = torch.Generator().manual_seed(7)
    for m in twin.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5

    sd = {
        k.replace("M3", "Mixed_3").replace("M4", "Mixed_4")
        .replace("M5", "Mixed_5"): v.numpy()
        for k, v in twin.state_dict().items()
    }
    # logits Linear [C, 1024] → the importer expects conv3d [C, 1024, 1, 1, 1]
    sd["logits.conv3d.weight"] = sd.pop("logits.weight").reshape(9, 1024, 1, 1, 1)
    sd["logits.conv3d.bias"] = sd.pop("logits.bias")

    mod = I3D(num_classes=9, dropout=0.0, dtype=jnp.float32)
    clip = torch.rand(1, 16, 64, 64, 3)
    variables = mod.init(jax.random.PRNGKey(0), clip.numpy())
    variables = ckpt.import_i3d(sd, variables)
    with torch.no_grad():
        want = twin(clip.permute(0, 4, 1, 2, 3)).numpy()
    got = np.asarray(mod.apply(variables, clip.numpy(), False))
    np.testing.assert_allclose(got, want, atol=ATOL)
