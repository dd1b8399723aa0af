"""fp32 parity for config #5 (two-stream cross-attention fusion) — the last
config without a strict torch twin. Reuses the torchvision-layout
MobileNetV2 twin from test_parity."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from asltpu import ckpt
from tests.unit.test_parity import build_torch_mobilenetv2, _randomize_bn_stats

ATOL = 3e-4


class TorchCrossBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        for dir_ in ["a_from_b", "b_from_a"]:
            setattr(self, f"{dir_}_lnq", tnn.LayerNorm(d))
            setattr(self, f"{dir_}_lnkv", tnn.LayerNorm(d))
            setattr(self, f"{dir_}_attn",
                    tnn.MultiheadAttention(d, heads, batch_first=True))
        for s in ["a_mlp", "b_mlp"]:
            setattr(self, f"{s}_ln", tnn.LayerNorm(d))
            setattr(self, f"{s}_fc1", tnn.Linear(d, 4 * d))
            setattr(self, f"{s}_fc2", tnn.Linear(4 * d, d))

    def _xattn(self, q_in, kv_in, dir_):
        q = getattr(self, f"{dir_}_lnq")(q_in)
        kv = getattr(self, f"{dir_}_lnkv")(kv_in)
        y, _ = getattr(self, f"{dir_}_attn")(q, kv, kv, need_weights=False)
        return q_in + y

    def _mlp(self, x, s):
        y = getattr(self, f"{s}_ln")(x)
        y = getattr(self, f"{s}_fc2")(F.gelu(getattr(self, f"{s}_fc1")(y)))
        return x + y

    def forward(self, a, b):
        a2 = self._xattn(a, b, "a_from_b")
        b2 = self._xattn(b, a, "b_from_a")
        return self._mlp(a2, "a_mlp"), self._mlp(b2, "b_mlp")


class TorchTwoStream(tnn.Module):
    def __init__(self, num_classes, d, heads, layers, t):
        super().__init__()
        self.features = build_torch_mobilenetv2()
        self.rgb_proj = tnn.Linear(1280, d)
        self.kp_proj = tnn.Linear(543 * 3, d)
        self.pos = tnn.Parameter(torch.randn(1, t, d) * 0.02)
        self.fusion = tnn.ModuleList(
            [TorchCrossBlock(d, heads) for _ in range(layers)]
        )
        self.fc = tnn.Linear(2 * d, num_classes)

    def forward(self, clip, kp_normed):  # [B,T,3,H,W], [B,T,1629]
        b, t = clip.shape[:2]
        rgb = self.features(clip.flatten(0, 1)).mean(dim=(2, 3)).reshape(b, t, -1)
        rgb = self.rgb_proj(rgb) + self.pos
        kp = self.kp_proj(kp_normed) + self.pos
        for blk in self.fusion:
            rgb, kp = blk(rgb, kp)
        pooled = torch.cat([rgb.mean(dim=1), kp.mean(dim=1)], dim=-1)
        return self.fc(pooled)


@pytest.mark.slow
def test_two_stream_parity():
    import jax
    import jax.numpy as jnp

    from asltpu.data.synthetic import synthetic_landmarks
    from asltpu.models import TwoStreamFusion
    from asltpu.models.bilstm import normalize_landmarks

    torch.manual_seed(4)
    d, heads, layers, t = 32, 4, 2, 3
    twin = TorchTwoStream(7, d, heads, layers, t).eval()
    _randomize_bn_stats(twin, seed=4)

    mod = TwoStreamFusion(
        num_classes=7, d_model=d, num_heads=heads, num_fusion_layers=layers,
        dropout=0.0, dtype=jnp.float32,
    )
    clip = torch.rand(2, t, 64, 64, 3)
    lm = synthetic_landmarks(2, t, seed=5)
    variables = mod.init(jax.random.PRNGKey(0), clip.numpy(), lm)
    variables = ckpt.import_two_stream(
        {k: v.numpy() for k, v in twin.state_dict().items()},
        variables, layers, heads,
    )
    normed = np.asarray(normalize_landmarks(jnp.asarray(lm))).reshape(2, t, -1)
    with torch.no_grad():
        want = twin(
            clip.permute(0, 1, 4, 2, 3), torch.from_numpy(normed.copy())
        ).numpy()
    got = np.asarray(mod.apply(variables, clip.numpy(), lm, False))
    np.testing.assert_allclose(got, want, atol=ATOL)
