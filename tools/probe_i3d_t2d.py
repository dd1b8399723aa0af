"""Model-level A/B: I3D forward with stride-1 3×3×3 convs as native
Conv3D vs the temporal-decomposition-to-2D rewrite (conv3d_t2d in
tools/probe_conv3d.py), selected by a spatial-size policy.

Per-layer probes (tools/probe_conv3d.py, two-point single-dispatch,
2026-08-19) showed native winning at 56² (93 TF/s) but the t2d form
winning at some deeper shapes — per-layer differences that small are
noisy through the relay, so this probe measures the number that matters:
whole-model contract-shape clips/s, same params, logits checked equal.

Run on the real TPU:  python tools/probe_i3d_t2d.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import asltpu.models.i3d as i3d_mod
from asltpu.models.common import ConvBN
from tools.probe_conv3d import conv3d_t2d

# Spatial sizes (H) at which a stride-1 3×3×3 conv uses the t2d form.
T2D_MAX_HW = 0  # set per variant below


class _ConvT2D(nn.Module):
    """nn.Conv-compatible ("kernel" param, [3,3,3,Cin,Cout] fp32) 3×3×3
    stride-1 SAME conv via the temporal 2D decomposition."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features), jnp.float32,
        )
        return conv3d_t2d(x.astype(self.dtype), w.astype(self.dtype))


class ConvBNSwitch(nn.Module):
    """ConvBN twin whose 3×3×3 stride-1 conv obeys the T2D policy; the
    variable tree is identical to ConvBN's ("conv"/"kernel", "bn"/...)."""

    features: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = 1
    groups: int = 1
    act: object = nn.relu
    padding: object = None
    use_bias: bool = False
    dtype: object = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (
            (self.kernel,) * (x.ndim - 2))
        s = self.strides if isinstance(self.strides, tuple) else (
            (self.strides,) * (x.ndim - 2))
        if (k == (3, 3, 3) and s == (1, 1, 1) and x.ndim == 5
                and x.shape[2] <= T2D_MAX_HW):
            y = _ConvT2D(self.features, dtype=self.dtype, name="conv")(x)
        else:  # inline ConvBN's conv (padding: I3D always passes "SAME")
            y = nn.Conv(
                self.features, k, strides=s, padding=self.padding or "SAME",
                feature_group_count=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, param_dtype=jnp.float32, name="conv",
            )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype,
            param_dtype=jnp.float32, name="bn",
        )(y)
        return self.act(y) if self.act is not None else y


def time_fwd(apply_fn, variables, x, iters=8):
    def make(n):
        @jax.jit
        def run(v, x):
            def body(i, acc):
                return acc + jnp.sum(
                    apply_fn(v, x + i.astype(x.dtype) * 1e-6))
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    rn, r2n = make(iters), make(2 * iters)
    float(jax.device_get(rn(variables, x)))
    float(jax.device_get(r2n(variables, x)))
    t0 = time.perf_counter()
    float(jax.device_get(rn(variables, x)))
    t1 = time.perf_counter()
    float(jax.device_get(r2n(variables, x)))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


def main():
    global T2D_MAX_HW
    print(f"platform: {jax.devices()[0].platform}")
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 224, 224, 3),
                          jnp.bfloat16)
    model = i3d_mod.I3D(num_classes=100)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros_like(x))

    def apply_fn(v, clip):
        return model.apply(v, clip, train=False).astype(jnp.float32)

    # Patch ConvBN inside the i3d module; Unit3D resolves it by global name.
    orig = i3d_mod.ConvBN
    i3d_mod.ConvBN = ConvBNSwitch
    try:
        ref = None
        import os
        limits = tuple(
            int(v) for v in os.environ.get("T2D_LIMITS", "0,28").split(","))
        for limit in limits:
            T2D_MAX_HW = limit
            y = np.asarray(jax.jit(apply_fn)(variables, x))
            if ref is None:
                ref = y
            err = float(np.max(np.abs(y - ref)))
            print(f"t2d_max_hw={limit:3d}: max|Δlogits|={err:.2e}",
                  flush=True)
            dt = time_fwd(apply_fn, variables, x)
            print(f"t2d_max_hw={limit:3d}: {dt*1e3:7.2f} ms/batch "
                  f"({B/dt:7.1f} clips/s)", flush=True)
    finally:
        i3d_mod.ConvBN = orig


if __name__ == "__main__":
    main()
