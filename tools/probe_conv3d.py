"""A/B probe: native 3×3×3 Conv3D vs temporal decomposition into batched
2D convs, at I3D's contract-shape hot layers, timed with the repo's
single-dispatch discipline (one fori_loop per measurement — see
tools/probe_device.py for why per-RPC loops are invalid on this host).

The decomposition is exact for stride-1 SAME 3D convs (every I3D 3×3×3
conv — the only strided convs are the stem and the pools):

    y[:, t] = Σ_{dt∈{0,1,2}} conv2d(x[:, t+dt-1], w[dt])

i.e. fold T into the batch, run 3 Conv2Ds (one per temporal kernel
slice), and shift-sum the results along T. Identical FLOPs; the question
is purely whether XLA:TPU's 2D conv path beats its 3D path at these
shapes.

Run on the real TPU:  python tools/probe_conv3d.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def conv3d_native(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=dn)


def conv3d_t2d(x, w):
    """Exact stride-1 SAME 3×k×k conv via 3 batched 2D convs + shift-sum."""
    b, t, h, wd, c = x.shape
    x2 = x.reshape(b * t, h, wd, c)
    dn = lax.conv_dimension_numbers(
        x2.shape, w.shape[1:], ("NHWC", "HWIO", "NHWC"))
    outs = [
        lax.conv_general_dilated(x2, w[dt], (1, 1), "SAME",
                                 dimension_numbers=dn).reshape(
            b, t, h, wd, -1)
        for dt in range(3)
    ]
    # y[t] = outs[0][t-1] + outs[1][t] + outs[2][t+1]  (zero-padded ends)
    z = jnp.zeros_like(outs[0][:, :1])
    return (
        jnp.concatenate([z, outs[0][:, :-1]], axis=1)
        + outs[1]
        + jnp.concatenate([outs[2][:, 1:], z], axis=1)
    )


def _time_single_dispatch(fn, args, iters):
    """Per-iteration seconds via the TWO-POINT single-dispatch method:
    time one fori_loop of N and one of 2N iterations and difference them —
    the relay RTT (~28 ms healthy, seconds throttled) is a constant per
    dispatch, so it cancels exactly instead of needing to be amortized."""

    def make(n):
        @jax.jit
        def run(*args):
            def body(i, acc):
                xs = [a + i.astype(a.dtype) * 1e-6
                      if a.dtype != jnp.uint8 else a for a in args]
                return acc + jnp.sum(fn(*xs).astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    run_n, run_2n = make(iters), make(2 * iters)
    float(jax.device_get(run_n(*args)))  # compile + warm
    float(jax.device_get(run_2n(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(run_n(*args)))
    t1 = time.perf_counter()
    float(jax.device_get(run_2n(*args)))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


# I3D's 3×3×3 conv shapes at contract input [B=4, 64, 224, 224, 3]
# (B, T, H, W, Cin, Cout); FLOPs per call = 2·27·Cin·Cout·B·T·H·W.
SHAPES = [
    ("Conv3d_2c_3x3", 4, 32, 56, 56, 64, 192),
    ("Mixed_3b.b1b ", 4, 32, 28, 28, 96, 128),
    ("Mixed_4c.b1b ", 4, 16, 14, 14, 112, 224),
    ("Mixed_5c.b1b ", 4, 8, 7, 7, 192, 384),
]


def main():
    print(f"platform: {jax.devices()[0].platform}")
    for name, b, t, h, wd, cin, cout in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, t, h, wd, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16)
        # exactness first (fp32 reference tolerance for bf16 accum)
        ya = np.asarray(conv3d_native(x, w), np.float32)
        yb = np.asarray(conv3d_t2d(x, w), np.float32)
        err = np.max(np.abs(ya - yb)) / max(np.max(np.abs(ya)), 1e-6)
        gflop = 2 * 27 * cin * cout * b * t * h * wd / 1e9
        iters = max(20, int(400 / gflop))  # ≥ ~0.4 TFLOP per loop
        ta = _time_single_dispatch(conv3d_native, (x, w), iters)
        tb = _time_single_dispatch(conv3d_t2d, (x, w), iters)
        print(f"{name} [{b},{t},{h},{wd},{cin}]→{cout}: "
              f"native {ta*1e3:7.2f} ms ({gflop/ta/1e3:6.1f} TF/s)  "
              f"t2d {tb*1e3:7.2f} ms ({gflop/tb/1e3:6.1f} TF/s)  "
              f"ratio {ta/tb:.2f}x  relerr {err:.2e}")


if __name__ == "__main__":
    main()
