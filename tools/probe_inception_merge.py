"""A/B probe: the Inception block's three parallel 1×1×1 convs on one
input (b0, b1a, b2a) as separate convs vs ONE merged conv (kernel concat
on the output-channel axis, split after). Mathematically exact — 1×1×1
convs on the same input commute with output-channel concatenation, and
per-branch BN is per-channel so it applies identically to the slices.

Rationale: at the deep stages the branch matmuls are narrow (Cout 48–384
at ≤1568 positions) — below MXU tile width — while the merged conv gives
one wide matmul. Timed with the two-point single-dispatch method.

Run on the real TPU:  python tools/probe_inception_merge.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def _time(fn, args, iters):
    def make(n):
        @jax.jit
        def run(*args):
            def body(i, acc):
                xs = [a + i.astype(a.dtype) * 1e-6 for a in args]
                return acc + jnp.sum(fn(*xs).astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    rn, r2n = make(iters), make(2 * iters)
    float(jax.device_get(rn(*args)))
    float(jax.device_get(r2n(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(rn(*args)))
    t1 = time.perf_counter()
    float(jax.device_get(r2n(*args)))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


# (stage, T, H, Cin, (b0, b1a, b2a)) at contract batch 4.
STAGES = [
    ("Mixed_3b", 32, 28, 192, (64, 96, 16)),
    ("Mixed_4c", 16, 14, 512, (160, 112, 24)),
    ("Mixed_5c", 8, 7, 832, (384, 192, 48)),
]


def main():
    print(f"platform: {jax.devices()[0].platform}")
    B = 4
    for name, t, hw, cin, (c0, c1, c2) in STAGES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, t, hw, hw, cin), jnp.bfloat16)
        ws = [jax.random.normal(jax.random.PRNGKey(i), (1, 1, 1, cin, c),
                                jnp.bfloat16)
              for i, c in enumerate((c0, c1, c2))]

        def dn(xs, ws):
            return lax.conv_dimension_numbers(
                xs, ws, ("NDHWC", "DHWIO", "NDHWC"))

        def separate(x, w0, w1, w2):
            outs = [
                lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=dn(x.shape, w.shape))
                for w in (w0, w1, w2)
            ]
            return jnp.concatenate(outs, axis=-1)

        def merged(x, w0, w1, w2):
            w = jnp.concatenate([w0, w1, w2], axis=-1)
            return lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=dn(x.shape, w.shape))

        import numpy as np
        err = float(np.max(np.abs(
            np.asarray(separate(x, *ws), np.float32)
            - np.asarray(merged(x, *ws), np.float32))))
        gflop = 2 * cin * (c0 + c1 + c2) * B * t * hw * hw / 1e9
        iters = max(50, int(100 / gflop))
        ta = _time(separate, (x, *ws), iters)
        tb = _time(merged, (x, *ws), iters)
        print(f"{name} [{B},{t},{hw}²,{cin}]→({c0},{c1},{c2}): "
              f"separate {ta*1e6:7.1f} µs  merged {tb*1e6:7.1f} µs  "
              f"ratio {ta/tb:.2f}x  maxΔ {err:.1e}")


if __name__ == "__main__":
    main()
