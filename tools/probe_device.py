"""Throttle-immune device probes (round-3 measurement campaign).

This host's TPU relay throttles *per-RPC* after its fast budget drains
(README "known environment limits"): any timing loop that issues one
device RPC per iteration measures relay latency, not device compute —
round-2/3 probes that timed per-call saw 25 s/iter of pure RPC noise.

Every probe here therefore issues ONE dispatch: the workload runs inside
``lax.fori_loop`` within a single jitted program (input created on-device,
iteration-dependent so XLA cannot hoist it; output reduced to one scalar
so the host fetch is 4 bytes). Wall-clock per iteration =
(t_call2 / iters): one RPC's latency is amortized over all iterations, so
the number is valid in ANY relay state.

Two further artifacts these probes neutralize (both measured round 3):
  - the relay acks ``block_until_ready`` EARLY — a loop that "measured"
    127 TB/s effective; only a device→host fetch bounds true wall-clock,
    so every timing here ends in a scalar ``device_get``;
  - each dispatch carries a fixed ~28 ms round-trip (amortize with enough
    iters: at 10 iters the apparent floor is ~2.8 ms/iter), and a
    CPU-contended host (1 CPU here) stretches that round-trip by SECONDS —
    run probes on an idle host only (a probe run concurrent with the
    pytest suite read 9.2 s/step for a step that takes 115 ms).

Usage:  python tools/probe_device.py
        {yuv,backbone,backbone_stages,i3d,int8} [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Repo root derived from this file, not hardcoded: a probe run from a
# different checkout/worktree must import ITS asltpu, not a stale copy.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_single_dispatch(run, x, label, work_per_iter, iters,
                           extra_args=()):
    """Compile+run once (untimed), then time ONE dispatch of the whole loop."""
    import jax

    # HOST FETCH, not block_until_ready: this relay acks readiness early
    # (README "known environment limits"); only a device→host copy of the
    # result bounds the true execution wall-clock.
    t0 = time.perf_counter()
    float(jax.device_get(run(x, *extra_args)))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jax.device_get(run(x, *extra_args)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.3f} ms/iter "
          f"({work_per_iter / dt / 1e9:.0f} GB/s eff) "
          f"[compile+first {t_compile:.1f}s, {iters} iters in one dispatch]",
          flush=True)
    return dt


def probe_yuv(iters: int) -> None:
    """Item: Pallas-lane-or-epitaph for the yuv420 staging path (VERDICT r2
    next-round #9). Measures the XLA yuv420 preprocess against a cast-only
    speed-of-light proxy on identical bytes."""
    import jax
    import jax.numpy as jnp

    from asltpu.config import PreprocessConfig
    from asltpu.ops.preprocess import (
        preprocess_clip_normalize_only,
        preprocess_clip_yuv420,
    )
    from asltpu.ops.preprocess_pallas import preprocess_clip_yuv420_pallas

    B, T = 32, 16
    pp = PreprocessConfig(num_frames=T, staging_size=(224, 224),
                          resize_short=224, host_resize_short=256,
                          staging_format="yuv420")
    shape = (B, T, 224 * 3 // 2, 224)
    in_b = B * T * shape[2] * shape[3]
    out_b = B * T * 224 * 224 * 3 * 2  # bf16 out

    def make(fn):
        @jax.jit
        def run(x):
            def body(i, acc):
                xi = x + i.astype(jnp.uint8)  # iteration-dependent input
                return acc + jnp.sum(fn(xi).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return run

    x = jax.jit(lambda: jnp.ones(shape, jnp.uint8))()
    jax.block_until_ready(x)
    work = in_b + out_b + out_b  # read in, write out, re-read for the sum
    dt_yuv = _timed_single_dispatch(
        make(lambda a: preprocess_clip_yuv420(a, pp)), x,
        "yuv420 preprocess (XLA)", work, iters)
    dt_pal = _timed_single_dispatch(
        make(lambda a: preprocess_clip_yuv420_pallas(a, pp)), x,
        "yuv420 preprocess (Pallas)", work, iters)

    # Speed-of-light proxy: cast+scale+sum over the SAME input bytes.
    def sol(a):
        return (a.astype(jnp.float32) * (1.0 / 255.0)).astype(jnp.bfloat16)
    sol_work = in_b + in_b * 2 + in_b * 2
    dt_sol = _timed_single_dispatch(make(sol), x, "cast-only SoL", sol_work,
                                    iters)

    # RGB thin path (normalize-only) for context: same output bytes.
    ppr = PreprocessConfig(num_frames=T, staging_size=(224, 224),
                           resize_short=224, host_resize_short=256,
                           staging_format="rgb")
    xr = jax.jit(lambda: jnp.ones((B, T, 224, 224, 3), jnp.uint8))()
    jax.block_until_ready(xr)
    rin = B * T * 224 * 224 * 3
    dt_rgb = _timed_single_dispatch(
        make(lambda a: preprocess_clip_normalize_only(a, ppr)), xr,
        "rgb normalize-only", rin + 2 * rin + 2 * rin, iters)
    print(f"yuv/SoL ratio: {dt_yuv / dt_sol:.2f}   pallas/SoL: "
          f"{dt_pal / dt_sol:.2f}   pallas speedup: {dt_yuv / dt_pal:.2f}x   "
          f"clips/s through stage: XLA {B / dt_yuv:.0f} / Pallas "
          f"{B / dt_pal:.0f}")


def probe_backbone(iters: int) -> None:
    """Item: backbone bandwidth gap (VERDICT r1 #3 / r2 next-round #7):
    MobileNetV2 fwd on 512×224² bf16 frames — target ≤9.5 ms, round-1
    measured 13.4 ms (per-RPC timing, suspect)."""
    import jax
    import jax.numpy as jnp

    from asltpu.api import load_model
    from asltpu.models.mobilenetv2 import MobileNetV2

    model = load_model("mobilenet_gru")
    cfg = model.cfg
    bb = MobileNetV2(cfg.width_mult, dtype=cfg.compute_jnp_dtype)
    v_bb = {"params": model.variables["params"]["backbone"]}
    stats = model.variables.get("batch_stats")
    if stats:
        v_bb["batch_stats"] = stats["backbone"]
    N = 512

    @jax.jit
    def run(x):
        def body(i, acc):
            xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            feats = bb.apply(v_bb, xi, False)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    x = jax.jit(
        lambda: jnp.zeros((N, 224, 224, 3), jnp.bfloat16))()
    jax.block_until_ready(x)
    gb = 6.27  # measured activation+weight traffic per 512-frame batch (r1)
    dt = _timed_single_dispatch(run, x, f"mobilenet {N}x224x224 bf16",
                                gb * 1e9, iters)
    print(f"  -> {dt * 1e3:.2f} ms / {N} frames "
          f"(target <=9.5; r1 per-RPC said 13.4); "
          f"standalone-equivalent {N / dt:.0f} clips/s at T=16 would be "
          f"{N / 16 / dt:.0f}")


def probe_i3d(iters: int) -> None:
    """Item: I3D contract-shape training steps/s in ANY link state
    (VERDICT r2 next-round #6): N train steps inside one dispatch via
    fori_loop over the step function (constant batch; throughput only)."""
    import jax
    import jax.numpy as jnp

    from asltpu.api import load_model
    from asltpu.config import TrainConfig
    from asltpu.train.loop import TrainState, make_optimizer, make_train_step

    model = load_model("i3d")
    tcfg = TrainConfig(batch_size=1)
    tx = make_optimizer(tcfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=model.variables["params"],
        batch_stats=model.variables.get("batch_stats", {}),
        opt_state=jax.jit(tx.init)(model.variables["params"]),
        rng=jax.random.PRNGKey(0),
    )
    step = make_train_step(model.module, tcfg)

    B, T, S = 1, 64, 224
    clip = jax.jit(lambda: jnp.zeros((B, T, S, S, 3), jnp.bfloat16))()
    labels = jax.jit(lambda: jnp.zeros((B,), jnp.int32))()
    jax.block_until_ready(clip)

    @jax.jit
    def run(state):
        def body(i, s):
            s2, metrics = step(s, clip, labels)
            return s2
        return jax.lax.fori_loop(0, iters, body, state)

    # Scalar host fetch (step counter) bounds true wall-clock — this relay
    # acks block_until_ready early (README "known environment limits").
    t0 = time.perf_counter()
    out = run(state)
    int(jax.device_get(out.step))
    t_compile = time.perf_counter() - t0
    # Warm with the EXACT argument that will be timed: the output state's
    # pytree differs from the input's in weak types, so `run(out)` would
    # RETRACE — a first version of this probe timed that recompile and
    # reported 7.9 s/step for a 115 ms step.
    out2 = run(out)
    int(jax.device_get(out2.step))
    t0 = time.perf_counter()
    out3 = run(out)
    int(jax.device_get(out3.step))
    dt = (time.perf_counter() - t0) / iters
    print(f"i3d train step (B=1, 64f, 224^2, remat): {dt * 1e3:.0f} ms/step "
          f"= {1 / dt:.2f} steps/s = {B / dt:.2f} clips/s "
          f"[compile+first {t_compile:.0f}s, {iters} steps in one dispatch]")



def probe_backbone_stages(iters: int) -> None:
    """Attribute the MobileNetV2 512-frame forward (~11-12.6 ms measured)
    across stages: each stage timed independently at its production shape
    with fresh params (VERDICT r2 next-round #7 — find where the 9.5 ms
    target dies before optimizing blindly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asltpu.models.common import ConvBN, relu6
    from asltpu.models.mobilenetv2 import InvertedResidual

    N = 512
    # (label, module, input shape [N,H,W,C])
    stages = [
        ("stem 3x3s2 3->32 @224", ConvBN(32, kernel=3, strides=2, act=relu6),
         (N, 224, 224, 3)),
        ("block0 t1 32->16 @112", InvertedResidual(16, 1, 1), (N, 112, 112, 32)),
        ("block1 t6 16->24 s2", InvertedResidual(24, 2, 6), (N, 112, 112, 16)),
        ("block2 t6 24->24 @56", InvertedResidual(24, 1, 6), (N, 56, 56, 24)),
        ("block3 t6 24->32 s2", InvertedResidual(32, 2, 6), (N, 56, 56, 24)),
        ("block4/5 t6 32->32 @28", InvertedResidual(32, 1, 6), (N, 28, 28, 32)),
        ("block6 t6 32->64 s2", InvertedResidual(64, 2, 6), (N, 28, 28, 32)),
        ("block7-9 t6 64->64 @14", InvertedResidual(64, 1, 6), (N, 14, 14, 64)),
        ("block10 t6 64->96 @14", InvertedResidual(96, 1, 6), (N, 14, 14, 64)),
        ("block11/12 t6 96->96 @14", InvertedResidual(96, 1, 6),
         (N, 14, 14, 96)),
        ("block13 t6 96->160 s2", InvertedResidual(160, 2, 6), (N, 14, 14, 96)),
        ("block14/15 t6 160->160 @7", InvertedResidual(160, 1, 6),
         (N, 7, 7, 160)),
        ("block16 t6 160->320 @7", InvertedResidual(320, 1, 6), (N, 7, 7, 160)),
        ("head 1x1 320->1280 @7", ConvBN(1280, kernel=1, act=relu6),
         (N, 7, 7, 320)),
    ]
    total = 0.0
    for label, mod, shape in stages:
        x = jax.jit(lambda shape=shape: jnp.zeros(shape, jnp.bfloat16))()
        jax.block_until_ready(x)
        v = mod.init(jax.random.PRNGKey(0), x, False)

        @jax.jit
        def run(x, v=v, mod=mod):
            def body(i, acc):
                xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                return acc + jnp.sum(mod.apply(v, xi, False).astype(
                    jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        in_b = 2 * int(np.prod(shape))
        dt = _timed_single_dispatch(run, x, label, in_b * 3, iters)
        total += dt
    print(f"sum of stages: {total * 1e3:.2f} ms (multiply repeated blocks: "
          f"+block4/5, +2x block7-9, +block11/12, +block14/15)")


def probe_int8(iters: int) -> None:
    """Last angle of the backbone-bandwidth item (VERDICT r2 next-round #7):
    would an int8 1×1-conv path help? The backbone's pointwise convs are
    [N·H·W, Cin]×[Cin, Cout] matmuls; int8 halves their operand bytes and
    the v5e MXU peaks 2× bf16 on int8. Each production matmul shape is
    timed bf16 vs int8 (``preferred_element_type=int32``) in one dispatch.

    MEASURED NEGATIVE (2026-08-17, healthy window, 30 iters/dispatch):
    only the 56² project 144->24 shape gains (1.71 -> 1.43 ms, 1.2×);
    56² expand 24->144 is SLOWER in int8 (1.38 -> 1.44 ms) and the four
    smaller shapes are within noise (1.1-1.3 ms both dtypes — a
    per-matmul floor, not operand bandwidth). Effective bandwidth tops
    out ~390 GB/s bf16 on the largest shape and HALVES in int8 (same
    wall-clock, half the bytes), i.e. these small-K matmuls are
    fusion/occupancy-bound, not HBM- or MXU-bound — halving operand
    bytes buys nothing, so no int8 inference path is built (would also
    cost a quantization accuracy study). See mobilenetv2.py docstring
    for the item's full closure."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    # (label, M=N*H*W, K=Cin, N=Cout) — the dominant pointwise convs at the
    # production 512-frame batch (from probe_backbone_stages attribution).
    shapes = [
        ("56² expand 24->144", 512 * 56 * 56, 24, 144),
        ("56² project 144->24", 512 * 56 * 56, 144, 24),
        ("28² expand 32->192", 512 * 28 * 28, 32, 192),
        ("14² expand 96->576", 512 * 14 * 14, 96, 576),
        ("7² expand 160->960", 512 * 7 * 7, 160, 960),
        ("head 320->1280", 512 * 7 * 7, 320, 1280),
    ]
    dn = (((1,), (0,)), ((), ()))
    for label, m, k, n in shapes:
        for dtype, acc_t in ((jnp.bfloat16, jnp.float32),
                             (jnp.int8, jnp.int32)):

            def make(dtype=dtype, acc_t=acc_t, m=m, k=k, n=n):
                @jax.jit
                def run(x, w):
                    def body(i, acc):
                        xi = x + i.astype(dtype)  # no hoisting
                        y = jax.lax.dot_general(
                            xi, w, dn, preferred_element_type=acc_t)
                        return acc + jnp.sum(y.astype(jnp.float32))
                    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
                return run

            x = jax.jit(lambda m=m, k=k, dtype=dtype:
                        jnp.ones((m, k), dtype))()
            w = jax.jit(lambda k=k, n=n, dtype=dtype:
                        jnp.ones((k, n), dtype))()
            jax.block_until_ready((x, w))
            itemsize = np.dtype(
                "int8" if dtype == jnp.int8 else "bfloat16").itemsize
            work = (m * k + k * n + m * n) * itemsize
            _timed_single_dispatch(
                make(), x, f"{label} [{np.dtype('int8').name if dtype == jnp.int8 else 'bf16'}] {m}x{k}x{n}",
                work, iters, extra_args=(w,))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("probe", choices=["yuv", "backbone", "backbone_stages",
                                      "i3d", "int8"])
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()
    iters = args.iters or {"yuv": 50, "backbone": 20, "backbone_stages": 30,
                           "i3d": 8, "int8": 30}[args.probe]
    {"yuv": probe_yuv, "backbone": probe_backbone,
     "backbone_stages": probe_backbone_stages, "i3d": probe_i3d,
     "int8": probe_int8}[args.probe](iters)
    return 0


if __name__ == "__main__":
    sys.exit(main())
