"""Fused MBConv (inverted-residual) Pallas kernel — the MobileNetV2 hot
path, fused to cut HBM traffic.

A stride-1 MBConv block is ``project(dw3x3(expand(x)))`` with ReLU6 between
stages and a residual add. XLA runs the three convolutions as separate
HLOs, so the 6×-expanded activation tensor is written to and re-read from
HBM — on a bandwidth-bound model that IS the cost (XLA cost analysis:
6.3 GB accessed per 512-frame batch for the backbone). This kernel keeps
the expanded tensor in VMEM:

  grid: (N,) — one program per image; Pallas pipelines the whole padded
  image block into VMEM (manual HBM DMA is off the table: Mosaic requires
  128-aligned slice shapes and MobileNet channels are 16–96).
  Inside the kernel a STATIC python loop walks row tiles:
    expand (1×1, MXU) → halo-ring mask → depthwise 3×3 (nine shifted
    VPU MACs) → project (1×1, MXU) → residual add → write tile.
  Only x and out touch HBM; the 6× expanded tile lives and dies in VMEM.

BN folding happens at call time (inference semantics): conv weights absorb
``scale/sqrt(var+eps)``, biases absorb the rest (:func:`fold_bn`).

Validated vs the flax InvertedResidual block in interpret mode AND compiled
on TPU v5e (tests/unit/test_mbconv_pallas.py; bench in scripts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold BatchNorm into a conv kernel + bias (inference).

    kernel: [..., Cout]; returns (kernel·s, bias_fold) with
    s = scale/sqrt(var+eps), bias_fold = bias − mean·s.
    """
    s = scale / jnp.sqrt(var + eps)
    return kernel * s, bias - mean * s


def _make_kernel(tr: int, h: int, w: int, use_res: bool):
    n_tiles = h // tr

    def kernel(
        x_ref,  # [1, Hp, Wp, Cin] VMEM (zero-padded input, this image)
        w1_ref,  # [Cin, Ce]
        b1_ref,  # [1, Ce]
        dw_ref,  # [9, Ce]
        b2_ref,  # [1, Ce]
        w2_ref,  # [Ce, Cout]
        b3_ref,  # [1, Cout]
        res_ref,  # [1, H, W, Cin] VMEM residual input
        out_ref,  # [1, H, W, Cout] VMEM
    ):
        ce = w1_ref.shape[1]
        cin = x_ref.shape[-1]
        wp = w + 2
        tile_rows = tr + 2

        for t in range(n_tiles):  # static loop — fully unrolled program
            r0 = t * tr  # padded-array row of the tile's halo start
            xp = x_ref[0, r0 : r0 + tile_rows].astype(jnp.float32)
            e = jnp.dot(
                xp.reshape(tile_rows * wp, cin),
                w1_ref[:],
                preferred_element_type=jnp.float32,
            )
            e = jnp.clip(e + b1_ref[:], 0.0, 6.0).reshape(tile_rows, wp, ce)
            # Halo ring originating from the zero-pad must stay ZERO through
            # the depthwise conv, but 1×1-conv(0) = relu6(b1): mask the pad
            # columns (always) and the pad row on global edges (static).
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, wp, 1), 1)
            e = jnp.where((col == 0) | (col == wp - 1), 0.0, e)
            row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, wp, 1), 0)
            if t == 0:
                e = jnp.where(row == 0, 0.0, e)
            if t == n_tiles - 1:
                e = jnp.where(row == tile_rows - 1, 0.0, e)
            acc = jnp.zeros((tr, w, ce), jnp.float32)
            for dr in range(3):
                for dc in range(3):
                    acc = acc + (
                        e[dr : dr + tr, dc : dc + w, :] * dw_ref[dr * 3 + dc]
                    )
            acc = jnp.clip(acc + b2_ref[:], 0.0, 6.0)
            p = jnp.dot(
                acc.reshape(tr * w, ce),
                w2_ref[:],
                preferred_element_type=jnp.float32,
            )
            p = (p + b3_ref[:]).reshape(tr, w, -1)
            if use_res:
                p = p + res_ref[0, r0 : r0 + tr].astype(jnp.float32)
            out_ref[0, r0 : r0 + tr] = p.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("use_res", "row_tile", "interpret")
)
def fused_mbconv_s1(
    x: jax.Array,  # [N, H, W, Cin]
    w1: jax.Array,  # [Cin, Ce] folded expand kernel
    b1: jax.Array,  # [Ce]
    dw: jax.Array,  # [3, 3, Ce] folded depthwise kernel
    b2: jax.Array,  # [Ce]
    w2: jax.Array,  # [Ce, Cout] folded project kernel
    b3: jax.Array,  # [Cout]
    use_res: bool = True,
    row_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Stride-1 MBConv block, fused. Residual applies when Cin == Cout."""
    from jax.experimental import pallas as pl

    n, h, w, cin = x.shape
    ce = w1.shape[1]
    cout = w2.shape[1]
    use_res = bool(use_res and (cin == cout))
    tr = min(row_tile, h)
    assert h % tr == 0, (h, tr)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = dict(memory_space=pltpu.VMEM)
    except ImportError:  # pragma: no cover
        vmem = {}

    kernel = _make_kernel(tr, h, w, use_res)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0), **vmem),
            pl.BlockSpec((cin, ce), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, ce), lambda i: (0, 0), **vmem),
            pl.BlockSpec((9, ce), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, ce), lambda i: (0, 0), **vmem),
            pl.BlockSpec((ce, cout), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, cout), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0), **vmem),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0), **vmem),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        interpret=interpret,
    )(
        xp,
        w1.astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        dw.reshape(9, -1).astype(jnp.float32),
        b2.reshape(1, -1).astype(jnp.float32),
        w2.astype(jnp.float32),
        b3.reshape(1, -1).astype(jnp.float32),
        x,  # residual source (unused by the kernel when use_res=False)
    )
    return out
