"""Space-to-depth rewrite of the I3D stem conv (7×7×7, stride 2, SAME).

The first conv of an RGB network is the classic TPU efficiency hole: 3
input channels give the MXU a contraction depth of 3 per spatial tap, so
XLA runs it far below roofline (measured 2026-08-19 on 1× v5e, bf16,
[4,64,224,224,3]→64ch: 17.5 ms ≈ 12 TF/s ≈ 6% MXU — HALF the whole I3D
forward). The standard fix (MLPerf ResNet-50 stem trick, extended here to
3D) is an EXACT algebraic rewrite: split every stride-2 axis into
even/odd phases packed into channels (T,H,W factor 2 → 24 channels), and
convolve stride-1 with the correspondingly re-indexed kernel.

Derivation (per axis, kernel 7, stride 2, SAME ⇒ pad 2 lo / 3 hi for even
input length L, output L/2):

    y[o] = Σ_{k=0..6} w[k] · x[2o + k − 2]

Split x by parity, x_e[m]=x[2m], x_o[m]=x[2m+1]:

    k even (0,2,4,6): 2o+k−2 = 2(o + k/2 − 1)      → x_e at offsets −1..2
    k odd  (1,3,5):   2o+k−2 = 2(o + (k−3)/2) + 1  → x_o at offsets −1..1

i.e. a kernel-4, stride-1 conv over each phase (the odd phase's 4th tap is
zero), with pad 1 lo / 2 hi. The packed kernel is literally the original
kernel zero-padded 7→8 and reshaped — no arithmetic:

    w8 = pad(w, 7→8 on each conv axis)
    w' = w8.reshape(4,2, 4,2, 4,2, Cin, Cout)         # k = 2·i + parity
           .transpose(it,ih,iw, Cin, pt,ph,pw, Cout)
           .reshape(4,4,4, Cin·8, Cout)

FLOPs grow 8·4³/7³ ≈ 1.49× (the zero taps), but the contraction depth per
tap grows 8× and the measured wall time DROPS: 17.5 → 12.6 ms (1.39×) at
the contract stem shape — whole-model I3D inference 126 → 156 clips/s and
train step 112 → 68 ms. Exactness is machine-checked (values AND
gradients) in tests/unit/test_stem_s2d.py.

Measured NEGATIVE for the 2D stems (2026-08-19, v5e, 512×224² bf16,
single-dispatch): the same rewrite is SLOWER in 2D — ResNet-18 7×7/s2
stem 2.21 → 3.25 ms (0.68×), MobileNetV2 3×3/s2 stem 1.14 → 2.50 ms
(0.46×). XLA's 2D stride-2 conv already runs these small stems well and
the parity-pack transposes dominate; only the 3D 7³ stem (8× stride
volume, HALF the model's wall time) is degenerate enough to win. The 2D
models therefore keep their plain convs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def parity_pack(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Split ``axis`` (even length) into even/odd phases appended to the
    trailing channel axis: length L → L/2, channels ×2 (even phase first)."""
    sh = list(x.shape)
    sh[axis:axis + 1] = [sh[axis] // 2, 2]
    x = x.reshape(sh)
    perm = [d for d in range(x.ndim) if d != axis + 1] + [axis + 1]
    x = x.transpose(perm)
    ns = list(x.shape)
    return x.reshape(ns[:-2] + [ns[-2] * ns[-1]])


def s2d_kernel7(w: jnp.ndarray) -> jnp.ndarray:
    """[7,7,7,Cin,Cout] → [4,4,4,Cin·8,Cout] for the parity-packed input
    (channel order Cin slow, then pT, pH, pW fast — matching parity_pack
    applied to T, then H, then W)."""
    cin, cout = w.shape[3], w.shape[4]
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    return (
        w8.reshape(4, 2, 4, 2, 4, 2, cin, cout)
        .transpose(0, 2, 4, 6, 1, 3, 5, 7)
        .reshape(4, 4, 4, cin * 8, cout)
    )


def stem_conv3d_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """EXACT equivalent of ``conv3d(x, w, strides=(2,2,2), padding=SAME)``
    for a [7,7,7,Cin,Cout] kernel on even T/H/W — via the space-to-depth
    packing above. Caller guarantees even dims ≥ 2 (I3D contract shapes:
    64×224²; the model falls back to the plain conv otherwise)."""
    for ax in (1, 2, 3):
        x = parity_pack(x, ax)
    wq = s2d_kernel7(w).astype(x.dtype)
    dn = lax.conv_dimension_numbers(x.shape, wq.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, wq, (1, 1, 1), [(1, 2), (1, 2), (1, 2)], dimension_numbers=dn
    )
