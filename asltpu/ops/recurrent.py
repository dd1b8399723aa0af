"""TPU-shaped recurrent layers (LSTM / GRU) built on ``jax.lax.scan``.

The reference family used cuDNN's fused RNN kernels via ``torch.nn.LSTM/GRU``
(SURVEY.md §2.3 native-component mapping). On TPU the idiomatic equivalent is:

  - **Hoist the input projections out of the time loop**: compute
    ``x @ W_i`` for all T steps as ONE [B·T, F]×[F, G·H] matmul (MXU-friendly,
    large and batched), so the scan body is only ``h @ W_h`` + element-wise
    gate math. This is the standard speed-of-light RNN decomposition for
    systolic-array hardware — the serial part touches the minimum FLOPs.
  - ``lax.scan`` for the recurrence (compiled once, no Python loop).
  - fp32 gate math (scan over T amplifies bf16 rounding).

Gate ordering and bias conventions follow torch exactly (LSTM: i,f,g,o;
GRU: r,z,n with the reset gate applied *after* the hidden matmul and separate
input/hidden biases), so the C14 weight importer is a pure transpose — the
fp32-tolerance parity clause of ``BASELINE.json:4`` fails at gate-order
mismatches first (SURVEY.md §7.3.3).

Parameters are plain pytrees (dicts), used by the flax modules in
``asltpu.models`` via ``nn.Module.param``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


Array = jax.Array
LSTMParams = Dict[str, Array]  # {"wi": [F,4H], "wh": [H,4H], "b": [4H]}
GRUParams = Dict[str, Array]  # {"wi": [F,3H], "wh": [H,3H], "bi": [3H], "bh": [3H]}


def _lstm_scan(
    x_proj: Array,  # [B, T, 4H] — precomputed x @ wi + b
    wh: Array,  # [H, 4H]
    h0: Array,  # [B, H]
    c0: Array,  # [B, H]
    reverse: bool = False,
) -> Tuple[Array, Tuple[Array, Array]]:
    """Scan the LSTM recurrence. Gate order i,f,g,o (torch)."""
    hidden = wh.shape[0]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ wh  # [B, 4H]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H] — scan over leading axis
    # Unroll: each step is a tiny [B,H]×[H,4H] matmul; loop-iteration
    # overhead would dominate at T≤64 (measured 2.5 ms → sub-ms at T=16).
    (h_f, c_f), hs = jax.lax.scan(
        step, (h0, c0), xs, reverse=reverse, unroll=min(xs.shape[0], 8)
    )
    del hidden
    return jnp.swapaxes(hs, 0, 1), (h_f, c_f)  # [B, T, H]


def lstm_layer(
    x: Array,  # [B, T, F]
    params: LSTMParams,
    reverse: bool = False,
    init: Optional[Tuple[Array, Array]] = None,
) -> Tuple[Array, Tuple[Array, Array]]:
    """One unidirectional LSTM layer. Returns ([B,T,H] outputs, (h_T, c_T)).

    The [B·T, F] input projection runs as a single MXU matmul outside the
    scan; only [B, H]×[H, 4H] remains inside.
    """
    b, t, f = x.shape
    h = params["wh"].shape[0]
    x32 = x.astype(jnp.float32)
    x_proj = (x32.reshape(b * t, f) @ params["wi"] + params["b"]).reshape(b, t, -1)
    if init is None:
        h0 = jnp.zeros((b, h), jnp.float32)
        c0 = jnp.zeros((b, h), jnp.float32)
    else:
        h0, c0 = init
    return _lstm_scan(x_proj, params["wh"], h0, c0, reverse=reverse)


def bilstm(
    x: Array,  # [B, T, F]
    fwd: LSTMParams,
    bwd: LSTMParams,
) -> Array:
    """Bidirectional LSTM layer → [B, T, 2H] (torch ``bidirectional=True``
    concat convention: forward outputs then backward outputs)."""
    out_f, _ = lstm_layer(x, fwd, reverse=False)
    out_b, _ = lstm_layer(x, bwd, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)


def gru_layer(
    x: Array,  # [B, T, F]
    params: GRUParams,
    reverse: bool = False,
    init: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """One unidirectional GRU layer (torch semantics: r,z,n gate order,
    reset gate applied after the hidden matmul, separate bi/bh biases).
    Returns ([B,T,H] outputs, h_T)."""
    b, t, f = x.shape
    h = params["wh"].shape[0]
    x32 = x.astype(jnp.float32)
    x_proj = (x32.reshape(b * t, f) @ params["wi"] + params["bi"]).reshape(b, t, -1)
    wh, bh = params["wh"], params["bh"]
    h0 = jnp.zeros((b, h), jnp.float32) if init is None else init

    def step(h_prev, xp):
        gh = h_prev @ wh + bh  # [B, 3H]
        gx_r, gx_z, gx_n = jnp.split(xp, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        n = jnp.tanh(gx_n + r * gh_n)
        h_new = (1.0 - z) * n + z * h_prev
        return h_new, h_new

    xs = jnp.swapaxes(x_proj, 0, 1)
    h_last, hs = jax.lax.scan(
        step, h0, xs, reverse=reverse, unroll=min(xs.shape[0], 8)
    )
    return jnp.swapaxes(hs, 0, 1), h_last
