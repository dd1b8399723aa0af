"""Temporal classification heads: GRU (C7) and 4-layer transformer encoder
(C9) over per-frame feature sequences.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from asltpu.ops.recurrent import gru_layer


class GRUHead(nn.Module):
    """GRU over [B, T, F] features → logits (``BASELINE.json:7``).

    Recurrence runs fp32 (scan over T amplifies low-precision error; the
    per-step matmul is small so there is no MXU win to trade). Input
    projections for all T steps are hoisted into one MXU matmul — see
    asltpu.ops.recurrent.
    """

    num_classes: int
    hidden: int = 512
    num_layers: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats.astype(jnp.float32)
        f_in = x.shape[-1]
        h_last = None
        for layer in range(self.num_layers):
            fan_in = f_in if layer == 0 else self.hidden
            k = float(1.0 / self.hidden**0.5)

            def init(key, shape, dtype=jnp.float32):
                # torch RNN default: U(-1/sqrt(H), 1/sqrt(H))
                return jax.random.uniform(key, shape, dtype, -k, k)

            def p(name, shape):
                return self.param(f"l{layer}_{name}", init, shape)

            params = {
                "wi": p("wi", (fan_in, 3 * self.hidden)),
                "wh": p("wh", (self.hidden, 3 * self.hidden)),
                "bi": p("bi", (3 * self.hidden,)),
                "bh": p("bh", (3 * self.hidden,)),
            }
            x, h_last = gru_layer(x, params)
            if layer < self.num_layers - 1:
                # torch nn.GRU(dropout=...) semantics: dropout on each
                # layer's output sequence except the last.
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(h_last)
        return nn.Dense(self.num_classes, param_dtype=jnp.float32, name="fc")(x)


class TransformerHead(nn.Module):
    """4-layer pre-LN transformer encoder over frame tokens with a learned
    CLS token and learned positional embeddings (``BASELINE.json:8``).
    Sequence length ≤ 64 tokens → plain full attention by design
    (SURVEY.md §5.7: no sequence-parallel machinery at T≤64).
    """

    num_classes: int
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 4
    mlp_ratio: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        b, t, f = feats.shape
        x = feats.astype(self.dtype)
        if f != self.d_model:
            x = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                         name="in_proj")(x)
        cls = self.param(
            "cls", nn.initializers.truncated_normal(0.02), (1, 1, self.d_model),
            jnp.float32,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.d_model)).astype(self.dtype), x], axis=1)
        pos = self.param(
            "pos", nn.initializers.truncated_normal(0.02), (1, t + 1, self.d_model),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.num_layers):
            x = _EncoderBlock(
                self.d_model, self.num_heads, self.mlp_ratio, self.dropout,
                self.dtype, name=f"layer{i}",
            )(x, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="final_ln")(x)
        cls_out = x[:, 0].astype(jnp.float32)
        return nn.Dense(self.num_classes, param_dtype=jnp.float32, name="fc")(cls_out)


class _EncoderBlock(nn.Module):
    d_model: int
    num_heads: int
    mlp_ratio: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="attn",
        )(y, y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln2")(x)
        y = nn.Dense(self.d_model * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(y)
        y = nn.gelu(y, approximate=False)  # exact erf (torch parity)
        y = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y
