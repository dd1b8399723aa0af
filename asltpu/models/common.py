"""Shared flax building blocks for the model zoo."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    """Conv → BatchNorm → optional activation, NHWC.

    BatchNorm keeps fp32 running stats; compute runs in `dtype` (bf16 on TPU)
    so the conv lands on the MXU and XLA fuses the BN+activation epilogue.
    """

    features: int
    kernel: Union[int, Tuple[int, ...]] = 3
    strides: Union[int, Tuple[int, ...]] = 1
    groups: int = 1
    act: Optional[Callable] = nn.relu
    # None → torch-style symmetric k//2 padding (torchvision parity: differs
    # from TF-"SAME" at stride 2). I3D passes "SAME" (TF-origin model).
    padding: Union[None, str, int, Sequence[Tuple[int, int]]] = None
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = (
            (self.kernel,) * (x.ndim - 2) if isinstance(self.kernel, int) else self.kernel
        )
        strides = (
            (self.strides,) * (x.ndim - 2)
            if isinstance(self.strides, int)
            else self.strides
        )
        padding = self.padding
        if padding is None:
            padding = [(k // 2, k // 2) for k in kernel]
        elif isinstance(padding, int):
            padding = [(padding, padding)] * (x.ndim - 2)
        x = nn.Conv(
            self.features,
            kernel,
            strides=strides,
            padding=padding,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def relu6(x):
    return jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))


def merge_time_into_batch(x):
    """[B, T, ...] → ([B·T, ...], (B, T)) — per-frame 2D backbones run all
    frames as one large batch so the MXU sees big matmuls."""
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:]), (b, t)


def split_time_from_batch(x, bt):
    b, t = bt
    return x.reshape((b, t) + x.shape[1:])
