"""asltpu.ops — device-side kernels (Pallas + XLA) for the hot paths.

The reference delegated its preprocessing to OpenCV's C++ SIMD loops
(SURVEY.md §2.3); here that work is a fused TPU kernel
(:mod:`asltpu.ops.preprocess_pallas`) with a jnp reference implementation
(:mod:`asltpu.ops.preprocess`) used as the correctness oracle and fallback.
"""

from asltpu.ops.preprocess import (  # noqa: F401
    uniform_sample_indices,
    preprocess_clip,
    preprocess_clip_jnp,
)
from asltpu.ops.recurrent import lstm_layer, gru_layer, bilstm  # noqa: F401
