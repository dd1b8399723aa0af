"""asltpu — a TPU-native video ASL (word-level sign / gloss) recognition framework.

A from-scratch JAX / XLA / Pallas re-imagination of the capability set of the
reference repo ``sapphosraven/video-asl-recognition`` (whose snapshot contains
only ``README.md:1`` and ``.gitignore:1-5``; the capability contract is
``BASELINE.json`` — see ``SURVEY.md``).

Layers (SURVEY.md §1.3):
  - :mod:`asltpu.api`      — public API: ``load_clip``, ``predict``, ``train``.
  - :mod:`asltpu.models`   — flax models for the five configs.
  - :mod:`asltpu.ops`      — fused Pallas / XLA preprocessing + compute kernels.
  - :mod:`asltpu.data`     — host decode, WLASL index, double-buffered prefetch.
  - :mod:`asltpu.dist`     — device mesh + sharding (DP over ICI).
  - :mod:`asltpu.train`    — jit-compiled training loop (I3D fine-tune path).
  - :mod:`asltpu.ckpt`     — orbax checkpointing + torch ``.pt/.pth`` import.
  - :mod:`asltpu.export`   — deployment artifacts (serialized StableHLO
    inference program + weights; loads and runs with no model code).
"""

__version__ = "0.1.0"

from asltpu.config import (  # noqa: F401
    PreprocessConfig,
    PoseBiLSTMConfig,
    MobileNetV2GRUConfig,
    ResNet18TransformerConfig,
    I3DConfig,
    TwoStreamFusionConfig,
    get_config,
    CONFIG_REGISTRY,
)
