"""Typed configuration dataclasses — one per capability config.

The five configs mirror the reference's capability contract
(``BASELINE.json:6-11``; the reference snapshot itself has no config system —
``SURVEY.md`` §5.6):

  1. ``pose_bilstm``      — 543-landmark features + 2-layer BiLSTM, WLASL-100.
  2. ``mobilenet_gru``    — MobileNetV2 per-frame + GRU head, 16×224² clips.
  3. ``resnet_transformer`` — ResNet-18 + 4-layer transformer head, 32-frame,
     WLASL-300.
  4. ``i3d``              — I3D 3D-conv backbone, WLASL-2000, 64-frame,
     train + eval.
  5. ``two_stream``       — RGB + keypoint cross-attention fusion, batched
     streaming inference.

All configs are plain frozen dataclasses (hashable → usable as jit static
args) and YAML/dict-overridable via :func:`get_config`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# ImageNet statistics, the standard normalization for all RGB backbones.
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)

# MediaPipe Holistic layout: 33 pose + 468 face + 2×21 hands = 543 landmarks.
NUM_LANDMARKS = 543
LANDMARK_DIM = 3  # (x, y, z) normalized coordinates


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """The decode→tensor pipeline (``BASELINE.json:4``): uniform temporal
    sampling, bilinear resize, center-crop, mean-std normalize → NHWC."""

    num_frames: int = 16
    # Frames arrive from the host decoder at this staging resolution
    # (uint8 HWC). The device kernel resizes so the short side is
    # `resize_short`, then center-crops to `crop`².
    staging_size: Tuple[int, int] = (256, 256)  # (H, W) of host-staged frames
    resize_short: int = 256
    crop: int = 224
    # Transfer-thin mode: the host decoder performs the short-side resize
    # (to `host_resize_short`) AND the center crop to `staging_size` before
    # transfer, so only crop²·T uint8 bytes cross host→device (the device
    # then only normalizes). Mathematically the same pipeline; used when the
    # host→device link, not compute, is the bottleneck (this v5e host's
    # relay caps at ~37 MB/s once a model is compiled). 0 = off.
    host_resize_short: int = 0
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    out_dtype: str = "bfloat16"  # compute dtype the backbone consumes
    use_pallas: bool = True  # fused Pallas kernel vs. jnp reference path
    # Wire format of staged frames. "yuv420" stages I420 planes (1.5 bytes
    # per pixel instead of 3 — half the host→device traffic) and the device
    # kernel performs the BT.601 YUV→RGB conversion; the source containers
    # are 4:2:0-subsampled anyway, so chroma fidelity matches the video.
    # Requires even staging dims. "rgb" is the bit-parity default.
    staging_format: str = "rgb"  # "rgb" | "yuv420"

    def __post_init__(self):
        # One central guard for every consumer: the native decoders' C ABI
        # builds its sampling plan from num_frames and a non-positive value
        # used to reach undefined behavior there (empty want-list back()).
        if self.num_frames < 1:
            raise ValueError(
                f"num_frames must be >= 1; got {self.num_frames}"
            )

    @property
    def out_jnp_dtype(self):
        return jnp.dtype(self.out_dtype)

    @property
    def staged_frame_shape(self) -> Tuple[int, ...]:
        """Per-frame staged shape on the wire: (Hs, Ws, 3) for RGB or the
        packed I420 plane layout (Hs·3/2, Ws) for yuv420."""
        hs, ws = self.staging_size
        if self.staging_format == "yuv420":
            # The packed 2D view stores each half-resolution chroma plane as
            # hs//4 FULL-WIDTH rows (two half-width chroma rows per packed
            # row), so the height must divide by 4 — an even-but-not-%4
            # height would split U/V mid-row and fail with an opaque reshape
            # error inside the jitted preprocess.
            if hs % 4 or ws % 2:
                raise ValueError(
                    "yuv420 staging requires height % 4 == 0 and even width; "
                    f"got staging_size={self.staging_size}"
                )
            return (hs * 3 // 2, ws)
        return (hs, ws, 3)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "base"
    num_classes: int = 100
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"

    @property
    def compute_jnp_dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def param_jnp_dtype(self):
        return jnp.dtype(self.param_dtype)


@dataclasses.dataclass(frozen=True)
class PoseBiLSTMConfig(ModelConfig):
    """Config #1 (``BASELINE.json:6``): pose keypoints + 2-layer BiLSTM."""

    name: str = "pose_bilstm"
    num_classes: int = 100  # WLASL-100
    num_frames: int = 32
    num_landmarks: int = NUM_LANDMARKS
    landmark_dim: int = LANDMARK_DIM
    hidden_size: int = 256
    num_layers: int = 2
    dropout: float = 0.3
    # Recurrent heads run fp32: lax.scan over T amplifies bf16 error and the
    # step matmuls are small, so there is no MXU win to trade for it.
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class MobileNetV2GRUConfig(ModelConfig):
    """Config #2 (``BASELINE.json:7``): the north-star measurement config."""

    name: str = "mobilenet_gru"
    num_classes: int = 100  # WLASL-100 (north-star benchmark dataset)
    num_frames: int = 16
    width_mult: float = 1.0
    feature_dim: int = 1280
    gru_hidden: int = 512
    gru_layers: int = 1
    dropout: float = 0.2
    preprocess: PreprocessConfig = PreprocessConfig(num_frames=16)


@dataclasses.dataclass(frozen=True)
class ResNet18TransformerConfig(ModelConfig):
    """Config #3 (``BASELINE.json:8``): ResNet-18 + 4-layer transformer."""

    name: str = "resnet_transformer"
    num_classes: int = 300  # WLASL-300
    num_frames: int = 32
    feature_dim: int = 512
    d_model: int = 512
    num_heads: int = 8
    num_tx_layers: int = 4
    mlp_ratio: int = 4
    dropout: float = 0.1
    preprocess: PreprocessConfig = PreprocessConfig(num_frames=32)


@dataclasses.dataclass(frozen=True)
class I3DConfig(ModelConfig):
    """Config #4 (``BASELINE.json:9``): I3D fine-tune on WLASL-2000."""

    name: str = "i3d"
    num_classes: int = 2000  # WLASL-2000
    num_frames: int = 64
    dropout: float = 0.5
    # Gradient checkpointing over Inception blocks for 64-frame memory.
    remat: bool = True
    preprocess: PreprocessConfig = PreprocessConfig(num_frames=64)


@dataclasses.dataclass(frozen=True)
class TwoStreamFusionConfig(ModelConfig):
    """Config #5 (``BASELINE.json:10``): RGB+keypoint cross-attention fusion."""

    name: str = "two_stream"
    num_classes: int = 100
    num_frames: int = 16
    num_landmarks: int = NUM_LANDMARKS
    landmark_dim: int = LANDMARK_DIM
    d_model: int = 256
    num_heads: int = 8
    num_fusion_layers: int = 2
    dropout: float = 0.1
    # Width multiplier of the RGB-stream MobileNetV2 backbone (1.0 = the
    # torch-importable contract width; smaller for experiments/tests).
    width_mult: float = 1.0
    preprocess: PreprocessConfig = PreprocessConfig(num_frames=16)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters for the I3D fine-tune path (C12)."""

    batch_size: int = 8
    num_steps: int = 10_000
    learning_rate: float = 1e-3
    warmup_steps: int = 500
    weight_decay: float = 1e-4
    label_smoothing: float = 0.1
    grad_clip_norm: float = 1.0
    seed: int = 0
    log_every: int = 50
    eval_every: int = 1000
    ckpt_every: int = 1000
    ckpt_dir: str = "/tmp/asltpu_ckpt"
    ckpt_keep: int = 3
    # Model selection: besides the rolling last-``ckpt_keep`` step dirs,
    # keep ``ckpt_dir/best/`` = the checkpoint with the highest eval_top1
    # (only meaningful when periodic eval runs, i.e. eval_batches is given).
    keep_best: bool = True
    # Fault injection for resume testing (SURVEY.md §5.3): raise at this step.
    fault_inject_step: int = -1


CONFIG_REGISTRY = {
    "pose_bilstm": PoseBiLSTMConfig,
    "mobilenet_gru": MobileNetV2GRUConfig,
    "resnet_transformer": ResNet18TransformerConfig,
    "i3d": I3DConfig,
    "two_stream": TwoStreamFusionConfig,
}


def get_config(name: str, **overrides) -> ModelConfig:
    """Build a config by registry name with field overrides.

    Nested ``preprocess`` overrides may be passed as a dict.
    """
    cls = CONFIG_REGISTRY[name]
    if "preprocess" in overrides and isinstance(overrides["preprocess"], dict):
        base_pp = cls().preprocess  # type: ignore[attr-defined]
        overrides["preprocess"] = dataclasses.replace(
            base_pp, **overrides["preprocess"]
        )
    if cls is TwoStreamFusionConfig:
        # The fusion model aligns landmarks to the CLIP's frame count
        # (preprocess.num_frames); the top-level num_frames is a mirror of
        # it. Keep them consistent so e.g. preprocess={'num_frames': 32}
        # alone yields a config whose every reader sees T=32, and reject an
        # explicit contradiction at config time instead of as a misleading
        # shape error at init/serve time.
        if "num_frames" in overrides and "preprocess" not in overrides:
            # One-sided top-level override: unambiguous — sync the clip
            # pipeline to it (the same one-value rule, other direction).
            overrides["preprocess"] = dataclasses.replace(
                cls().preprocess, num_frames=overrides["num_frames"]
            )
        pp_t = (
            overrides["preprocess"].num_frames
            if "preprocess" in overrides
            else cls().preprocess.num_frames
        )
        if "num_frames" in overrides and overrides["num_frames"] != pp_t:
            raise ValueError(
                f"two_stream num_frames={overrides['num_frames']} contradicts "
                f"preprocess.num_frames={pp_t}; the fusion clip and landmark "
                "frame counts are one value — set preprocess={'num_frames': N}"
            )
        overrides["num_frames"] = pp_t
    return cls(**overrides)
