"""Public API (C13): ``load_clip → predict gloss + logits`` plus model
construction, training and streaming entry points — the capability contract
of ``BASELINE.json:4``.

The defining TPU move (SURVEY.md §3.1): everything after host decode —
preprocess, backbone, temporal head — is ONE jit-compiled XLA program taking
staged uint8 frames and returning logits.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asltpu.config import (
    CONFIG_REGISTRY,
    I3DConfig,
    MobileNetV2GRUConfig,
    ModelConfig,
    PoseBiLSTMConfig,
    PreprocessConfig,
    ResNet18TransformerConfig,
    TwoStreamFusionConfig,
    get_config,
)
from asltpu.data.decode import DecodePool, decode_clip
from asltpu.data.prefetch import Prefetcher
from asltpu.models import (
    I3D,
    MobileNetV2GRU,
    PoseBiLSTM,
    ResNet18Transformer,
    TwoStreamFusion,
)
from asltpu.ops.preprocess import preprocess_clip


def build_module(cfg: ModelConfig):
    """Config dataclass → flax module instance."""
    if isinstance(cfg, MobileNetV2GRUConfig):
        return MobileNetV2GRU(
            num_classes=cfg.num_classes,
            width_mult=cfg.width_mult,
            gru_hidden=cfg.gru_hidden,
            gru_layers=cfg.gru_layers,
            dropout=cfg.dropout,
            dtype=cfg.compute_jnp_dtype,
        )
    if isinstance(cfg, ResNet18TransformerConfig):
        return ResNet18Transformer(
            num_classes=cfg.num_classes,
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            num_tx_layers=cfg.num_tx_layers,
            mlp_ratio=cfg.mlp_ratio,
            dropout=cfg.dropout,
            dtype=cfg.compute_jnp_dtype,
        )
    if isinstance(cfg, PoseBiLSTMConfig):
        return PoseBiLSTM(
            num_classes=cfg.num_classes,
            hidden=cfg.hidden_size,
            num_layers=cfg.num_layers,
            dropout=cfg.dropout,
        )
    if isinstance(cfg, I3DConfig):
        return I3D(
            num_classes=cfg.num_classes,
            dropout=cfg.dropout,
            remat=cfg.remat,
            dtype=cfg.compute_jnp_dtype,
        )
    if isinstance(cfg, TwoStreamFusionConfig):
        return TwoStreamFusion(
            num_classes=cfg.num_classes,
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            num_fusion_layers=cfg.num_fusion_layers,
            dropout=cfg.dropout,
            dtype=cfg.compute_jnp_dtype,
        )
    raise ValueError(f"unknown config type: {type(cfg)}")


@dataclasses.dataclass
class Model:
    """A built model: config + module + variables + compiled predict fn."""

    cfg: ModelConfig
    module: Any
    variables: Dict[str, Any]
    _predict_jit: Any = None

    @property
    def takes_rgb(self) -> bool:
        return not isinstance(self.cfg, PoseBiLSTMConfig)

    @property
    def takes_landmarks(self) -> bool:
        return isinstance(self.cfg, (PoseBiLSTMConfig, TwoStreamFusionConfig))

    def predict_fn(self):
        """The single XLA program: staged uint8 frames (and/or landmarks) →
        logits [B, num_classes]."""
        if self._predict_jit is not None:
            return self._predict_jit
        cfg = self.cfg
        module = self.module
        pp: Optional[PreprocessConfig] = getattr(cfg, "preprocess", None)

        if isinstance(cfg, PoseBiLSTMConfig):

            @jax.jit
            def fn(variables, landmarks):
                return module.apply(variables, landmarks, False)

        elif isinstance(cfg, TwoStreamFusionConfig):

            @jax.jit
            def fn(variables, frames_u8, landmarks):
                clip = preprocess_clip(frames_u8, pp)
                return module.apply(variables, clip, landmarks, False)

        else:

            @jax.jit
            def fn(variables, frames_u8):
                clip = preprocess_clip(frames_u8, pp)
                return module.apply(variables, clip, False)

        self._predict_jit = fn
        return fn


def load_model(
    name: str,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    **overrides,
) -> Model:
    """Build (and optionally restore) a model by config name.

    ``checkpoint`` may be an orbax directory or a torch ``.pt/.pth`` file
    (the C14 importer handles the latter for reference-weight parity).
    """
    cfg = get_config(name, **overrides)
    module = build_module(cfg)
    rng = jax.random.PRNGKey(seed)
    dummy = _dummy_inputs(cfg)
    variables = jax.jit(functools.partial(module.init, rng))(*dummy)
    model = Model(cfg=cfg, module=module, variables=variables)
    if checkpoint:
        from asltpu import ckpt as _ckpt

        if checkpoint.endswith((".pt", ".pth")):
            model.variables = _ckpt.load_torch_checkpoint(
                checkpoint, model.variables, cfg
            )
        else:
            model.variables = _ckpt.restore_variables(checkpoint, model.variables)
    return model


def _dummy_inputs(cfg: ModelConfig) -> Tuple[Any, ...]:
    if isinstance(cfg, PoseBiLSTMConfig):
        return (
            jnp.zeros((1, cfg.num_frames, cfg.num_landmarks, cfg.landmark_dim),
                      jnp.float32),
        )
    pp = cfg.preprocess  # type: ignore[attr-defined]
    clip = jnp.zeros((1, pp.num_frames, pp.crop, pp.crop, 3), jnp.float32)
    if isinstance(cfg, TwoStreamFusionConfig):
        lm = jnp.zeros((1, cfg.num_frames, cfg.num_landmarks, cfg.landmark_dim),
                       jnp.float32)
        return clip, lm
    return (clip,)


def load_clip(path: str, cfg: Optional[PreprocessConfig] = None) -> np.ndarray:
    """Decode + stage a video clip: path → uint8 [T, Hs, Ws, 3]
    (the host half of the ``load clip → predict`` contract)."""
    return decode_clip(path, cfg or PreprocessConfig())


def predict(
    model: Model,
    clip: np.ndarray,
    landmarks: Optional[np.ndarray] = None,
    gloss_names: Optional[Sequence[str]] = None,
) -> Tuple[Any, np.ndarray]:
    """Staged frames [T,Hs,Ws,3] or [B,T,Hs,Ws,3] → (gloss ids/names, logits).

    The device side is one XLA program (preprocess → backbone → head).
    """
    fn = model.predict_fn()
    batched = clip.ndim == 5 if model.takes_rgb else clip.ndim == 4
    add_batch = not batched
    if add_batch:
        clip = clip[None]
        if landmarks is not None:
            landmarks = landmarks[None]
    if isinstance(model.cfg, PoseBiLSTMConfig):
        logits = fn(model.variables, jnp.asarray(clip))
    elif isinstance(model.cfg, TwoStreamFusionConfig):
        if landmarks is None:
            raise ValueError("two_stream model requires landmarks")
        logits = fn(model.variables, jnp.asarray(clip), jnp.asarray(landmarks))
    else:
        logits = fn(model.variables, jnp.asarray(clip))
    logits = np.asarray(jax.device_get(logits))
    ids = logits.argmax(axis=-1)
    glosses: Any = ids
    if gloss_names is not None:
        glosses = [gloss_names[i] for i in ids]
    if add_batch:
        return (glosses[0], logits[0])
    return glosses, logits


def stream_predict(
    model: Model,
    paths: Sequence[str],
    batch_size: int = 8,
    num_decode_workers: int = 4,
    landmarks_for: Optional[Any] = None,
    gloss_names: Optional[Sequence[str]] = None,
    prefetch_depth: int = 2,
    skip_errors: bool = False,
) -> Iterator[Tuple[str, Any, np.ndarray]]:
    """Batched streaming inference (config #5 contract, SURVEY.md §3.4):
    decode workers → double-buffered prefetch → jitted predict; yields
    (path, gloss, logits) as batches complete.

    ``landmarks_for``: optional callable path → [T,543,3] landmarks, required
    for landmark-consuming models.
    """
    pp: PreprocessConfig = getattr(model.cfg, "preprocess", PreprocessConfig())
    fn = model.predict_fn()

    # Items may be video paths or ClipRecords (frame segment + bbox honored
    # by the decode pool); results are keyed by the display path either way.
    items = list(paths)
    paths = [it.path if hasattr(it, "path") else it for it in items]

    needs_lm = model.takes_landmarks
    pose_only = isinstance(model.cfg, PoseBiLSTMConfig)
    on_error = "skip" if skip_errors else "raise"

    def load_lm(path):
        """landmarks_for with skip_errors semantics (None on failure)."""
        try:
            return landmarks_for(path)
        except Exception:
            if not skip_errors:
                raise
            from asltpu.utils.logging import get_logger

            get_logger("asltpu.stream").warning(
                "skipping clip with unloadable landmarks: %s", path,
                exc_info=True,
            )
            return None

    if pose_only:
        if landmarks_for is None:
            raise ValueError(
                "pose models stream from landmarks: pass landmarks_for="
            )

        # No video decode or DecodePool needed: batch landmarks directly.
        def host_batches():
            for i in range(0, len(paths), batch_size):
                loaded = [
                    (i + j, lm)
                    for j, lm in enumerate(
                        load_lm(p) for p in paths[i : i + batch_size]
                    )
                    if lm is not None
                ]
                if not loaded:
                    continue
                lms = np.stack([lm for _, lm in loaded])
                pad = batch_size - len(loaded)
                if pad:
                    lms = np.concatenate(
                        [lms, np.repeat(lms[-1:], pad, axis=0)]
                    )
                yield (lms, np.asarray([k for k, _ in loaded], np.int32))

        for lms, kept in Prefetcher(host_batches(), depth=prefetch_depth):
            logits = fn(model.variables, lms)
            kept = np.asarray(jax.device_get(kept))
            logits = np.asarray(jax.device_get(logits))[: len(kept)]
            ids = logits.argmax(axis=-1)
            for j, k in enumerate(kept):
                gloss = gloss_names[ids[j]] if gloss_names else int(ids[j])
                yield paths[int(k)], gloss, logits[j]
        return

    pool = DecodePool(pp, num_workers=num_decode_workers)

    def host_batches():
        for frames, kept in pool.map_batches(items, batch_size, on_error):
            if needs_lm:
                # Load landmarks per kept clip; a failed load drops the clip
                # (row) under skip_errors. The batch is re-padded to the
                # compiled batch_size afterwards.
                loaded = []
                for row, k in enumerate(kept):
                    lm = load_lm(paths[k])
                    if lm is not None:
                        loaded.append((k, row, lm))
                if not loaded:
                    continue
                rows = [row for _, row, _ in loaded]
                frames_sel = frames[rows]
                lms = np.stack([lm for _, _, lm in loaded])
                pad = frames.shape[0] - len(loaded)
                if pad > 0:
                    frames_sel = np.concatenate(
                        [frames_sel, np.repeat(frames_sel[-1:], pad, axis=0)]
                    )
                    lms = np.concatenate(
                        [lms, np.repeat(lms[-1:], pad, axis=0)]
                    )
                kept = [k for k, _, _ in loaded]
                yield (frames_sel, lms, np.asarray(kept, np.int32))
            else:
                yield (frames, np.asarray(kept, np.int32))

    try:
        for item in Prefetcher(host_batches(), depth=prefetch_depth):
            if needs_lm:
                frames, lms, kept = item
                logits = fn(model.variables, frames, lms)
            else:
                frames, kept = item
                logits = fn(model.variables, frames)
            kept = np.asarray(jax.device_get(kept))
            logits = np.asarray(jax.device_get(logits))[: len(kept)]
            ids = logits.argmax(axis=-1)
            for j, k in enumerate(kept):
                gloss = gloss_names[ids[j]] if gloss_names else int(ids[j])
                yield paths[int(k)], gloss, logits[j]
    finally:
        pool.shutdown()
