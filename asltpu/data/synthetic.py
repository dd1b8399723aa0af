"""Dataset-free fixtures (SURVEY.md §4.2): synthetic WLASL index + cv2-written
videos, so tests and benches never need the (takedown-prone) real WLASL
downloads.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def write_video(
    path: str,
    num_frames: int = 24,
    size: Tuple[int, int] = (128, 128),
    fps: int = 25,
    seed: int = 0,
) -> np.ndarray:
    """Write a deterministic synthetic mp4; returns the raw RGB frames
    [T, H, W, 3] uint8 that were encoded (pre-codec-loss)."""
    if cv2 is None:
        raise RuntimeError("cv2 required to write synthetic videos")
    h, w = size
    rng = np.random.default_rng(seed)
    # Smooth moving-gradient content (codec-friendly; random noise destroys
    # any decode-parity tolerance).
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.empty((num_frames, h, w, 3), dtype=np.uint8)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    freq = rng.uniform(0.02, 0.08, size=3)
    for t in range(num_frames):
        for c in range(3):
            img = 127.5 + 110 * np.sin(
                freq[c] * (xx + yy) + phase[c] + 0.3 * t
            )
            frames[t, ..., c] = np.clip(img, 0, 255).astype(np.uint8)
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise IOError(f"cannot open video writer for {path}")
    for t in range(num_frames):
        writer.write(frames[t, ..., ::-1])  # RGB → BGR for the encoder
    writer.release()
    return frames


def make_synthetic_wlasl(
    root: str,
    num_glosses: int = 100,
    clips_per_gloss: int = 1,
    num_frames: int = 24,
    size: Tuple[int, int] = (128, 128),
    splits: Optional[List[str]] = None,
) -> Tuple[str, str]:
    """Create a tiny WLASL-shaped dataset under ``root``.

    Returns (index_json_path, video_dir). EVERY listed instance gets a real
    video file on disk (tests that need missing-video entries delete files
    or add index entries themselves — WLASLIndex's present-only filtering
    is exercised that way in tests/unit/test_data.py).
    """
    video_dir = os.path.join(root, "videos")
    os.makedirs(video_dir, exist_ok=True)
    splits = splits or ["train"]
    entries = []
    vid = 0
    for g in range(num_glosses):
        instances = []
        for c in range(clips_per_gloss):
            video_id = f"{vid:05d}"
            split = splits[c % len(splits)]
            write_video(
                os.path.join(video_dir, video_id + ".mp4"),
                num_frames=num_frames,
                size=size,
                seed=vid,
            )
            instances.append(
                {"video_id": video_id, "split": split, "frame_start": 1,
                 "frame_end": -1, "fps": 25}
            )
            vid += 1
        entries.append({"gloss": f"gloss_{g:04d}", "instances": instances})
    index_path = os.path.join(root, "WLASL_synthetic.json")
    with open(index_path, "w") as f:
        json.dump(entries, f)
    return index_path, video_dir


def write_separable_video(
    path: str,
    gloss_id: int,
    num_glosses: int,
    num_frames: int = 24,
    size: Tuple[int, int] = (96, 96),
    fps: int = 25,
    seed: int = 0,
    hue_rate: float = 0.0,
    hard: bool = False,
) -> None:
    """Write a video whose GLOSS is decodable from its content — the
    learnable synthetic task behind the training-path proof (round-4
    VERDICT item #1: every prior test showed loss decreasing, none showed
    the full loader → augment → step → eval path can drive a model from
    chance to high accuracy; a subtly wrong gradient/label path passes
    loss-goes-down tests).

    Class signal: a hue direction on the color circle — mean channel values
    ``127.5 + 60·w_c`` with ``w = cos(θ), cos(θ∓2π/3)`` and
    ``θ = 2π·gloss/num_glosses``. Chosen to SURVIVE the whole production
    path: mp4 4:2:0 chroma subsampling (mean color, not texture), uniform
    temporal sampling (static in time), random resized crop and hflip
    (global, not positional), brightness jitter (shifts channels equally),
    contrast jitter (scales channel differences, preserving direction).

    Everything else is per-clip nuisance drawn from ``seed`` — gradient
    orientation, spatial frequency, motion speed/phase, texture amplitude —
    so a model cannot fit clip identity and must learn the class signal.

    ``hue_rate`` (radians/frame) rotates the hue angle OVER TIME:
    ``θ(t) = θ₀ + hue_rate·t``. A dataset whose label encodes the rate as
    well as the base hue (see :func:`make_separable_wlasl_grid`) is only
    solvable by a model that integrates color over the sampled frames IN
    ORDER — a purely per-frame (or order-blind pooled) readout cannot
    separate ±rate pairs. ``hard=True`` adds the round-5 nuisance tier
    (VERDICT r4 item #10 "harder nuisances"): per-clip per-channel gain
    jitter (±12%, a white-balance error the hue readout must be robust
    to), a global brightness offset (±18), a stronger texture (amp up to
    45), and a moving dark occluder disc (~4–13% of pixels) the spatial
    pooling must average around.
    """
    if cv2 is None:
        raise RuntimeError("cv2 required to write synthetic videos")
    h, w = size
    rng = np.random.default_rng(seed)
    theta0 = 2 * np.pi * gloss_id / num_glosses
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # Nuisance (per clip): moving-sinusoid luminance texture.
    phi = rng.uniform(0, 2 * np.pi)
    freq = rng.uniform(0.03, 0.10)
    motion = rng.uniform(-0.6, 0.6)
    tex_amp = rng.uniform(15, 45 if hard else 35)
    axis = rng.uniform(0, np.pi)
    proj = np.cos(axis) * xx + np.sin(axis) * yy
    if hard:
        gain = rng.uniform(0.88, 1.12, size=3).astype(np.float32)
        bright = rng.uniform(-18.0, 18.0)
        occ_r = rng.uniform(0.12, 0.20) * min(h, w)
        occ_xy = rng.uniform(0.25, 0.75, size=2) * np.array([w, h])
        occ_v = rng.uniform(-0.015, 0.015, size=2) * np.array([w, h])
    else:
        gain = np.ones(3, np.float32)
        bright = 0.0
    frames = np.empty((num_frames, h, w, 3), dtype=np.uint8)
    for t in range(num_frames):
        theta = theta0 + hue_rate * t
        weights = np.array(
            [np.cos(theta), np.cos(theta - 2 * np.pi / 3),
             np.cos(theta + 2 * np.pi / 3)],
            np.float32,
        )
        tex = tex_amp * np.sin(freq * proj + phi + motion * t)
        for c in range(3):
            img = 127.5 + (60.0 * weights[c] + tex + bright) * gain[c]
            frames[t, ..., c] = np.clip(img, 0, 255).astype(np.uint8)
        if hard:
            cx, cy = occ_xy + occ_v * t
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 < occ_r**2
            frames[t][mask] = 40
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise IOError(f"cannot open video writer for {path}")
    for t in range(num_frames):
        writer.write(frames[t, ..., ::-1])
    writer.release()


def make_separable_wlasl(
    root: str,
    num_glosses: int = 6,
    train_per_gloss: int = 8,
    val_per_gloss: int = 4,
    num_frames: int = 24,
    size: Tuple[int, int] = (96, 96),
) -> Tuple[str, str]:
    """WLASL-shaped dataset over :func:`write_separable_video`: a held-out
    ``val`` split with DISTINCT nuisance seeds, so val accuracy measures
    learning the class signal, not clip memorization. Returns
    (index_json_path, video_dir)."""
    video_dir = os.path.join(root, "videos")
    os.makedirs(video_dir, exist_ok=True)
    entries = []
    vid = 0
    for g in range(num_glosses):
        instances = []
        for split, count, seed_base in (
            ("train", train_per_gloss, 0), ("val", val_per_gloss, 10_000)
        ):
            for c in range(count):
                video_id = f"{vid:05d}"
                write_separable_video(
                    os.path.join(video_dir, video_id + ".mp4"),
                    gloss_id=g,
                    num_glosses=num_glosses,
                    num_frames=num_frames,
                    size=size,
                    seed=seed_base + g * 1000 + c,
                )
                instances.append(
                    {"video_id": video_id, "split": split, "frame_start": 1,
                     "frame_end": -1, "fps": 25}
                )
                vid += 1
        entries.append({"gloss": f"gloss_{g:04d}", "instances": instances})
    index_path = os.path.join(root, "WLASL_separable.json")
    with open(index_path, "w") as f:
        json.dump(entries, f)
    return index_path, video_dir


def rate_wheel(num_rate: int, unit: float = 0.17) -> np.ndarray:
    """The hue-rotation rates (radians/frame) of the grid task: ``num_rate``
    values symmetric about zero with no zero member for even counts, e.g.
    4 → (−0.255, −0.085, +0.085, +0.255). Sign discrimination requires
    temporal ORDER; magnitude discrimination requires reading hue at more
    than two sampled frames."""
    offs = np.arange(num_rate, dtype=np.float32) - (num_rate - 1) / 2.0
    return offs * unit


def make_separable_wlasl_grid(
    root: str,
    num_hue: int = 13,
    num_rate: int = 4,
    train_per_class: int = 8,
    val_per_class: int = 4,
    num_frames: int = 24,
    size: Tuple[int, int] = (96, 96),
    hard: bool = True,
) -> Tuple[str, str]:
    """The ≥50-class accuracy anchor (VERDICT r4 item #10): a WLASL-shaped
    dataset whose ``num_hue × num_rate`` classes factorize as (base hue
    direction θ₀, temporal hue-rotation rate ω) — class
    ``k = hue·num_rate + rate``. Defaults give 52 classes. The hue bins sit
    2π/13 ≈ 27.7° apart (ample margin over mp4 chroma quantization and the
    ``hard`` white-balance jitter), and the rate dimension makes the task
    genuinely TEMPORAL: a model that pools frames order-blind caps at
    50% (sign-confused pairs) on the rate factor. Val instances use
    disjoint nuisance seeds, as in :func:`make_separable_wlasl`.

    Returns (index_json_path, video_dir).
    """
    video_dir = os.path.join(root, "videos")
    os.makedirs(video_dir, exist_ok=True)
    rates = rate_wheel(num_rate)
    entries = []
    vid = 0
    for k in range(num_hue * num_rate):
        hue_k, rate_k = divmod(k, num_rate)
        instances = []
        for split, count, seed_base in (
            ("train", train_per_class, 0), ("val", val_per_class, 10_000)
        ):
            for c in range(count):
                video_id = f"{vid:05d}"
                write_separable_video(
                    os.path.join(video_dir, video_id + ".mp4"),
                    gloss_id=hue_k,
                    num_glosses=num_hue,
                    num_frames=num_frames,
                    size=size,
                    seed=seed_base + k * 1000 + c,
                    hue_rate=float(rates[rate_k]),
                    hard=hard,
                )
                instances.append(
                    {"video_id": video_id, "split": split, "frame_start": 1,
                     "frame_end": -1, "fps": 25}
                )
                vid += 1
        entries.append({"gloss": f"gloss_{k:04d}", "instances": instances})
    index_path = os.path.join(root, "WLASL_separable_grid.json")
    with open(index_path, "w") as f:
        json.dump(entries, f)
    return index_path, video_dir


def write_separable_session(
    path: str,
    gloss_sequence: List[int],
    num_glosses: int,
    frames_per_sign: int = 24,
    size: Tuple[int, int] = (96, 96),
    fps: int = 25,
    seed: int = 0,
) -> List[Tuple[int, int, int]]:
    """Write ONE continuous "signing session" mp4: the signs of
    ``gloss_sequence`` back to back with no boundary markers — the input
    :func:`asltpu.windows.predict_windows` exists for. Each sign's span
    carries the :func:`write_separable_video` class signal (a hue
    direction) with its own per-sign nuisance draw (texture orientation,
    frequency, motion, amplitude), so a timeline recognizer must read the
    signal per window, not per file.

    Returns the ground-truth timeline: ``[(gloss_id, start_frame,
    end_frame)]`` with 1-based inclusive frames (the ClipRecord/
    WindowPrediction convention).
    """
    if cv2 is None:
        raise RuntimeError("cv2 required to write synthetic videos")
    h, w = size
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise IOError(f"cannot open video writer for {path}")
    timeline: List[Tuple[int, int, int]] = []
    frame = 1
    for gloss_id in gloss_sequence:
        theta = 2 * np.pi * gloss_id / num_glosses
        weights = np.array(
            [np.cos(theta), np.cos(theta - 2 * np.pi / 3),
             np.cos(theta + 2 * np.pi / 3)],
            np.float32,
        )
        phi = rng.uniform(0, 2 * np.pi)
        freq = rng.uniform(0.03, 0.10)
        motion = rng.uniform(-0.6, 0.6)
        tex_amp = rng.uniform(15, 35)
        axis = rng.uniform(0, np.pi)
        proj = np.cos(axis) * xx + np.sin(axis) * yy
        for t in range(frames_per_sign):
            tex = tex_amp * np.sin(freq * proj + phi + motion * t)
            img = np.empty((h, w, 3), dtype=np.uint8)
            for c in range(3):
                img[..., c] = np.clip(
                    127.5 + 60.0 * weights[c] + tex, 0, 255
                ).astype(np.uint8)
            writer.write(img[..., ::-1])  # RGB → BGR for the encoder
        timeline.append((gloss_id, frame, frame + frames_per_sign - 1))
        frame += frames_per_sign
    writer.release()
    return timeline


def make_separable_landmarks(
    num_classes: int,
    clips_per_class: int,
    num_frames: int = 16,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Class-separable Holistic sequences for the LANDMARK-family learning
    proof (the counterpart of :func:`make_separable_wlasl` for the RGB
    families): gloss k = the DIRECTION the right hand drifts relative to
    the body (angle 2πk/C). The signal survives
    ``asltpu.models.bilstm.normalize_landmarks`` — per-frame recentering on
    the mid-shoulder point and shoulder-width scaling cancel exactly the
    nuisances drawn per clip below (global translation + camera drift,
    global scale), while RELATIVE hand motion passes through — and it is
    purely temporal-directional, so a model must integrate motion over T,
    not read one frame. Further nuisances: start radius, drift speed,
    coordinate noise, and randomly MISSING left-hand frames (zeros, the
    MediaPipe convention the masking path must preserve).

    Returns (landmarks [N, T, 543, 3] float32, labels [N] int32), shuffled.
    Use disjoint ``seed`` values for train and a held-out val split so val
    accuracy measures the class signal, not clip memorization."""
    rng = np.random.default_rng(seed)
    n = num_classes * clips_per_class
    labels = np.repeat(np.arange(num_classes), clips_per_class)
    lm = np.zeros((n, num_frames, 543, 3), np.float32)
    for i, k in enumerate(labels):
        theta = 2 * np.pi * k / num_classes
        lm[i] = _separable_landmark_seq(rng, theta, num_frames)
    perm = rng.permutation(n)
    return lm[perm], labels[perm].astype(np.int32)


def _separable_landmark_seq(
    rng: np.random.Generator, theta: float, num_frames: int
) -> np.ndarray:
    """One [T, 543, 3] sequence whose class signal is a right-hand drift
    along ``theta`` (see :func:`make_separable_landmarks` for why each
    nuisance is drawn and what the normalization must cancel)."""
    t01 = np.arange(num_frames, dtype=np.float32) / max(num_frames - 1, 1)
    # Static body: pose cluster with REAL shoulders (normalization
    # reference; indices 11/12 of the leading 33-pose block), face
    # cluster, both hands at rest.
    body = np.zeros((543, 3), np.float32)
    body[:33] = rng.uniform(0.45, 0.55, size=(33, 3))
    body[11] = (0.35, 0.40, 0.0)  # left shoulder
    body[12] = (0.65, 0.40, 0.0)  # right shoulder
    body[33:501] = rng.uniform(0.46, 0.54, size=(468, 3))
    body[501:522] = rng.uniform(0.38, 0.42, size=(21, 3))  # left hand
    body[522:543] = rng.uniform(0.58, 0.62, size=(21, 3))  # right hand
    seq = np.repeat(body[None], num_frames, axis=0)
    # The class signal: right hand drifts outward along angle theta.
    radius = rng.uniform(0.04, 0.08) + rng.uniform(0.18, 0.30) * t01
    seq[:, 522:543, 0] += (radius * np.cos(theta))[:, None]
    seq[:, 522:543, 1] += (radius * np.sin(theta))[:, None]
    # Nuisances the normalization must cancel: per-clip global scale,
    # global translation, smooth camera drift; plus coordinate noise.
    seq += rng.normal(0, 0.004, size=seq.shape).astype(np.float32)
    seq *= rng.uniform(0.7, 1.3)
    seq += rng.uniform(-0.1, 0.1, size=(1, 1, 3))
    seq += rng.normal(0, 0.002, size=(num_frames, 1, 3)).cumsum(axis=0)
    # Missing-detection frames: left hand drops out ~20% of the time
    # (AFTER the transforms — missing rows are exactly zero).
    seq[rng.random(num_frames) < 0.2, 501:522, :] = 0.0
    return seq


def make_separable_fusion(
    num_hue: int,
    num_drift: int,
    clips_per_class: int,
    num_frames: int = 8,
    size: Tuple[int, int] = (32, 32),
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A CROSS-MODAL task only a working fusion model can solve: the label
    factorizes as ``hue_class * num_drift + drift_class``, where the hue
    lives ONLY in the RGB clip (the :func:`write_separable_video` color
    signal, emitted here as already-preprocessed tensors) and the drift
    lives ONLY in the landmarks (:func:`make_separable_landmarks` signal).
    A model reading one stream caps at ``1/num_drift`` (RGB only) or
    ``1/num_hue`` (landmarks only) accuracy; beating BOTH ceilings proves
    gradient flows through, and the classifier uses, BOTH streams and the
    cross-attention between them.

    Returns (clips [N, T, H, W, 3] float32 in the preprocess output space
    — ImageNet mean/std normalized, the TwoStreamFusion input contract —
    landmarks [N, T, 543, 3] float32, labels [N] int32), shuffled.
    Disjoint ``seed`` values give independent nuisance draws (train vs val).
    """
    from asltpu.config import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(seed)
    h, w = size
    n = num_hue * num_drift * clips_per_class
    labels = np.repeat(np.arange(num_hue * num_drift), clips_per_class)
    clips = np.empty((n, num_frames, h, w, 3), np.float32)
    lm = np.empty((n, num_frames, 543, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    for i, label in enumerate(labels):
        hue_k, drift_k = divmod(int(label), num_drift)
        # RGB stream: the hue-direction signal + moving-texture nuisance
        # (write_separable_video's construction, in [0,1] tensor space).
        theta = 2 * np.pi * hue_k / num_hue
        weights = np.array(
            [np.cos(theta), np.cos(theta - 2 * np.pi / 3),
             np.cos(theta + 2 * np.pi / 3)],
            np.float32,
        )
        phi = rng.uniform(0, 2 * np.pi)
        freq = rng.uniform(0.03, 0.10)
        motion = rng.uniform(-0.6, 0.6)
        tex_amp = rng.uniform(0.06, 0.14)
        axis = rng.uniform(0, np.pi)
        proj = np.cos(axis) * xx + np.sin(axis) * yy
        for t in range(num_frames):
            tex = tex_amp * np.sin(freq * proj + phi + motion * t)
            img01 = np.clip(
                0.5 + 0.235 * weights[None, None, :] + tex[..., None], 0, 1
            )
            clips[i, t] = (img01 - mean) / std
        # Landmark stream: the drift-direction signal.
        lm[i] = _separable_landmark_seq(
            rng, 2 * np.pi * drift_k / num_drift, num_frames
        )
    perm = rng.permutation(n)
    return clips[perm], lm[perm], labels[perm].astype(np.int32)


def synthetic_landmarks(
    batch: int, num_frames: int, seed: int = 0
) -> np.ndarray:
    """Plausible 543-landmark sequences: smooth trajectories in [0,1]², with
    some frames' hand blocks zeroed (missing-detection convention)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, size=(batch, 1, 543, 3)).astype(np.float32)
    drift = rng.normal(0, 0.003, size=(batch, num_frames, 543, 3)).astype(
        np.float32
    ).cumsum(axis=1)
    lm = np.clip(base + drift, 0.0, 1.0)
    # Zero out the left-hand block (indices 501:522) in ~20% of frames.
    mask = rng.random((batch, num_frames)) < 0.2
    lm[mask, 501:522, :] = 0.0
    return lm
