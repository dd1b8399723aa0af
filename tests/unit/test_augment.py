"""Train-time augmentation: shape/dtype, determinism per key, identity
special case, flip behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from asltpu.config import PreprocessConfig
from asltpu.ops.augment import AugmentConfig, augment_preprocess_clip
from asltpu.ops.preprocess import preprocess_clip_mm

PP = PreprocessConfig(
    num_frames=2, staging_size=(56, 56), resize_short=56, crop=48,
    out_dtype="float32",
)


def _frames(rng, b=3):
    return rng.integers(0, 256, size=(b, 2, 56, 56, 3), dtype=np.uint8)


def test_augment_shapes_and_determinism(rng):
    frames = _frames(rng)
    key = jax.random.PRNGKey(0)
    out1 = augment_preprocess_clip(key, frames, PP)
    out2 = augment_preprocess_clip(key, frames, PP)
    assert out1.shape == (3, 2, 48, 48, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = augment_preprocess_clip(jax.random.PRNGKey(1), frames, PP)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_augment_identity_matches_eval_path(rng):
    """With area=1 (full-frame window), aspect=1, no flip/jitter the
    augmented path is a deterministic full-frame resize to crop² — which
    the eval preprocess reproduces with resize_short=crop."""
    frames = _frames(rng, b=2)
    aug = AugmentConfig(
        min_area=1.0, max_area=1.0, min_aspect=1.0, max_aspect=1.0,
        hflip_prob=0.0, brightness=0.0, contrast=0.0,
    )
    got = np.asarray(
        augment_preprocess_clip(jax.random.PRNGKey(0), frames, PP, aug)
    )
    import dataclasses

    pp_fullframe = dataclasses.replace(PP, resize_short=48)
    want = np.asarray(preprocess_clip_mm(frames, pp_fullframe))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_augment_flip_is_mirror(rng):
    frames = _frames(rng, b=1)
    base = AugmentConfig(
        min_area=1.0, max_area=1.0, min_aspect=1.0, max_aspect=1.0,
        hflip_prob=0.0, brightness=0.0, contrast=0.0,
    )
    flip = AugmentConfig(
        min_area=1.0, max_area=1.0, min_aspect=1.0, max_aspect=1.0,
        hflip_prob=1.0, brightness=0.0, contrast=0.0,
    )
    a = np.asarray(augment_preprocess_clip(jax.random.PRNGKey(0), frames, PP, base))
    b = np.asarray(augment_preprocess_clip(jax.random.PRNGKey(0), frames, PP, flip))
    np.testing.assert_allclose(a, b[:, :, :, ::-1, :], atol=1e-4)


def test_augment_consistent_across_frames(rng):
    """The same spatial transform must apply to every frame of a clip:
    augmenting a clip whose frames are identical must yield identical
    augmented frames."""
    frame = rng.integers(0, 256, size=(1, 1, 56, 56, 3), dtype=np.uint8)
    clip = np.repeat(frame, 2, axis=1)
    out = np.asarray(augment_preprocess_clip(jax.random.PRNGKey(3), clip, PP))
    np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-5)
