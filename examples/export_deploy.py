"""Deployment export: model → serialized artifact → predictions, no model code.

Exports the inference program (preprocessing included) as portable
serialized StableHLO plus weights and config, then reloads the artifact
and serves predictions from it — the workflow a serving fleet uses to pin
a model while the training codebase moves on.

    python examples/export_deploy.py

Set ASLTPU_EXAMPLE_TINY=1 to use toy shapes (seconds instead of minutes on
a CPU backend; the example smoke test does this).
"""

import os
import sys

# Runnable straight from a source checkout (no install needed).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np

from asltpu import api
from asltpu.data.synthetic import write_video
from asltpu.export import export_model, load_exported


def main() -> None:
    tiny = bool(os.environ.get("ASLTPU_EXAMPLE_TINY"))
    overrides = (
        {
            "gru_hidden": 16,
            "width_mult": 0.5,
            "num_classes": 5,
            "preprocess": {
                "num_frames": 4,
                "staging_size": (48, 48),
                "resize_short": 40,
                "crop": 32,
            },
        }
        if tiny
        else {}
    )

    tmp = tempfile.mkdtemp(prefix="asltpu_export_")
    clip_path = os.path.join(tmp, "clip.mp4")
    write_video(clip_path, num_frames=24, size=(240, 320), seed=3)

    # 1. Build (or restore) the model and export the deployment artifact.
    model = api.load_model("mobilenet_gru", **overrides)
    artifact_dir = os.path.join(tmp, "artifact")
    meta = export_model(model, artifact_dir, batch_size=2)
    print(f"exported: platforms={meta['platforms']} "
          f"batch_size={meta['batch_size']}")

    # 2. Reload — this needs the artifact directory only (a fresh process
    # without the model-building code paths would do exactly the same).
    em = load_exported(artifact_dir)

    # 3. Stage a clip with the artifact's own preprocess config and predict
    # through the serialized program.
    clip = api.load_clip(clip_path, em.preprocess)
    gloss, logits = em.predict(frames=clip)
    print(f"artifact predict: gloss id {gloss}, logits {logits.shape}")

    # The serialized program IS the live math: same clip through the live
    # model must agree exactly (same platform, same program).
    _, live = api.predict(model, clip)
    print(f"matches live model: {bool(np.allclose(logits, live, atol=1e-5))}")


if __name__ == "__main__":
    main()
