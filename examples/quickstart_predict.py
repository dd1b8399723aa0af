"""Quickstart: synthetic clip → load_model → predict → stream_predict.

Runs anywhere (TPU or CPU backend) with no dataset: the clip is generated
by the framework's synthetic fixture writer.

    python examples/quickstart_predict.py

Set ASLTPU_EXAMPLE_TINY=1 to use toy shapes (seconds instead of minutes on
a CPU backend; the example smoke test does this).
"""

import os
import sys

# Runnable straight from a source checkout (no install needed).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from asltpu import api
from asltpu.data.synthetic import write_video


def main() -> None:
    tiny = bool(os.environ.get("ASLTPU_EXAMPLE_TINY"))
    overrides = (
        {
            "gru_hidden": 16,
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

    tmp = tempfile.mkdtemp(prefix="asltpu_example_")
    paths = []
    for i in range(4):
        p = os.path.join(tmp, f"clip{i}.mp4")
        write_video(p, num_frames=40, size=(240, 320), seed=i)
        paths.append(p)

    # North-star config: MobileNetV2 per-frame features + GRU head.
    model = api.load_model("mobilenet_gru", **overrides)

    # Single clip: host decode+staging, then ONE XLA program to logits.
    clip = api.load_clip(paths[0], model.cfg.preprocess)
    gloss, logits = api.predict(model, clip)
    print(f"predict: gloss id {gloss}, logits shape {logits.shape}")

    # Batched streaming: decode pool -> prefetch -> jitted predict.
    for path, gloss, logits in api.stream_predict(model, paths, batch_size=2):
        print(f"stream: {os.path.basename(path)} -> gloss id {gloss}")


if __name__ == "__main__":
    main()
