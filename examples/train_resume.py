"""Train + crash + resume on a synthetic WLASL dataset (no downloads).

Demonstrates the resilience path end-to-end: the first run fault-injects a
crash at step 6; the second run restores the orbax train state AND the
exact grain data-stream position and finishes the remaining steps.

    python examples/train_resume.py

Uses tiny shapes so it runs in ~a minute on a CPU backend. The same wiring
at contract shapes is `python -m asltpu.cli train --model i3d ...`.
"""

import os
import sys

# Runnable straight from a source checkout (no install needed).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np

from asltpu import ckpt
from asltpu.api import build_module, _dummy_inputs
from asltpu.config import TrainConfig, get_config
from asltpu.data.loader import ResumableIterator, make_train_loader
from asltpu.data.synthetic import make_synthetic_wlasl
from asltpu.data.wlasl import WLASLIndex
from asltpu.train.loop import FaultInjected, train


def run(steps: int, ckpt_dir: str, index: str, videos: str, fault_step: int):
    cfg = get_config(
        "i3d",
        num_classes=6,
        preprocess={
            "num_frames": 4,
            "staging_size": (48, 48),
            "resize_short": 40,
            "crop": 32,
        },
    )
    records = WLASLIndex(index, videos, subset=6).split("train")
    # batch_size must divide by the device count when more than one device
    # is visible (train() auto-creates the data-parallel mesh); 8 covers the
    # common virtual-8-device CPU setup and any single chip.
    tcfg = TrainConfig(
        batch_size=8, num_steps=steps, warmup_steps=2, log_every=2,
        ckpt_every=3, ckpt_dir=ckpt_dir, fault_inject_step=fault_step,
    )
    loader = make_train_loader(records, cfg.preprocess, tcfg.batch_size,
                               seed=tcfg.seed)
    raw_iter = iter(loader)
    saved = ckpt.load_data_state(ckpt_dir)
    if saved is not None:
        raw_iter.set_state(saved)  # resume the data stream, not just weights
    resumable = ResumableIterator(raw_iter)

    def batches():
        for frames, labels in resumable:
            yield frames, np.asarray(labels, np.int32)

    return train(build_module(cfg), tcfg, batches(), _dummy_inputs(cfg),
                 pp_cfg=cfg.preprocess, resumable_iter=resumable)


def main() -> None:
    root = tempfile.mkdtemp(prefix="asltpu_train_example_")
    index, videos = make_synthetic_wlasl(root, num_glosses=6,
                                         clips_per_gloss=2, num_frames=12,
                                         size=(64, 64))
    ckpt_dir = f"{root}/ck"
    try:
        run(10, ckpt_dir, index, videos, fault_step=6)
        raise SystemExit("expected the injected fault")
    except FaultInjected:
        print("crashed at step 6 (injected); resuming from the last save...")
    state = run(10, ckpt_dir, index, videos, fault_step=-1)
    print(f"resumed and finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
