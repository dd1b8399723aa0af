"""grain training loader: batching, shuffling determinism, epoch bound."""

import numpy as np

from asltpu.config import PreprocessConfig
from asltpu.data.loader import make_train_loader
from asltpu.data.wlasl import WLASLIndex

PP = PreprocessConfig(num_frames=4, staging_size=(64, 64))


def test_loader_batches(tiny_wlasl):
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")
    loader = make_train_loader(records, PP, batch_size=4, seed=0, num_epochs=2)
    batches = list(loader)
    # grain batches across epoch boundaries: 6 records × 2 epochs = 12
    # samples → 3 full batches of 4.
    assert len(batches) == 3
    frames, labels = batches[0]
    assert frames.shape == (4, 4, 64, 64, 3) and frames.dtype == np.uint8
    assert labels.shape == (4,)


def test_loader_shuffle_deterministic(tiny_wlasl):
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")

    def labels_seq(seed):
        loader = make_train_loader(records, PP, batch_size=4, seed=seed,
                                   num_epochs=1)
        return [tuple(lbl.tolist()) for _, lbl in loader]

    assert labels_seq(0) == labels_seq(0)
