"""grain-based training loader (C15): deterministic, resumable input
pipeline over WLASL records for the training path.

grain gives: global shuffling with a seeded, checkpointable iterator (the
loader position can be recovered on resume), worker processes for decode
when host cores allow, and prefetching — composing with the device-side
Prefetcher (C3) which owns the host→device leg.

On this 1-core host ``worker_count=0`` (in-process decode) is the right
setting; multi-core hosts scale decode with workers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from asltpu.config import PreprocessConfig
from asltpu.data.decode import decode_record
from asltpu.data.wlasl import ClipRecord


class ClipDataSource:
    """grain RandomAccessDataSource: record index → (staged frames, label)."""

    def __init__(self, records: Sequence[ClipRecord], pp: PreprocessConfig):
        self._records = [r for r in records if r.path]
        self._pp = pp

    def __len__(self) -> int:
        return len(self._records)

    def __getitem__(self, idx) -> Tuple[np.ndarray, np.int32]:
        rec = self._records[int(idx)]
        return decode_record(rec, self._pp), np.int32(rec.label)


def make_train_loader(
    records: Sequence[ClipRecord],
    pp: PreprocessConfig,
    batch_size: int,
    *,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
):
    """Build a grain DataLoader yielding (frames [B,T,Hs,Ws,3] u8,
    labels [B]) batches, globally shuffled per epoch, drop-remainder."""
    import grain.python as grain

    source = ClipDataSource(records, pp)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=True,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.NoSharding(),
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
