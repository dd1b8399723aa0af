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


class ResumableIterator:
    """Wrap a grain ``PyGrainDatasetIterator`` so the state of the last
    CONSUMED batch stays saveable while a Prefetcher pulls ahead.

    The device-side Prefetcher (C3) keeps ``depth`` batches in flight, so at
    checkpoint time the raw grain iterator has already advanced past what
    the train loop actually consumed — saving ``get_state()`` directly would
    SKIP those in-flight batches on resume. This wrapper snapshots
    ``get_state()`` BEFORE each yielded batch; ``state_for(consumed)``
    returns the snapshot that resumes exactly at batch index ``consumed``
    (0-based count of batches the consumer finished).
    """

    def __init__(self, it, keep: int = 16):
        import threading

        self._it = it
        self._keep = keep
        self._snapshots: dict = {}
        self._seq = 0
        # __next__ runs on the Prefetcher's decode-ahead thread while
        # state_for runs on the train (main) thread at checkpoint time; the
        # grain iterator is not thread-safe, so both must serialize or a
        # torn get_state lands in grain_state.bin and resume repeats/skips.
        self._lock = threading.Lock()

    def __iter__(self):
        return self

    def __next__(self):
        with self._lock:
            self._snapshots[self._seq] = self._it.get_state()
            # Prune far-behind snapshots (a checkpoint only ever needs one a
            # few batches back — bounded by prefetch depth).
            for k in [
                k for k in self._snapshots if k < self._seq - self._keep
            ]:
                del self._snapshots[k]
            self._seq += 1
            return next(self._it)

    def state_for(self, consumed: int) -> Optional[bytes]:
        """grain state that resumes with batch index ``consumed`` (i.e. the
        consumer has finished batches [0, consumed)). May block for up to
        one in-flight decode (the lock covers the worker's next())."""
        with self._lock:
            if consumed >= self._seq:
                # Consumer claims more than was pulled — only possible at
                # the exact boundary; the raw state is correct there.
                return self._it.get_state()
            return self._snapshots.get(consumed)


class ClipDataSource:
    """grain RandomAccessDataSource: record index → (staged frames, label)."""

    def __init__(self, records: Sequence[ClipRecord], pp: PreprocessConfig):
        self._records = [r for r in records if r.path]
        self._pp = pp

    def __repr__(self) -> str:
        # grain validates checkpointed iterator state against
        # ``repr(data_source)`` — it must be STABLE across processes (the
        # default object repr carries the id()), and content-addressed so a
        # changed record list or preprocess config invalidates a stale state.
        import hashlib

        h = hashlib.sha1()
        for r in self._records:
            # bbox is part of the decode output — a bbox-only dataset edit
            # must invalidate a checkpointed iterator state too.
            h.update(
                f"{r.path}|{r.label}|{r.frame_start}|{r.frame_end}|{r.bbox}"
                .encode()
            )
        h.update(repr(self._pp).encode())
        return f"ClipDataSource(n={len(self._records)}, key={h.hexdigest()[:12]})"

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
