"""Double-buffered host→device prefetcher (C3, ``BASELINE.json:4``):
"double-buffered host→device prefetch so video decode overlaps backbone
compute".

Mechanism: a bounded queue of host batches feeds a transfer thread that
issues ``jax.device_put`` ahead of consumption; because JAX transfers are
async (the returned Array is a future), keeping ``depth`` batches in flight
overlaps (a) host decode, (b) PCIe transfer, and (c) TPU compute of the
previous batch. With a sharding, ``device_put`` scatters the batch across
the data-parallel mesh.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Iterable, Optional

import jax


class Prefetcher:
    """Wrap a host-batch iterator with a double-buffered device pipeline.

    Args:
      host_iter: yields host-side batches (numpy arrays / pytrees).
      depth: number of device batches kept in flight (2 = double buffering).
      sharding: optional ``jax.sharding.Sharding`` for multi-device layouts.
      deterministic: run transfers inline on the consumer thread (no
        background thread) — the debug mode called for in SURVEY.md §5.2.
    """

    _SENTINEL = object()

    def __init__(
        self,
        host_iter: Iterable[Any],
        depth: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        deterministic: bool = False,
    ):
        self._host_iter = iter(host_iter)
        self._depth = max(1, depth)
        self._sharding = sharding
        self._deterministic = deterministic
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        if not deterministic:
            self._q: queue.Queue = queue.Queue(maxsize=self._depth)
            self._thread = threading.Thread(
                target=self._worker, name="asltpu-prefetch", daemon=True
            )
            self._thread.start()

    def _put_device(self, batch):
        if self._sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch
            )
        return jax.tree.map(jax.device_put, batch)

    def _worker(self):
        try:
            for batch in self._host_iter:
                if self._stop.is_set():
                    break
                dev = self._put_device(batch)
                # Block on THIS thread until the copy lands: measured on the
                # v5e host, overlapping/async host→device copies thrash the
                # DMA path to ~0.14 GB/s while strictly-serial blocking
                # copies sustain ~1.2 GB/s. Serializing here still overlaps
                # transfer with the consumer's compute.
                jax.block_until_ready(dev)
                while not self._stop.is_set():
                    try:
                        self._q.put(dev, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            # The sentinel MUST reach a live consumer (it blocks in q.get
            # forever otherwise) — but close() may have abandoned the
            # consumer side, so bound each attempt and re-check the stop
            # flag rather than blocking unconditionally.
            while True:
                try:
                    self._q.put(self._SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if self._stop.is_set():
                        break

    def close(self):
        """Stop the transfer thread and release in-flight device batches.

        Safe to call more than once; a consumer that exits its loop early
        (break, exception) should call this — ``__iter__`` cannot know the
        consumer abandoned it, and an un-closed worker stays blocked in
        ``q.put`` pinning decoded + device buffers for the process lifetime.
        """
        if self._deterministic:
            return
        self._stop.set()
        # Drain so a worker blocked in put() wakes and sees the stop flag.
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5)

    def __enter__(self) -> "Prefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __iter__(self) -> Iterator[Any]:
        if self._deterministic:
            for batch in self._host_iter:
                yield self._put_device(batch)
            return
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch_map(
    fn: Callable[[Any], Any],
    host_iter: Iterable[Any],
    depth: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Any]:
    """Apply a (jitted) device fn over a prefetched stream; dispatch of batch
    i+1 overlaps compute of batch i (JAX async dispatch)."""
    for batch in Prefetcher(host_iter, depth=depth, sharding=sharding):
        yield fn(batch)
