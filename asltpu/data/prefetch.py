"""Double-buffered host→device prefetcher (C3, ``BASELINE.json:4``):
"double-buffered host→device prefetch so video decode overlaps backbone
compute".

Mechanism: a background thread drains the host iterator (keeping decode
ahead of the device), and the consumer thread performs a SERIAL blocking
``jax.device_put`` followed by its execute. Two measured properties of this
host's relay-mediated TPU link shape that default (round 2, README "known
environment limits"):

  - concurrent/async host→device copies thrash the DMA path (~0.14 GB/s
    vs ~1.5 GB/s serial), and
  - a transfer overlapping an in-flight EXECUTE can wedge the relay
    entirely (RPCs stall for minutes) — so transfer and compute must not
    be issued concurrently from different threads.

Decode↔device overlap (the double-buffering contract) is preserved: the
decode pool's threads keep working while the consumer blocks on device
RPCs. On a direct-PCIe host the classic transfer-in-worker overlap can be
re-enabled with ``transfer_in_worker=True``.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Iterable, Optional

import jax


class Prefetcher:
    """Wrap a host-batch iterator with a bounded decode-ahead queue.

    Args:
      host_iter: yields host-side batches (numpy arrays / pytrees).
      depth: number of batches kept ahead (2 = double buffering).
      sharding: optional ``jax.sharding.Sharding`` for multi-device layouts.
      deterministic: no background thread at all (SURVEY.md §5.2 debug mode).
      transfer_in_worker: issue ``device_put`` on the background thread so
        the copy overlaps the consumer's compute — the classic pipeline for
        direct-attached accelerators. Default False: on this host the
        overlap of a transfer with an in-flight execute wedges the relay
        (see module docstring), so the consumer thread transfers serially.
    """

    _SENTINEL = object()

    def __init__(
        self,
        host_iter: Iterable[Any],
        depth: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        deterministic: bool = False,
        transfer_in_worker: bool = False,
    ):
        self._host_iter = iter(host_iter)
        self._depth = max(1, depth)
        self._sharding = sharding
        self._deterministic = deterministic
        self._transfer_in_worker = transfer_in_worker
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        if not deterministic:
            self._q: queue.Queue = queue.Queue(maxsize=self._depth)
            self._thread = threading.Thread(
                target=self._worker, name="asltpu-prefetch", daemon=True
            )
            self._thread.start()

    def _put_device(self, batch, blocking: bool = True):
        if self._sharding is not None:
            dev = jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch
            )
        else:
            dev = jax.tree.map(jax.device_put, batch)
        if blocking:
            # Strictly-serial blocking copies: measured fastest AND the only
            # mode that leaves the relay link healthy (module docstring).
            jax.block_until_ready(dev)
        return dev

    def _worker(self):
        try:
            for batch in self._host_iter:
                if self._stop.is_set():
                    break
                item = (
                    self._put_device(batch) if self._transfer_in_worker
                    else batch
                )
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
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
        """Stop the background thread and release in-flight batches.

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
            if self._transfer_in_worker:
                yield item  # already a device batch
            else:
                yield self._put_device(item)


def prefetch_map(
    fn: Callable[[Any], Any],
    host_iter: Iterable[Any],
    depth: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Any]:
    """Apply a (jitted) device fn over a prefetched stream; decode of batch
    i+1 overlaps device work of batch i."""
    # with-block, not a bare loop: a caller that breaks early (or an fn that
    # raises) sends GeneratorExit here, and close() must run or the worker
    # thread stays blocked in q.put pinning buffers for the process life.
    with Prefetcher(host_iter, depth=depth, sharding=sharding) as pf:
        for batch in pf:
            yield fn(batch)
