"""Unit tests for the bench harness's host-independent logic (C18).

The measurement paths themselves are TPU-gated (tests/bench/); what's
tested here is the poisoned-sample classifier that decides whether an
e2e sample is evidence about the PIPELINE or about transient host state
(relay mid-refill / hypervisor CPU-starvation — README env-limits §3)."""

from asltpu.benchmark import poisoned_sample


def test_healthy_sample_stands():
    # Windows agree and sit near the pool's demonstrated decode rate.
    assert poisoned_sample([90.0, 100.0, 95.0], 95.0,
                           {"decode_sel_av_clips_per_sec": 110.0}) is None


def test_bimodal_windows_detected():
    # One fast window, median collapsed: part of the stream was poisoned
    # (the observed r02 pattern: 5.3/5.7/118.9 clips/s).
    assert poisoned_sample([5.3, 5.7, 118.9], 5.7, {}) == "bimodal_windows"


def test_uniform_starvation_detected():
    # Windows agree with each other (bimodal test passes) but the whole
    # stream ran ~25x below the same pool's selection-probe rate (the
    # observed sel_av=100, windows 3.6/4.3 collapse).
    assert poisoned_sample(
        [3.6, 4.3], 3.95, {"decode_sel_av_clips_per_sec": 100.0}
    ) == "uniform_starvation"


def test_uniform_slow_without_reference_stands():
    # No selection probe (explicit --decode-backend): a uniformly slow
    # stream cannot be PROVEN poisoned, so it stands.
    assert poisoned_sample([3.6, 4.3], 3.95, {}) is None


def test_none_selection_rates_ignored():
    # A backend whose build failed reports None — must not break or count.
    assert poisoned_sample(
        [3.6, 4.3], 3.95,
        {"decode_sel_av_clips_per_sec": None,
         "decode_sel_native_clips_per_sec": 100.0},
    ) == "uniform_starvation"


def test_empty_windows_stand():
    assert poisoned_sample([], 0.0, {"decode_sel_av_clips_per_sec": 100.0}) \
        is None


def test_e2e_above_reference_never_poisoned():
    # e2e can legitimately sit at ~0.7-1.3x the selection rate (the probe
    # is a small cold sample); only a deep collapse triggers.
    assert poisoned_sample([40.0, 45.0, 42.0], 42.0,
                           {"decode_sel_av_clips_per_sec": 100.0}) is None


def test_stream_e2e_window_accounting():
    """_stream_e2e cuts one continuous stream into contiguous windows at
    batch granularity: clip counts must sum to the corpus, window 0 must
    carry the fill bubble (its span starts at stream start), and the
    device-seconds split must be <= each window's wall seconds."""
    import numpy as np

    from asltpu.benchmark import _stream_e2e

    class FakePool:
        def map_batches(self, paths, batch):
            for i in range(0, len(paths), batch):
                n = min(batch, len(paths) - i)
                yield (np.zeros((batch, 2, 8, 8, 3), np.uint8),
                       list(range(i, i + n)))

    def fn(variables, frames):
        return frames.sum()  # cheap; jax.block_until_ready accepts arrays

    rates, overall, dev_cps, detail, fill_s = _stream_e2e(
        FakePool(), fn, None, [f"c{i}" for i in range(20)], 8, n_windows=3)
    assert len(rates) == 3 == len(detail)
    assert sum(d["clips"] for d in detail) == 20
    assert all(d["device_seconds"] <= d["seconds"] + 1e-6 for d in detail)
    assert overall > 0 and dev_cps > 0
    # Fill time (start → first decoded batch) is separable from window 0's
    # rate and bounded by window 0's wall time.
    assert fill_s is not None and 0 <= fill_s <= detail[0]["seconds"] + 1e-6
    # Degenerate cases: empty corpus, fewer batches than windows.
    assert _stream_e2e(FakePool(), fn, None, [], 8) == (
        [], 0.0, 0.0, [], None)
    rates1, _, _, detail1, _ = _stream_e2e(
        FakePool(), fn, None, ["a", "b"], 8, n_windows=3)
    assert len(rates1) == 1 and detail1[0]["clips"] == 2


def test_probe_link_warms_before_timing(monkeypatch):
    """The link probe must NOT bill the relay's cold-reconnect overhead to
    the timed transfer (measured 2026-08-21: cold 8 MB probe 63 MB/s vs
    995 MB/s warm — the settle loop's sleeps made every probe cold, so a
    healthy link could never pass the 400 MB/s threshold). Contract
    traced via device_put: an untimed 1 MB warmup put FIRST, then two
    timed n_mb puts with the faster kept (cold overhead spans more than
    one RPC)."""
    import jax

    from asltpu import benchmark

    puts = []
    real_put = jax.device_put

    def spy(x, *a, **k):
        puts.append(getattr(x, "nbytes", None))
        return real_put(x, *a, **k)

    monkeypatch.setattr(jax, "device_put", spy)
    rate = benchmark._probe_link_mbps(n_mb=2)
    assert rate > 0
    assert puts == [1 << 20, 2 << 20, 2 << 20], (
        f"expected warmup 1MB then two timed 2MB puts, saw {puts}")


def test_bench_decode_fast_requires_av(capsys):
    """`bench --decode-fast` forces/validates the av backend (same
    fail-fast as api.stream_predict) — argparse errors exit(2) when an
    incompatible backend is named explicitly."""
    import sys

    import pytest

    from asltpu import benchmark

    argv = sys.argv
    try:
        sys.argv = ["bench", "--decode-fast", "--decode-backend", "native"]
        with pytest.raises(SystemExit) as e:
            benchmark.main()
        assert e.value.code == 2
    finally:
        sys.argv = argv
