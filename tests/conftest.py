"""Test environment: force an 8-device virtual CPU mesh (SURVEY.md §4.2 —
distributed tests without a cluster). Must run before jax is imported."""

import os

# ASLTPU_TEST_TPU=1 leaves the real TPU visible (perf-regression tests);
# default is the 8-device virtual CPU mesh.
_USE_TPU = os.environ.get("ASLTPU_TEST_TPU") == "1"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The environment's TPU plugin (sitecustomize → axon.register) force-sets
# jax_platforms="axon,cpu" at interpreter startup, overriding the env var —
# override it back before any backend is instantiated so tests run on the
# 8-device virtual CPU mesh.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    # Persistent XLA:CPU compile cache (same store the multichip dryrun
    # uses): the suite's wall clock is dominated by XLA:CPU compiles of the
    # model-sized test programs, and XLA:CPU honors the cache (the repo's
    # "compile cache NEGATIVE" finding is TPU-relay-only). First run warms;
    # repeat runs load compiled programs in seconds. Entries are keyed by
    # host machine features — a host change just re-warms.
    _cache = os.path.expanduser("~/.cache/asltpu/xla_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_wlasl(tmp_path_factory):
    """Synthetic WLASL index + videos: 6 glosses × 2 clips (train/test)."""
    from asltpu.data.synthetic import make_synthetic_wlasl

    root = str(tmp_path_factory.mktemp("wlasl"))
    index, videos = make_synthetic_wlasl(
        root, num_glosses=6, clips_per_gloss=2, num_frames=20, size=(96, 96),
        splits=["train", "test"],
    )
    return index, videos
