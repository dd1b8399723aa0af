"""asltpu.utils — logging, metrics, profiling (C19)."""

from asltpu.utils.logging import get_logger, MetricsWriter  # noqa: F401
from asltpu.utils.profiling import trace, named_scope  # noqa: F401
