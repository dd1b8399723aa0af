"""asltpu.cli — command-line entry points (``python -m asltpu.cli ...``)."""

from asltpu.cli.main import main  # noqa: F401
