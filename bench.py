"""Driver entry point — the benchmark lives in asltpu.benchmark so the
installed `asl bench` command works without a repo checkout."""

import sys

from asltpu.benchmark import main

if __name__ == "__main__":
    sys.exit(main())
