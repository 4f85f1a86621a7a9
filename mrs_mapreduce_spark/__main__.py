"""``python -m mrs_mapreduce_spark`` — delegates to :mod:`.cli` (A17)."""

from __future__ import annotations

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
