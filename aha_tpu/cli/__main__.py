"""`python -m aha_tpu.cli` — same dispatcher as the `aha` console script."""

import sys

from aha_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
