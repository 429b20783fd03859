"""``python -m torus_fhe_tpu`` — the reference's CLI binaries (Makefile:6-26)."""

import sys

from .cli import main

sys.exit(main())
