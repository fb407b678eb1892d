"""Forwarder for the reference CLI surface: `python -m dino_detector.train`
behaves like `python -m dinov2_od_tpu.train` (same flags)."""

import sys

from dinov2_od_tpu.train.cli import main

if __name__ == "__main__":
    sys.exit(main())
