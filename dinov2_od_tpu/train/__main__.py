"""`python -m dinov2_od_tpu.train` entry point (the TPU-native equivalent
of the reference's `python -m dino_detector.train`)."""

import sys

from .cli import main

sys.exit(main())
