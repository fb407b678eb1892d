#!/usr/bin/env python3
"""Top-level convenience entry matching the reference repo layout:
`python3 download_coco.py --train --val` (see
dinov2_od_tpu/tools/download.py for the implementation)."""

import sys

from dinov2_od_tpu.tools.download import main

if __name__ == "__main__":
    sys.exit(main())
