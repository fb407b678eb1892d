#!/usr/bin/env python3
"""Top-level convenience entry matching the reference repo layout:
`python3 analyze_results.py --metrics_file ...` (see
dinov2_od_tpu/tools/analyze.py for the implementation)."""

import sys

from dinov2_od_tpu.tools.analyze import main

if __name__ == "__main__":
    sys.exit(main())
