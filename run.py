#!/usr/bin/env python
"""Reference-compatible CLI entry point (see `/root/reference/run.py`).

All flags and the train->evaluate->threshold-transfer workflow are provided
by `unsupervised_anomaly_detection_brain_mri_tpu.cli`.
"""

import sys

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
