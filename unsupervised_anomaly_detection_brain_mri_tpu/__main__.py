"""``python -m unsupervised_anomaly_detection_brain_mri_tpu`` == run.py."""

import sys

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
