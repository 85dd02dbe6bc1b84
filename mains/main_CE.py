#!/usr/bin/env python
"""Experiment preset 'CE' — parity with the reference `mains/main_CE.py`
hyperparameters (see SURVEY.md section 2.7 and config.EXPERIMENT_PRESETS).

Extra CLI flags are forwarded (e.g. --synthetic for a hermetic smoke run).
"""

import sys

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["--preset", "CE"] + sys.argv[1:]))
