#!/usr/bin/env python
"""Train and evaluate EVERY model variant — the Colab-notebook workflow.

Parity with the reference notebook ("Running all cells will download the
brainweb dataset, train all models and evaluate them",
`Unsupervised Anomaly Detection Brain-MRI.ipynb`): downloads BrainWeb if a
data directory is configured, then runs every experiment preset in
sequence.  With ``--synthetic`` the whole sweep runs hermetically on the
procedural phantom dataset (useful as an integration test).

Usage:
  python examples/run_all.py --synthetic -E 1 -w 32 -g 32 -s 0 -e 8 -z 16 -b 8
  # (-b 8: the synthetic phantom's training pool is smaller than the
  #  b=128 presets' batch)
  python examples/run_all.py -c config.default.json --download
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

# runnable from any working directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main as cli_main
from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    EXPERIMENT_PRESETS,
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--download", action="store_true",
                    help="download BrainWeb first")
    ap.add_argument("--presets", default=None,
                    help="comma-separated subset (default: all)")
    args, passthrough = ap.parse_known_args()

    if args.download:
        import json

        from unsupervised_anomaly_detection_brain_mri_tpu.data.download import (
            download_brainweb_dataset,
        )

        cfg_path = "config.default.json"
        for i, a in enumerate(passthrough):
            if a in ("-c", "--config"):
                cfg_path = passthrough[i + 1]
        with open(cfg_path) as f:
            target = json.load(f)["BRAINWEBDIR"]
        print(f"Downloading BrainWeb into {target} ...")
        download_brainweb_dataset(target)

    presets = (args.presets.split(",") if args.presets
               else list(EXPERIMENT_PRESETS))
    failed = []
    for name in presets:
        print(f"\n===== {name} =====")
        try:
            rc = cli_main(["--preset", name] + passthrough)
            if rc != 0:
                failed.append(name)
        except Exception:
            traceback.print_exc()
            failed.append(name)
    if failed:
        print(f"\nFAILED presets: {failed}")
        return 1
    print(f"\nAll {len(presets)} presets completed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
