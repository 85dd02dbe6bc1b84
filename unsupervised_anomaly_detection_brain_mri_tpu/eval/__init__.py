"""Evaluation pipeline: volume-wise anomaly segmentation scoring.

TPU-native counterpart of `utils/Evaluation.py` (SURVEY.md section 2.6):
whole volumes are reconstructed in one jitted batch (vs the reference's
batch-1 per-slice `sess.run`), and all post-processing (residuals, brainmask
erosion, 3-D median filtering, threshold sweeps, connected components)
runs on device via `ops/`.
"""

from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (  # noqa: F401
    determine_threshold_on_labeled_patients,
    evaluate,
)
