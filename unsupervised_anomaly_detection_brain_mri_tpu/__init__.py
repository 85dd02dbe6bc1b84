"""TPU-native unsupervised brain-MRI anomaly detection framework.

A ground-up JAX/Flax/XLA/Pallas re-design of the capabilities of the Baur et
al. comparative-study codebase (reference:
StefanDenn3r/Unsupervised_Anomaly_Detection_Brain_MRI): the full convolutional
autoencoder model zoo for unsupervised anomaly segmentation in brain MR
images, trained on healthy axial slices and evaluated by thresholded
reconstruction residuals (DICE / AUROC / AUPRC).

Design principles (TPU-first, not a port):
  * All compute-path code is functional JAX, jit-compiled once per shape:
    training epochs run as a single `lax.scan` on device, evaluation
    post-processing (residuals, brainmask erosion, 3-D median filtering,
    connected components, threshold sweeps) is on-device XLA/Pallas.
  * Scaling is expressed through `jax.sharding.Mesh` + NamedSharding; data
    parallelism is a config knob, and collectives are inserted by XLA.
  * Host code (volume I/O, caching, CLI) stays on the host; device code never
    crosses the host boundary inside the hot loop.

Import alias: ``import unsupervised_anomaly_detection_brain_mri_tpu as uad``.
"""

__version__ = "0.1.0"

from unsupervised_anomaly_detection_brain_mri_tpu.config import (  # noqa: F401
    Config,
    Options,
    default_options,
)
