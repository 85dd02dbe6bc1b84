"""On-device ops: metrics, morphology, filtering, connected components.

Replaces the reference's host-side scipy/sklearn/skimage evaluation kernels
(`utils/Evaluation.py`, `trainers/Metrics.py`) with jit-compiled XLA (and
Pallas where profitable) so the eval pipeline never leaves HBM.
"""
