"""Model zoo: 16 convolutional autoencoder variants as Flax modules.

Parity map to the reference `models/` directory (see SURVEY.md section 2.4).
Each module returns a dict of named output tensors with the same keys as the
reference network functions, so trainers/evaluation stay model-agnostic.
"""

from unsupervised_anomaly_detection_brain_mri_tpu.models.registry import (  # noqa: F401
    MODEL_REGISTRY,
    get_model,
)
