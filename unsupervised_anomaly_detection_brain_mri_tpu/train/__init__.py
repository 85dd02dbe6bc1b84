"""Training layer: losses, train state, jitted epoch engines, trainers."""

from unsupervised_anomaly_detection_brain_mri_tpu.train.registry import (  # noqa: F401
    TRAINER_REGISTRY,
    get_trainer,
)
