"""Host-side utilities: logging, plotting, misc helpers."""

from unsupervised_anomaly_detection_brain_mri_tpu.utils.logger import (  # noqa: F401
    Logger,
)
from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (  # noqa: F401
    apply_colormap,
    normalize,
    timestamp,
)
