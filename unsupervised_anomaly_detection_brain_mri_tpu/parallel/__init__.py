"""SPMD parallelism layer: device meshes, sharding rules, collectives.

The reference was strictly single-device (`run.py:50`); this layer is new
and makes scaling a config knob (see SURVEY.md section 2.8).
"""

from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    make_mesh,
)
