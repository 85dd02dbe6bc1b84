"""Test configuration: force a virtual 8-device CPU platform.

Multi-device code paths (mesh/pjit/collectives) are exercised without TPU
hardware via XLA host-device emulation, per SURVEY.md section 4(e).
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's TPU plugin prepends itself to jax_platforms regardless of
# JAX_PLATFORMS; force the CPU platform explicitly before any backend init.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - backend already initialised
    pass

# Persistent XLA compile cache: the suite is compile-dominated on this
# 1-core host (most test wall-clock is jit of near-identical graphs), so
# warm re-runs drop far below the cold time.  Safe: keyed by HLO content
# hash.  Lives under the repo (gitignored) so `rm -rf .cache` resets it.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax_compile")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax without the knobs
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_dataset():
    from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
        SYNTH,
        SyntheticOptions,
    )

    return SYNTH(SyntheticOptions(
        numPatients=6, imageSize=32, numSlices=8, targetSize=32))


@pytest.fixture(scope="session")
def synth_lesion_dataset():
    from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
        SYNTH,
        SyntheticOptions,
    )

    return SYNTH(SyntheticOptions(
        numPatients=4, imageSize=32, numSlices=8, targetSize=32,
        withLesions=True,
        partition={"TRAIN": 0.0, "VAL": 0.5, "TEST": 0.5}))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
