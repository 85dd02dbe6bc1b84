"""Pallas kernel tests (interpreter mode on CPU; hardware path exercised by
bench.py / TPU eval)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_median import (
    median_filter_3d_pallas,
)


def test_pallas_median_matches_scipy_interpret(rng):
    vol = rng.uniform(size=(8, 16, 16)).astype(np.float32)
    got = np.asarray(median_filter_3d_pallas(
        jnp.asarray(vol), cs=4, interpret=True))
    expected = ndi.median_filter(vol, size=5)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_pallas_median_nondivisible_slices(rng):
    vol = rng.uniform(size=(7, 16, 16)).astype(np.float32)
    got = np.asarray(median_filter_3d_pallas(
        jnp.asarray(vol), cs=4, interpret=True))
    expected = ndi.median_filter(vol, size=5)
    np.testing.assert_allclose(got, expected, atol=1e-6)
