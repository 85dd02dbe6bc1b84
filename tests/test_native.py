"""Native C++ data-path library tests (parity vs numpy/cv2)."""

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain available")


def test_percentile_normalize_matches_numpy(rng):
    data = rng.uniform(0, 1000, (40, 40, 10)).astype(np.float32)
    expected = data.copy()
    qlow = np.percentile(expected, 1.0)
    qup = np.percentile(expected, 99.8)
    expected = np.clip(expected, qlow, qup)
    expected = expected / expected.max()
    got = native.percentile_normalize(data.copy(), 1.0, 99.8, "scaling")
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_percentile_normalize_standardization(rng):
    data = rng.uniform(0, 10, 5000).astype(np.float32)
    got = native.percentile_normalize(data.copy(), None, None,
                                      "standardization")
    np.testing.assert_allclose(got.mean(), 0.0, atol=1e-4)
    np.testing.assert_allclose(got.std(), 1.0, atol=1e-3)


def test_resize_bilinear_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = rng.uniform(size=(37, 29)).astype(np.float32)
    got = native.resize_bilinear(src, 16, 20)
    expected = cv2.resize(src, (20, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_resize_nearest_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = rng.uniform(size=(32, 32)).astype(np.float32)
    got = native.resize_nearest(src, 16, 16)
    expected = cv2.resize(src, (16, 16), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_cache_roundtrip(tmp_path, rng):
    images = rng.uniform(size=(12, 8, 8)).astype(np.float32)
    labels = rng.uniform(size=(12, 8, 8)).astype(np.float32)
    sets = rng.integers(0, 3, 12).astype(np.int32)
    p = str(tmp_path / "slices.uadc")
    native.write_cache(p, images, labels, sets)
    for mmap in (True, False):
        ri, rl, rs = native.read_cache(p, mmap=mmap)
        np.testing.assert_array_equal(np.asarray(ri), images)
        np.testing.assert_array_equal(np.asarray(rl), labels)
        np.testing.assert_array_equal(np.asarray(rs), sets)


def test_cache_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.uadc")
    with open(p, "wb") as f:
        f.write(b"NOTACACHE" + b"\x00" * 64)
    with pytest.raises(IOError):
        native.read_cache(p)
