"""Format-reader hardening (round-1 VERDICT item #7).

The hand-rolled readers in data/formats.py replace SimpleITK / nibabel /
pynrrd (reference `utils/NII.py:12-16`, `dataloaders/NRRD.py`); every
advertised branch is exercised here with independently hand-crafted files:
big-endian NIfTI, scl_slope/scl_inter scaling, integer datatypes, MINC2
(HDF5), per-slice MINC1 renormalisation, big-endian + detached-header NRRD,
and malformed-header rejection.
"""

import gzip
import struct

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.data import formats


# ---------------------------------------------------------------------------
# hand-crafted writers (independent of the library's write paths)


def craft_nifti(path, data, byte_order="<", dtype=np.float32,
                scl_slope=0.0, scl_inter=0.0, magic=b"n+1\x00",
                sizeof_hdr=348, gz=False):
    data = np.asarray(data).astype(dtype)
    hdr = bytearray(352)
    struct.pack_into(byte_order + "i", hdr, 0, sizeof_hdr)
    struct.pack_into(byte_order + "8h", hdr, 40, 3, *data.shape, 1, 1, 1, 1)
    code = {np.dtype(np.uint8): 2, np.dtype(np.int16): 4,
            np.dtype(np.int32): 8, np.dtype(np.float32): 16,
            np.dtype(np.float64): 64, np.dtype(np.uint16): 512}[
        np.dtype(dtype)]
    struct.pack_into(byte_order + "h", hdr, 70, code)
    struct.pack_into(byte_order + "h", hdr, 72, data.dtype.itemsize * 8)
    struct.pack_into(byte_order + "8f", hdr, 76, 1.0, 1.0, 1.0, 1.0,
                     1.0, 1.0, 1.0, 1.0)
    struct.pack_into(byte_order + "f", hdr, 108, 352.0)
    struct.pack_into(byte_order + "f", hdr, 112, scl_slope)
    struct.pack_into(byte_order + "f", hdr, 116, scl_inter)
    hdr[344:348] = magic
    payload = bytes(hdr) + data.astype(
        data.dtype.newbyteorder(byte_order)).tobytes(order="F")
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


# ---------------------------------------------------------------------------
# NIfTI


def test_nifti_big_endian(tmp_path, rng):
    data = rng.uniform(0, 100, (7, 6, 5)).astype(np.float32)
    p = str(tmp_path / "be.nii")
    craft_nifti(p, data, byte_order=">")
    back, meta = formats.read_nifti(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_nifti_scl_scaling(tmp_path, rng):
    raw = rng.integers(-500, 500, (6, 5, 4)).astype(np.int16)
    p = str(tmp_path / "scl.nii")
    craft_nifti(p, raw, dtype=np.int16, scl_slope=2.5, scl_inter=10.0)
    back, _ = formats.read_nifti(p)
    np.testing.assert_allclose(back, raw.astype(np.float64) * 2.5 + 10.0,
                               rtol=1e-6)


def test_nifti_slope_zero_ignores_inter(tmp_path, rng):
    raw = rng.integers(0, 255, (4, 4, 4)).astype(np.uint8)
    p = str(tmp_path / "inter.nii")
    # NIfTI-1 spec: scl_slope == 0 means NO scaling — scl_inter must be
    # ignored too (ANALYZE-derived headers leave garbage there)
    craft_nifti(p, raw, dtype=np.uint8, scl_slope=0.0, scl_inter=-3.0)
    back, _ = formats.read_nifti(p)
    np.testing.assert_allclose(back, raw.astype(np.float64))


def test_nifti_nonfinite_scl_ignored(tmp_path, rng):
    raw = rng.integers(0, 255, (4, 4, 4)).astype(np.uint8)
    p = str(tmp_path / "nan_inter.nii")
    # a NaN scl_inter with slope 0 must not turn the whole volume NaN
    craft_nifti(p, raw, dtype=np.uint8, scl_slope=0.0,
                scl_inter=float("nan"))
    back, _ = formats.read_nifti(p)
    np.testing.assert_allclose(back, raw.astype(np.float64))


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32,
                                   np.uint16, np.float64])
def test_nifti_integer_datatypes(tmp_path, rng, dtype):
    raw = rng.integers(0, 100, (5, 4, 3)).astype(dtype)
    p = str(tmp_path / f"dt_{np.dtype(dtype).name}.nii")
    craft_nifti(p, raw, dtype=dtype)
    back, _ = formats.read_nifti(p)
    np.testing.assert_allclose(back, raw.astype(np.float64))


def test_nifti_big_endian_gzipped(tmp_path, rng):
    data = rng.uniform(0, 1, (5, 5, 5)).astype(np.float32)
    p = str(tmp_path / "be.nii.gz")
    craft_nifti(p, data, byte_order=">", gz=True)
    back, _ = formats.read_nifti(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_nifti_rejects_bad_sizeof_hdr(tmp_path):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError, match="not a NIfTI"):
        formats.read_nifti(p)


def test_nifti_rejects_bad_magic(tmp_path, rng):
    p = str(tmp_path / "badmagic.nii")
    craft_nifti(p, rng.uniform(0, 1, (3, 3, 3)), magic=b"xxxx")
    with pytest.raises(ValueError, match="magic"):
        formats.read_nifti(p)


def test_nifti_rejects_unknown_datatype(tmp_path, rng):
    p = str(tmp_path / "baddt.nii")
    craft_nifti(p, rng.uniform(0, 1, (3, 3, 3)))
    blob = bytearray(open(p, "rb").read())
    struct.pack_into("<h", blob, 70, 1337)
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="datatype"):
        formats.read_nifti(p)


# ---------------------------------------------------------------------------
# MINC2 (HDF5)


def test_minc2_hdf5(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    data_zyx = rng.uniform(0, 1, (4, 5, 6))  # (z, y, x)
    p = str(tmp_path / "vol.mnc")
    with h5py.File(p, "w") as h5:
        ds = h5.create_dataset("minc-2.0/image/0/image", data=data_zyx)
        ds.attrs["dimorder"] = "zspace,yspace,xspace"
    back, meta = formats.read_minc(p)
    assert meta["format"] == "minc2"
    # loader returns (x, y, z)
    np.testing.assert_allclose(back, np.transpose(data_zyx, (2, 1, 0)))


def test_minc2_hdf5_gzipped(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    data_zyx = rng.uniform(0, 1, (3, 4, 5))
    raw = str(tmp_path / "raw.mnc")
    with h5py.File(raw, "w") as h5:
        h5.create_dataset("minc-2.0/image/0/image", data=data_zyx)
    gz = str(tmp_path / "vol.mnc.gz")
    with open(raw, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    back, meta = formats.read_minc(gz)
    assert meta["format"] == "minc2"
    np.testing.assert_allclose(back, np.transpose(data_zyx, (2, 1, 0)))


def test_minc1_per_slice_renormalisation(tmp_path):
    """MINC1 stores ints in valid_range with per-slice image-min/max."""
    from scipy.io import netcdf_file
    import io

    z, y, x = 3, 4, 5
    true = np.linspace(0, 1, z * y * x).reshape(z, y, x)  # per-slice ranges
    imin = true.reshape(z, -1).min(axis=1)
    imax = true.reshape(z, -1).max(axis=1)
    vmin, vmax = 0.0, 4095.0
    stored = np.round((true - imin[:, None, None])
                      / (imax - imin)[:, None, None] * (vmax - vmin))

    buf = io.BytesIO()
    nc = netcdf_file(buf, "w")
    nc.createDimension("zspace", z)
    nc.createDimension("yspace", y)
    nc.createDimension("xspace", x)
    var = nc.createVariable("image", np.int16,
                            ("zspace", "yspace", "xspace"))
    var[:] = stored.astype(np.int16)
    var._attributes["valid_range"] = np.array([vmin, vmax])
    vmin_var = nc.createVariable("image-min", np.float64, ("zspace",))
    vmin_var[:] = imin
    vmax_var = nc.createVariable("image-max", np.float64, ("zspace",))
    vmax_var[:] = imax
    nc.flush()
    p = str(tmp_path / "renorm.mnc")
    with open(p, "wb") as f:
        f.write(buf.getvalue())
    nc.close()

    back, meta = formats.read_minc(p)
    assert meta["format"] == "minc1"
    np.testing.assert_allclose(back, np.transpose(true, (2, 1, 0)),
                               atol=(1.0 / vmax))


# ---------------------------------------------------------------------------
# NRRD


def test_nrrd_big_endian(tmp_path, rng):
    data = rng.uniform(0, 1, (6, 5, 4)).astype(np.float32)
    p = str(tmp_path / "be.nrrd")
    header = ("NRRD0004\ntype: float\ndimension: 3\n"
              "sizes: 6 5 4\nencoding: raw\nendian: big\n\n")
    with open(p, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.astype(">f4").tobytes(order="F"))
    back, _ = formats.read_nrrd(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_nrrd_detached_header(tmp_path, rng):
    """.nhdr with a separate data file (the MSSEG2008 raw layout)."""
    data = rng.integers(0, 1000, (4, 5, 6)).astype(np.uint16)
    (tmp_path / "payload.raw").write_bytes(data.tobytes(order="F"))
    p = str(tmp_path / "vol.nhdr")
    with open(p, "w") as f:
        f.write("NRRD0004\ntype: ushort\ndimension: 3\nsizes: 4 5 6\n"
                "encoding: raw\nendian: little\n"
                "data file: payload.raw\n\n")
    back, _ = formats.read_nrrd(p)
    np.testing.assert_allclose(back, data.astype(np.float64))


def test_nrrd_detached_gzip_payload(tmp_path, rng):
    data = rng.uniform(0, 1, (3, 4, 5)).astype(np.float32)
    (tmp_path / "payload.raw.gz").write_bytes(
        gzip.compress(data.tobytes(order="F")))
    p = str(tmp_path / "vol.nhdr")
    with open(p, "w") as f:
        f.write("NRRD0004\ntype: float\ndimension: 3\nsizes: 3 4 5\n"
                "encoding: gzip\nendian: little\n"
                "data file: payload.raw.gz\n\n")
    back, _ = formats.read_nrrd(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_nrrd_rejects_non_nrrd(tmp_path):
    p = str(tmp_path / "x.nrrd")
    with open(p, "wb") as f:
        f.write(b"JUNKJUNKJUNK")
    with pytest.raises(ValueError, match="not a NRRD"):
        formats.read_nrrd(p)


def test_nrrd_rejects_missing_terminator(tmp_path):
    p = str(tmp_path / "noterm.nrrd")
    with open(p, "wb") as f:
        f.write(b"NRRD0004\ntype: float\nsizes: 2 2 2\nencoding: raw\n")
    with pytest.raises(ValueError, match="terminator"):
        formats.read_nrrd(p)


def test_nrrd_rejects_unknown_encoding(tmp_path):
    p = str(tmp_path / "enc.nrrd")
    with open(p, "wb") as f:
        f.write(b"NRRD0004\ntype: float\ndimension: 3\nsizes: 2 2 2\n"
                b"encoding: bzip2\n\n" + b"\x00" * 32)
    with pytest.raises(ValueError, match="encoding"):
        formats.read_nrrd(p)


def test_read_volume_rejects_unknown_extension(tmp_path):
    p = str(tmp_path / "vol.dicom")
    open(p, "wb").close()
    with pytest.raises(ValueError, match="unknown volume format"):
        formats.read_volume(p)


# ---------------------------------------------------------------------------
# cross-path consistency: hand-rolled reader vs the C++ native cache path


def test_nifti_roundtrip_through_native_cache(tmp_path, rng):
    native = pytest.importorskip(
        "unsupervised_anomaly_detection_brain_mri_tpu.data.native")
    if not native.available():
        pytest.skip("native library not built")
    data = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    p = str(tmp_path / "v.nii.gz")
    formats.write_nifti(p, data)
    back, _ = formats.read_nifti(p)
    slices = np.transpose(back.astype(np.float32), (2, 0, 1))  # (n, h, w)
    labels = np.zeros_like(slices)
    sets = np.zeros((slices.shape[0],), np.int32)
    cache = str(tmp_path / "c.bin")
    native.write_cache(cache, slices, labels, sets)
    imgs, labs, s = native.read_cache(cache)
    np.testing.assert_allclose(np.asarray(imgs), slices, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(s), sets)


def test_nifti_qform_only_affine(tmp_path):
    """sform_code=0 + qform_code=1: the affine must come from the
    quaternion (rotation+origin), not degrade to a diagonal pixdim matrix
    (NIfTI-1 method 2; geometry-preserving export depends on this)."""
    import struct

    import numpy as np

    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        read_nifti,
        write_nifti,
    )

    path = str(tmp_path / "qform.nii")
    data = np.random.default_rng(0).uniform(size=(5, 6, 7)).astype(
        np.float32)
    write_nifti(path, data)
    raw = bytearray(open(path, "rb").read())
    # strip the sform, set a quaternion qform: 90-degree rotation about z
    # (b=c=0, d=sin(45deg)) with origin (-90, -126, -72) and pixdim 2,2,2
    struct.pack_into("<h", raw, 254, 0)               # sform_code = 0
    struct.pack_into("<h", raw, 252, 1)               # qform_code = 1
    d = np.sin(np.pi / 4)
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, d)    # quatern_b,c,d
    struct.pack_into("<3f", raw, 268, -90.0, -126.0, -72.0)  # offsets
    struct.pack_into("<8f", raw, 76, 1.0, 2.0, 2.0, 2.0, 1.0, 1.0, 1.0,
                     1.0)
    open(path, "wb").write(bytes(raw))

    _, meta = read_nifti(path)
    aff = np.asarray(meta["affine"])
    # origin preserved
    assert np.allclose(aff[:, 3], [-90.0, -126.0, -72.0])
    # rotation about z: x-axis maps to +y at scale 2
    assert np.allclose(aff[:3, :3],
                       [[0, -2, 0], [2, 0, 0], [0, 0, 2]], atol=1e-5)


def test_minc2_nondefault_dimorder_str_attr(tmp_path, rng):
    """h5py returns string attrs as str (not bytes); a non-default
    dimorder stored that way must still be honored — falling back to
    zspace,yspace,xspace silently transposes the volume."""
    h5py = pytest.importorskip("h5py")
    data_xyz = rng.uniform(0, 1, (6, 5, 4))  # stored as (x, y, z)
    p = str(tmp_path / "vol.mnc")
    with h5py.File(p, "w") as h5:
        ds = h5.create_dataset("minc-2.0/image/0/image", data=data_xyz)
        ds.attrs["dimorder"] = "xspace,yspace,zspace"  # str, not bytes
    back, meta = formats.read_minc(p)
    assert meta["dims"] == ["xspace", "yspace", "zspace"]
    # loader returns (x, y, z) -> already in storage order here
    np.testing.assert_allclose(back, data_xyz)

    # bytes spelling of the same attr behaves identically
    p2 = str(tmp_path / "vol2.mnc")
    with h5py.File(p2, "w") as h5:
        ds = h5.create_dataset("minc-2.0/image/0/image", data=data_xyz)
        ds.attrs["dimorder"] = np.bytes_(b"xspace,yspace,zspace")
    back2, _ = formats.read_minc(p2)
    np.testing.assert_allclose(back2, data_xyz)
