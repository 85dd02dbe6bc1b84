"""Data-layer tests: format round-trips + real dataset loaders over
generated fixture trees (SURVEY.md section 4(a))."""

import gzip
import json
import os

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.data import formats
from unsupervised_anomaly_detection_brain_mri_tpu.data.volume import (
    MINC,
    NII,
    NRRD,
)


# ---------------------------------------------------------------------------
# format round-trips


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.uniform(0, 100, (7, 9, 5)).astype(np.float32)
    p = str(tmp_path / "vol.nii.gz")
    formats.write_nifti(p, data)
    back, meta = formats.read_nifti(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    # uncompressed too
    p2 = str(tmp_path / "vol.nii")
    formats.write_nifti(p2, data)
    np.testing.assert_allclose(formats.read_nifti(p2)[0], data, rtol=1e-6)


def test_nrrd_roundtrip(tmp_path, rng):
    data = rng.uniform(0, 1, (6, 8, 4)).astype(np.float32)
    for enc in ("raw", "gzip"):
        p = str(tmp_path / f"vol_{enc}.nrrd")
        formats.write_nrrd(p, data, encoding=enc)
        back, meta = formats.read_nrrd(p)
        np.testing.assert_allclose(back, data, rtol=1e-6)


def test_minc1_roundtrip(tmp_path, rng):
    data = rng.uniform(0, 10, (5, 6, 7)).astype(np.float64)
    p = str(tmp_path / "vol.mnc.gz")
    formats.write_minc1(p, data)
    back, meta = formats.read_minc(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    assert meta["format"] == "minc1"


def test_volume_normalize_scaling(rng):
    v = NII(data=rng.uniform(0, 1000, (10, 10, 10)))
    v.normalize(method="scaling", lowerpercentile=0.0, upperpercentile=99.8)
    assert 0.999 <= v.data.max() <= 1.0
    assert v.data.min() >= 0.0


def test_volume_slicing_and_view_mapping(rng):
    v = NII(data=rng.uniform(size=(4, 5, 6)))
    assert v.num_slices_along_axis("axial") == 6
    np.testing.assert_array_equal(v.get_slice(2, "axial"), v.data[:, :, 2])
    v.set_view_mapping({"saggital": 2, "coronal": 1, "axial": 0})
    assert v.num_slices_along_axis("axial") == 4
    np.testing.assert_array_equal(v.get_slice(1, "axial"), v.data[1])


# ---------------------------------------------------------------------------
# fixture trees


def _make_brainweb_tree(root, rng, n_per_type=2, size=24, depth=30):
    """Tiny BrainWeb layout: T2 phantoms + crisp label groundtruths."""
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_minc1,
    )

    # groundtruth label volumes (one per severity)
    gt_dir = os.path.join(root, "groundtruth")
    os.makedirs(gt_dir, exist_ok=True)
    labels = np.zeros((size, size, depth))
    labels[4:20, 4:20, 5:25] = 3  # WM
    labels[8:16, 8:16, 10:20] = 2  # GM
    labels[0:3] = 7  # SKULL
    lesion_labels = labels.copy()
    lesion_labels[10:13, 10:13, 12:16] = 10  # LESION
    write_minc1(os.path.join(gt_dir, "normal.mnc.gz"), labels)
    for sev in ("mild", "moderate", "severe"):
        write_minc1(os.path.join(gt_dir, f"{sev}_lesions.mnc.gz"),
                    lesion_labels)

    for folder, lesioned in (("normal", False),
                             (os.path.join("lesions", "severe"), True)):
        d = os.path.join(root, folder)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_type):
            vol = rng.uniform(0, 0.2, (size, size, depth))
            vol[labels > 0] += 0.5
            if lesioned:
                vol[lesion_labels == 10] = 1.0
            tag = "msles3" if lesioned else "normal"
            write_minc1(os.path.join(d, f"t2_{tag}_p{i}_pn0_rf0.mnc.gz"), vol)


def test_brainweb_loader(tmp_path, rng):
    from unsupervised_anomaly_detection_brain_mri_tpu.data.brainweb import (
        BRAINWEB,
        BrainwebOptions,
    )

    root = str(tmp_path / "brainweb")
    os.makedirs(root)
    _make_brainweb_tree(root, rng)
    opts = BrainwebOptions(
        dir=root, sliceStart=2, sliceEnd=28, sliceResolution=(16, 16),
        partition={"TRAIN": 0.5, "VAL": 0.5, "TEST": 0.0},
        filterType=("NORMAL",), filterProtocol=("T2",), cache=True)
    ds = BRAINWEB(opts)
    assert len(ds.patients) == 2
    x = ds.slices("TRAIN")
    assert x.ndim == 4 and x.shape[1:] == (16, 16, 1)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0

    # next_batch reference API
    imgs, labs, bm = ds.next_batch(4, set="TRAIN", return_brainmask=True)
    assert imgs.shape == (4, 16, 16, 1) and bm.shape == (4, 16, 16)

    # split persisted + cache reused
    assert os.path.isfile(ds.split_path())
    assert (os.path.isfile(ds.cache_path())
            or os.path.isfile(ds.cache_path().replace(".npz", ".uadc")))
    ds2 = BRAINWEB(opts)
    assert ds2.patients_split == ds.patients_split
    np.testing.assert_array_equal(ds2.slices("TRAIN"), x)

    # lesion GT binarised on the severe set
    opts_l = BrainwebOptions(
        dir=root, sliceStart=2, sliceEnd=28, sliceResolution=(16, 16),
        partition={"TRAIN": 0.0, "VAL": 0.0, "TEST": 1.0},
        filterType=("SEVEREMS",), cache=False)
    dsl = BRAINWEB(opts_l)
    vol, gt, brain, skull = dsl.load_volume_and_groundtruth(
        dsl.patients_of("TEST")[0])
    assert set(np.unique(gt)).issubset({0.0, 1.0})
    assert gt.sum() > 0
    assert vol.shape == gt.shape == skull.shape


def _make_msisbi_tree(root, rng, size=20, depth=24):
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nifti,
    )

    for f in ("training01", "training02"):
        pre = os.path.join(root, f, "preprocessed")
        masks = os.path.join(root, f, "masks")
        os.makedirs(pre, exist_ok=True)
        os.makedirs(masks, exist_ok=True)
        name = f + "_01"
        vol = rng.uniform(0.3, 1.0, (depth, size, size))
        write_nifti(os.path.join(pre, f"{name}_flair_pp.nii"), vol)
        gt = np.zeros((depth, size, size))
        gt[10:14, 8:12, 8:12] = 1.0
        write_nifti(os.path.join(masks, f"{name}_mask1.nii"), gt)
        write_nifti(os.path.join(pre, f"{name}_skullmap.nii.gz"),
                    np.ones((depth, size, size)))


def test_msisbi2015_loader(tmp_path, rng):
    from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
        MSISBI2015,
        MSOptions,
    )

    root = str(tmp_path / "isbi")
    os.makedirs(root)
    _make_msisbi_tree(root, rng)
    opts = MSOptions(
        dir=root, sliceStart=0, sliceEnd=20, sliceResolution=(16, 16),
        partition={"TRAIN": 0.0, "VAL": 0.5, "TEST": 0.5},
        filterProtocol=("FLAIR",), cache=False)
    ds = MSISBI2015(opts)
    assert len(ds.patients) == 2
    # axial axis is volume axis 0 for MS datasets
    assert ds.patients[0]["filtered_files"][0].endswith("_flair_pp.nii")
    test_slices = ds.slices("TEST")
    assert test_slices.shape[1:] == (16, 16, 1)
    vol, gt, brain, skull = ds.load_volume_and_groundtruth(
        ds.patients_of("TEST")[0])
    assert set(np.unique(gt)).issubset({0.0, 1.0})


def _make_msseg_tree(root, rng, size=20, depth=24):
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nrrd,
    )

    d = os.path.join(root, "train_part1", "UNC_train_Case01")
    os.makedirs(d, exist_ok=True)
    name = "UNC_train_Case01"
    vol = rng.uniform(0.3, 1.0, (depth, size, size))
    write_nrrd(os.path.join(d, f"{name}_FLAIR.nhdr"), vol)
    gt = np.zeros((depth, size, size))
    gt[5:9, 5:9, 5:9] = 1.0
    write_nrrd(os.path.join(d, f"{name}_lesion.nhdr"), gt)
    write_nrrd(os.path.join(d, f"{name}_skullmap.nhdr"),
               np.ones((depth, size, size)))


def test_msseg2008_loader(tmp_path, rng):
    from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
        MSSEG2008,
        MSSEG2008Options,
    )

    root = str(tmp_path / "msseg")
    os.makedirs(root)
    _make_msseg_tree(root, rng)
    opts = MSSEG2008Options(
        dir=root, sliceStart=0, sliceEnd=20, sliceResolution=(16, 16),
        partition={"TRAIN": 0.0, "VAL": 0.0, "TEST": 1},
        filterProtocol=("FLAIR",), cache=False)
    ds = MSSEG2008(opts)
    assert len(ds.patients) == 1
    assert ds.slices("TEST").shape[1:] == (16, 16, 1)


def test_brainweb_downloader_layout(tmp_path, rng):
    """Downloader writes the loader's expected layout (fake opener)."""
    import io

    from unsupervised_anomaly_detection_brain_mri_tpu.data.download import (
        download_brainweb_dataset,
    )

    calls = []

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_opener(req):
        calls.append(req.data)
        return FakeResp(gzip.compress(b"fake-minc"))

    download_brainweb_dataset(
        str(tmp_path), phantoms=["normal", "msles3"],
        noise_levels=("pn0",), inu_levels=("rf0",), opener=fake_opener)
    assert os.path.isfile(
        os.path.join(tmp_path, "normal", "t2_normal_pn0_rf0.mnc.gz"))
    assert os.path.isfile(
        os.path.join(tmp_path, "lesions", "severe",
                     "t2_msles3_pn0_rf0.mnc.gz"))
    assert os.path.isfile(
        os.path.join(tmp_path, "groundtruth", "normal.mnc.gz"))
    assert os.path.isfile(
        os.path.join(tmp_path, "groundtruth", "severe_lesions.mnc.gz"))
    assert len(calls) == 4


def test_msisbi2015_gathers_all_protocol_volumes(tmp_path, rng):
    """The slice pool is built from EVERY protocol volume of a patient
    (`MSISBI2015.py:127-132` iterates all filtered_files), not only the
    first; the eval-path volume reload still uses the first file only
    (the reference's `len(diffs)==0` guard, `Evaluation.py:202-204`)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nifti,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
        MSISBI2015,
        MSOptions,
    )

    root = str(tmp_path / "isbi")
    _make_msisbi_tree(root, rng)
    # add a T2 volume next to each patient's FLAIR
    for f in ("training01", "training02"):
        pre = os.path.join(root, f, "preprocessed")
        name = f + "_01"
        write_nifti(os.path.join(pre, f"{name}_t2_pp.nii"),
                    rng.uniform(0.3, 1.0, (24, 20, 20)))

    common = dict(dir=root, sliceStart=0, sliceEnd=20,
                  sliceResolution=(16, 16),
                  partition={"TRAIN": 0.0, "VAL": 0.5, "TEST": 0.5},
                  cache=False)
    ds_flair = MSISBI2015(MSOptions(filterProtocol=("FLAIR",), **common))
    ds_both = MSISBI2015(MSOptions(filterProtocol=("FLAIR", "T2"),
                                   **common))
    assert len(ds_both.patients[0]["filtered_files"]) == 2
    # both protocols contribute slices -> twice the pool
    assert (len(ds_both.slices("TEST")) + len(ds_both.slices("VAL"))
            == 2 * (len(ds_flair.slices("TEST"))
                    + len(ds_flair.slices("VAL"))))


def test_next_batch_shuffle_after_unshuffled_epoch_start(tmp_path, rng):
    """Wrapping with shuffle=True after the epoch STARTED with
    shuffle=False must not crash on the lazily-created order table."""
    from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
        MSISBI2015,
        MSOptions,
    )

    root = str(tmp_path / "isbi")
    _make_msisbi_tree(root, rng)
    ds = MSISBI2015(MSOptions(
        dir=root, sliceStart=0, sliceEnd=20, sliceResolution=(16, 16),
        partition={"TRAIN": 1.0, "VAL": 0.0, "TEST": 0.0},
        filterProtocol=("FLAIR",), cache=False))
    n = len(ds.slices("TRAIN"))
    assert n > 1
    bs = n - 1
    ds.next_batch(bs, shuffle=False, set="TRAIN")
    imgs, labs, _ = ds.next_batch(bs, shuffle=True, set="TRAIN")  # wraps
    assert imgs.shape[0] == bs


def test_nifti_detached_hdr_img_pair(tmp_path):
    """A .hdr/.img pair ('ni1' magic) reads voxels from the .img sibling
    at vox_offset 0 — not from past the header file's 348 bytes."""
    from unsupervised_anomaly_detection_brain_mri_tpu.data import formats

    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    one = str(tmp_path / "one.nii")
    formats.write_nifti(one, vol)
    with open(one, "rb") as f:
        raw = bytearray(f.read())
    # single-file -> detached pair: magic 'ni1\0', vox_offset 0
    raw[344:348] = b"ni1\x00"
    import struct

    struct.pack_into("<f", raw, 108, 0.0)
    hdr = tmp_path / "pair.hdr"
    hdr.write_bytes(bytes(raw[:352]))
    (tmp_path / "pair.img").write_bytes(bytes(raw[352:]))

    data, meta = formats.read_nifti(str(hdr))
    np.testing.assert_allclose(np.asarray(data, np.float32), vol)

    (tmp_path / "pair.img").unlink()
    with pytest.raises(FileNotFoundError):
        formats.read_nifti(str(hdr))


def test_pad_batch_to_pads_beyond_batch_size():
    from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
        pad_batch_to,
    )

    out = pad_batch_to(np.arange(12, dtype=np.float32).reshape(3, 4), 8)
    assert out.shape == (8, 4)
    np.testing.assert_array_equal(out[3:6], out[:3])  # tiled filler
    assert pad_batch_to(np.zeros((8, 2)), 4).shape == (8, 2)  # no-op
