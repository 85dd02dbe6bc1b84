"""Hermetic one-subject BrainWeb fixture: gz-MINC1 -> loader -> train -> eval.

`tests/test_realdata_smoke.py` (the networked first-user flow) skips in
zero-egress environments, so everything after the HTTP exchange in
`data/download.py` is proven here instead: the fixture volumes are written
through scipy's NetCDF writer — independent of this package's MINC reader —
in the exact on-disk layout the real archive delivers (MINC1 int16 with
``valid_range`` + per-slice ``image-min``/``image-max`` renormalisation,
gzipped, BrainWeb's directory and file naming per
`dataloaders/BRAINWEB.py:58-91`).  The test then drives the full product
path on those files: decompress -> MINC1 parse -> view mapping ->
tissue-label skullmap -> lesion-GT binarisation (label 10) -> percentile
normalization -> axial slicing/resize -> AE training -> whole `evaluate()`.
Only the network exchange itself remains covered solely by the (gated)
smoke test.
"""

import gzip
import io
import os
import tempfile

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.data.brainweb import (
    BRAINWEB,
    LABELS,
    BrainwebOptions,
)

N = 40  # cubic fixture volume edge


def _write_minc1_gz(path, data_xyz, renormalize):
    """MINC1 (NetCDF) gz file via scipy, in BrainWeb's storage layout.

    ``renormalize=True`` stores int16 in ``valid_range`` with per-slice
    ``image-min``/``image-max`` (how the simulated intensity volumes ship);
    ``False`` stores raw int16 labels (exact round-trip for crisp
    tissue-label groundtruth).
    """
    from scipy.io import netcdf_file

    zyx = np.transpose(np.asarray(data_xyz, np.float64), (2, 1, 0))
    z, y, x = zyx.shape
    buf = io.BytesIO()
    nc = netcdf_file(buf, "w")
    nc.createDimension("zspace", z)
    nc.createDimension("yspace", y)
    nc.createDimension("xspace", x)
    var = nc.createVariable("image", np.int16,
                            ("zspace", "yspace", "xspace"))
    if renormalize:
        vmax = 4095.0
        imin = zyx.reshape(z, -1).min(axis=1)
        imax = zyx.reshape(z, -1).max(axis=1)
        span = np.where(imax > imin, imax - imin, 1.0)
        var[:] = np.round((zyx - imin[:, None, None]) / span[:, None, None]
                          * vmax).astype(np.int16)
        var._attributes["valid_range"] = np.array([0.0, vmax])
        vmin_var = nc.createVariable("image-min", np.float64, ("zspace",))
        vmin_var[:] = imin
        vmax_var = nc.createVariable("image-max", np.float64, ("zspace",))
        vmax_var[:] = imax
    else:
        var[:] = zyx.astype(np.int16)
    nc.flush()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wb") as g:
        g.write(buf.getvalue())
    nc.close()


def _phantom_labels(rng):
    """Crisp tissue-label volume (x, y, z): brain sphere (WM core, GM
    shell, CSF film) inside a SKULL ring and SKIN layer, BACKGROUND
    outside — the label set `dataloaders/BRAINWEB.py` keys its skullmap
    and lesion GT off."""
    c = (N - 1) / 2.0
    xx, yy, zz = np.mgrid[:N, :N, :N].astype(np.float64)
    r = np.sqrt((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2)
    lab = np.full((N, N, N), LABELS["BACKGROUND"], np.int16)
    lab[r < 17.5] = LABELS["SKIN"]
    lab[r < 16.0] = LABELS["SKULL"]
    lab[r < 14.5] = LABELS["CSF"]
    lab[r < 13.5] = LABELS["GM"]
    lab[r < 10.0] = LABELS["WM"]
    return lab


def _add_lesions(labels, rng):
    lab = labels.copy()
    c = N // 2
    for dx, dy, dz in ((-4, 2, 1), (3, -3, -2), (1, 4, 3)):
        xx, yy, zz = np.mgrid[:N, :N, :N].astype(np.float64)
        r = np.sqrt((xx - c - dx) ** 2 + (yy - c - dy) ** 2
                    + (zz - c - dz) ** 2)
        blob = (r < 2.5) & (lab == LABELS["WM"])
        lab[blob] = LABELS["LESION"]
    assert (lab == LABELS["LESION"]).sum() > 50
    return lab


def _t2_intensity(labels, rng):
    """T2-weighted-ish intensities per tissue + smooth noise; lesions
    hyperintense (the signal the residual pipeline detects)."""
    t2 = {LABELS["BACKGROUND"]: 30, LABELS["CSF"]: 3300, LABELS["GM"]: 1000,
          LABELS["WM"]: 700, LABELS["FAT"]: 800, LABELS["MUSCLE"]: 500,
          LABELS["SKIN"]: 600, LABELS["SKULL"]: 100,
          LABELS["GLIALMATTER"]: 1100, LABELS["CONNECTIVE"]: 650,
          LABELS["LESION"]: 2600}
    vol = np.zeros(labels.shape, np.float64)
    for lbl, val in t2.items():
        vol[labels == lbl] = val
    vol *= rng.uniform(0.93, 1.07, labels.shape)  # intensity texture
    return np.clip(vol, 0, None)


@pytest.fixture(scope="module")
def brainweb_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("brainweb_fixture"))
    rng = np.random.default_rng(7)
    normal = _phantom_labels(rng)
    lesioned = _add_lesions(normal, rng)
    # same directory/file naming the downloader writes
    # (`utils/brainweb_download.py:135-143` layout)
    _write_minc1_gz(os.path.join(root, "normal",
                                 "t2_icbm_normal_1mm_pn3_rf20.mnc.gz"),
                    _t2_intensity(normal, rng), renormalize=True)
    _write_minc1_gz(os.path.join(root, "lesions", "moderate",
                                 "t2_icbm_moderate_1mm_pn3_rf20.mnc.gz"),
                    _t2_intensity(lesioned, rng), renormalize=True)
    _write_minc1_gz(os.path.join(root, "groundtruth", "normal.mnc.gz"),
                    normal, renormalize=False)
    _write_minc1_gz(os.path.join(root, "groundtruth",
                                 "moderate_lesions.mnc.gz"),
                    lesioned, renormalize=False)
    return root


def _opts(root, **kw):
    return BrainwebOptions(dir=root, sliceStart=8, sliceEnd=32,
                           sliceResolution=(32, 32), cache=False,
                           filterProtocol=("T2",), **kw)


def test_loader_reads_fixture_tree(brainweb_tree):
    """GT labels round-trip crisp through gz-MINC1: the lesion mask and
    skull-stripping masks come back exact."""
    ds = BRAINWEB(_opts(brainweb_tree, filterType=("MODERATEMS",),
                        partition={"TRAIN": 0.0, "VAL": 0.0, "TEST": 1.0}))
    assert len(ds.patients) == 1
    nii, seg, skullmap = ds.load_volumes(ds.patients[0])
    assert set(np.unique(seg.data)) == {0.0, 1.0}
    assert seg.data.sum() > 50  # lesion GT survives binarisation
    assert 0.0 < skullmap.data.mean() < 1.0  # skull/skin stripped
    assert float(nii.data.max()) <= 1.0 + 1e-6  # percentile-normalized


@pytest.mark.slow
def test_fixture_train_and_evaluate(brainweb_tree):
    """Train on the healthy phantom, evaluate on the lesioned one —
    the full post-download first-user flow, hermetically."""
    from unsupervised_anomaly_detection_brain_mri_tpu.config import (
        Config,
        Options,
        PathConfig,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    healthy = BRAINWEB(_opts(
        brainweb_tree, filterType=("NORMAL",),
        partition={"TRAIN": 0.7, "VAL": 0.3, "TEST": 0.0}))
    lesions = BRAINWEB(_opts(
        brainweb_tree, filterType=("MODERATEMS",),
        partition={"TRAIN": 0.0, "VAL": 0.0, "TEST": 1.0}))

    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=2,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg)
    state = tr.fit(healthy, resume=False)

    opts = Options(paths=PathConfig(sample_dir=tempfile.mkdtemp()),
                   erosionIterations=3, minLesionSize=2)
    res = evaluate(lesions, tr, state, opts, cfg)
    assert np.isfinite(res["diff_AUC"]) and 0.0 <= res["diff_AUC"] <= 1.0
    assert np.isfinite(res["bestDiceScore"])
    # reference artifact set written (`utils/Evaluation.py:495-520`)
    eval_dirs = []
    for dirpath, _dirnames, filenames in os.walk(
            opts.paths.sample_dir):
        if "evalPC.npy" in filenames:
            eval_dirs.append(dirpath)
    assert eval_dirs, "evalPC.npy not written"
