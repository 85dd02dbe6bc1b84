"""Serving API test: workdir round trip -> volume inference."""

import json
import os
import shutil
import tempfile

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config, Options
from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
    AnomalyDetector,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


@pytest.fixture(scope="module")
def trained_workdir(synth_dataset):
    """ONE 1-epoch AE training shared by every test; each test copies the
    workdir so calibration files never cross-contaminate."""
    wd = tempfile.mkdtemp()
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=1,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg, workdir=wd)
    tr.fit(synth_dataset)
    return wd


@pytest.fixture()
def workdir_copy(trained_workdir):
    wd = tempfile.mkdtemp()
    shutil.rmtree(wd)
    shutil.copytree(trained_workdir, wd)
    return wd


@pytest.mark.slow
def test_detector_from_workdir(synth_dataset, synth_lesion_dataset):
    wd = tempfile.mkdtemp()
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=2,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg, workdir=wd)
    tr.fit(synth_dataset)

    det = AnomalyDetector.from_workdir(
        wd, threshold=0.5,
        options=Options(erosionIterations=1, minLesionSize=2))
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, gt, brain, skull = synth_lesion_dataset.load_volume_and_groundtruth(
        patient)
    res = det.detect(vol, brainmask=brain)
    S = vol.shape[2]
    assert res["anomaly_map"].shape == (S, 32, 32)
    assert res["scores"].shape == (S,)
    assert res["mask"].shape == (S, 32, 32)
    assert np.isfinite(res["anomaly_map"]).all()
    assert res["anomalous_voxels"] >= 0
    # lesioned slices should score higher than clean ones on average
    lesion_slices = gt.sum(axis=(0, 1)) > 0
    if lesion_slices.any() and (~lesion_slices).any():
        assert (res["scores"][lesion_slices].mean()
                >= res["scores"][~lesion_slices].mean() * 0.5)


def test_detect_applies_eval_pipeline_erosion(workdir_copy,
                                              synth_lesion_dataset):
    """detect() must post-process exactly like the eval pipeline: with
    erodeBrainmask on, the residual map is masked by the ERODED brainmask,
    so an n-iteration erosion zeroes an n-pixel shell at the image border."""
    wd = workdir_copy

    det = AnomalyDetector.from_workdir(
        wd, options=Options(erosionIterations=3))
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, _, _, _ = synth_lesion_dataset.load_volume_and_groundtruth(patient)
    # all-ones brainmask: only the erosion can zero the border shell
    res = det.detect(vol, brainmask=np.ones_like(vol))
    amap = res["anomaly_map"]
    assert np.all(amap[:, :3, :] == 0) and np.all(amap[:, -3:, :] == 0)
    assert np.all(amap[:, :, :3] == 0) and np.all(amap[:, :, -3:] == 0)
    assert np.any(amap != 0)  # interior survives


def test_calibration_roundtrip(workdir_copy, synth_lesion_dataset):
    """save_calibration -> from_workdir auto-loads threshold AND the eval
    options the threshold was fitted under."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
        load_calibration,
        save_calibration,
    )

    wd = workdir_copy
    opts = Options(erosionIterations=2, minLesionSize=3,
                   applyHyperIntensityPrior=False)
    save_calibration(wd, 0.42, 0.5, opts, dataset="SYNTH", epoch=1)
    assert load_calibration(wd)["threshold"] == 0.42

    det = AnomalyDetector.from_workdir(wd)  # NO manual threshold/options
    assert det.threshold == 0.42
    assert det.options.erosionIterations == 2
    assert det.options.minLesionSize == 3
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, _, _, _ = synth_lesion_dataset.load_volume_and_groundtruth(patient)
    res = det.detect(vol)
    assert "mask" in res  # detects at the calibrated operating point
    # explicit args still win over the stored calibration
    det2 = AnomalyDetector.from_workdir(
        wd, threshold=0.9, options=Options(erosionIterations=5))
    assert det2.threshold == 0.9
    assert det2.options.erosionIterations == 5


def test_infer_cli_end_to_end(workdir_copy, synth_lesion_dataset, tmp_path,
                              capsys):
    """`run.py infer`: calibrated workdir + raw NIfTI scan -> anomaly map in
    the SOURCE geometry, binary mask, and a machine-readable report."""
    from unsupervised_anomaly_detection_brain_mri_tpu.cli import main
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nifti,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.data.volume import (
        open_volume,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
        save_calibration,
    )

    wd = workdir_copy
    opts = Options(erosionIterations=1, minLesionSize=2,
                   applyHyperIntensityPrior=False)
    save_calibration(wd, 0.35, 0.5, opts, dataset="SYNTH", epoch=1)

    # a native-resolution scan with a non-identity affine, axial on axis 2
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, _, _, _ = synth_lesion_dataset.load_volume_and_groundtruth(patient)
    affine = np.array([[0.0, 1.1, 0.0, -10.0],
                       [1.2, 0.0, 0.0, 20.0],
                       [0.0, 0.0, 1.3, 5.0],
                       [0.0, 0.0, 0.0, 1.0]], np.float64)
    scan = tmp_path / "patient7.nii.gz"
    write_nifti(str(scan), vol.astype(np.float32), affine=affine)

    outdir = tmp_path / "out"
    rc = main(["infer", "--workdir", wd, "-i", str(scan),
               "-o", str(outdir)])
    assert rc == 0

    report = json.loads((outdir / "patient7.report.json").read_text())
    assert report["threshold"] == 0.35  # calibrated operating point served
    assert report["calibration"]["bestDiceVAL"] == 0.5
    assert len(report["slice_scores"]) == vol.shape[2]
    assert report["anomalous_voxels"] >= 0 and report["cc_converged"]

    # the exported map overlays on the source scan: same shape, same affine
    amap = open_volume(str(outdir / "patient7.anomaly.nii.gz"))
    assert amap.data.shape == vol.shape
    np.testing.assert_allclose(
        np.asarray(amap.meta["affine"])[:3], affine[:3], atol=1e-4)
    assert np.isfinite(amap.data).all() and float(np.max(amap.data)) > 0

    mask = open_volume(str(outdir / "patient7.anomaly.binary.nii.gz"))
    assert mask.data.shape == vol.shape
    assert set(np.unique(mask.data)) <= {0.0, 1.0}

    out = capsys.readouterr().out
    assert "peak slice score" in out and "anomalous voxels" in out


def test_infer_cli_threshold_override_and_no_export(workdir_copy,
                                                    synth_lesion_dataset,
                                                    tmp_path):
    """-O overrides the calibrated threshold; --no-export writes the report
    only; without any threshold there is no binary mask."""
    from unsupervised_anomaly_detection_brain_mri_tpu.cli import main
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nifti,
    )

    wd = workdir_copy  # NO calibration.json in this copy
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, _, _, _ = synth_lesion_dataset.load_volume_and_groundtruth(patient)
    scan = tmp_path / "s.nii.gz"
    write_nifti(str(scan), vol.astype(np.float32))

    outdir = tmp_path / "o1"
    assert main(["infer", "--workdir", wd, "-i", str(scan), "-O", "0.5",
                 "-o", str(outdir), "--no-export"]) == 0
    report = json.loads((outdir / "s.report.json").read_text())
    assert report["threshold"] == 0.5
    assert report["files"] == {}  # --no-export
    assert not (outdir / "s.anomaly.nii.gz").exists()

    # uncalibrated + no -O: maps only, no mask key in the report
    outdir2 = tmp_path / "o2"
    assert main(["infer", "--workdir", wd, "-i", str(scan),
                 "-o", str(outdir2)]) == 0
    report2 = json.loads((outdir2 / "s.report.json").read_text())
    assert report2["threshold"] is None
    assert "anomalous_voxels" not in report2
    assert (outdir2 / "s.anomaly.nii.gz").exists()
    assert not (outdir2 / "s.anomaly.binary.nii.gz").exists()


def test_infer_cli_same_basename_inputs_do_not_collide(workdir_copy,
                                                       synth_lesion_dataset,
                                                       tmp_path):
    """Two --input scans with the same basename (different directories)
    must each get their own report/exports, not silently overwrite."""
    from unsupervised_anomaly_detection_brain_mri_tpu.cli import main
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nifti,
    )

    wd = workdir_copy
    patients = synth_lesion_dataset.patients_of("TEST")[:2]
    scans = []
    for site, patient in zip(("siteA", "siteB"), patients):
        vol, _, _, _ = synth_lesion_dataset.load_volume_and_groundtruth(
            patient)
        d = tmp_path / site
        d.mkdir()
        scan = d / "scan.nii.gz"
        write_nifti(str(scan), vol.astype(np.float32))
        scans.append(str(scan))

    outdir = tmp_path / "out"
    assert main(["infer", "--workdir", wd, "-i", scans[0], "-i", scans[1],
                 "-O", "0.5", "-o", str(outdir), "--no-export"]) == 0
    r1 = json.loads((outdir / "scan.report.json").read_text())
    r2 = json.loads((outdir / "scan_2.report.json").read_text())
    assert r1["input"] == os.path.abspath(scans[0])
    assert r2["input"] == os.path.abspath(scans[1])


def test_detect_honors_calibrated_mc_sampling(workdir_copy,
                                              synth_lesion_dataset):
    """A threshold calibrated under numMonteCarloSamples > 1 must be served
    under the SAME pipeline: detect() runs MC-dropout sampling, reports
    epistemic variance, and differs from the deterministic residual map."""
    import jax

    from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
        save_calibration,
    )

    wd = workdir_copy
    opts = Options(erosionIterations=1, minLesionSize=2,
                   numMonteCarloSamples=3)
    save_calibration(wd, 0.3, 0.5, opts, dataset="SYNTH", epoch=1)

    det = AnomalyDetector.from_workdir(wd)
    assert det.options.numMonteCarloSamples == 3
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, _, brain, _ = synth_lesion_dataset.load_volume_and_groundtruth(
        patient)
    res = det.detect(vol, brainmask=brain)
    # MC pipeline engaged: uncertainty maps exist and are non-degenerate
    assert "epistemic_variance" in res and "combined_variance" in res
    assert np.isfinite(res["epistemic_variance"]).all()
    assert float(res["epistemic_variance"].max()) > 0.0
    # different rng -> different MC mean reconstruction
    res2 = det.detect(vol, brainmask=brain, rng=jax.random.PRNGKey(7))
    assert not np.allclose(res["reconstruction"], res2["reconstruction"])

    # deterministic serving (mc <= 1) reports no uncertainty maps
    det_det = AnomalyDetector.from_workdir(
        wd, options=Options(erosionIterations=1, minLesionSize=2))
    res3 = det_det.detect(vol, brainmask=brain)
    assert "epistemic_variance" not in res3
