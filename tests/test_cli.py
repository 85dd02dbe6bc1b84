"""CLI workflow tests (`run.py` parity, SURVEY.md section 3.3)."""

import os
import tempfile

import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main, make_parser


def test_parser_reference_flags():
    """Every reference `run.py:122-150` flag parses."""
    args = make_parser().parse_args([
        "-b", "16", "-l", "0.001", "-E", "5", "-z", "64", "-w", "64",
        "-g", "64", "-o", "ADAM", "-i", "16,16", "-s", "10", "-e", "100",
        "-t", "VAE", "-m", "variational_autoencoder", "-O", "0.3",
        "-d", "MSISBI2015", "-n", "4", "-G", "0.1", "-K", "2.0",
        "-M", "5.0", "-R", "0.5", "-C", "6", "-Z", "32", "-W", "2",
        "-A", "1.5", "-L", "0.01", "-S", "10", "-T", "1.8"])
    assert args.batchsize == 16 and args.trainer == "VAE"
    assert args.intermediateResolutions == "16,16"
    assert args.threshold == 0.3 and args.ds == "MSISBI2015"


@pytest.mark.slow
def test_cli_synthetic_fixed_threshold(tmp_path):
    """Full train->eval flow at a fixed threshold (fast path)."""
    rc = main(["--synthetic", "-t", "AE", "-m", "autoencoder", "-b", "8",
               "-E", "1", "-z", "16", "-w", "32", "-g", "32", "-s", "0",
               "-e", "8", "-O", "0.5", "--precision", "float32",
               "--workdir", str(tmp_path / "work")])
    assert rc == 0
    assert os.path.isdir(tmp_path / "work" / "ckpt")


@pytest.mark.slow
def test_preset_flag(tmp_path):
    rc = main(["--synthetic", "--preset", "AE_spatial", "-b", "8",
               "-E", "1", "-z", "16", "-w", "32", "-g", "32", "-s", "0",
               "-e", "8", "-O", "0.5", "--precision", "float32",
               "--workdir", str(tmp_path / "work")])
    assert rc == 0


@pytest.mark.slow
def test_cli_ds_without_threshold_single_bestdice_eval(tmp_path, monkeypatch):
    """Reference `run.py:60-63`: `-d DATASET` with no threshold runs ONE
    best-dice evaluation on that dataset at the default prior setting
    (True, `utils/default_config_setup.py:54`) and returns — no prior
    sweep, no threshold transfer."""
    import unsupervised_anomaly_detection_brain_mri_tpu.cli as cli
    import unsupervised_anomaly_detection_brain_mri_tpu.eval as eval_pkg

    real_build = cli.build_dataset
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Dataset

    def fake_build(options, config, dataset, split_role):
        # substitute the synthetic phantom for the (absent) MSLUB archive
        return real_build(options, config, Dataset.SYNTH, split_role)

    calls = []

    def fake_evaluate(ds, trainer, state, options, config, **kw):
        calls.append((kw.get("description"), options))
        return {"diff_AUC": 0.5, "diff_AUPRC": 0.5, "bestDiceScore": 0.5}

    def fail_transfer(*a, **kw):  # pragma: no cover - must not run
        raise AssertionError("-d without threshold must not run transfer")

    monkeypatch.setattr(cli, "build_dataset", fake_build)
    monkeypatch.setattr(eval_pkg, "evaluate", fake_evaluate)
    monkeypatch.setattr(eval_pkg, "determine_threshold_on_labeled_patients",
                        fail_transfer)

    rc = main(["-t", "AE", "-m", "autoencoder", "-d", "MSLUB", "-b", "8",
               "-E", "1", "-z", "16", "-w", "32", "-g", "32", "-s", "0",
               "-e", "8", "--precision", "float32",
               "--workdir", str(tmp_path / "work")])
    assert rc == 0
    assert len(calls) == 1, "expected exactly ONE eval (reference :60-63)"
    desc, options = calls[0]
    assert "upperbound" in desc and "MSLUB" in desc
    assert options.applyHyperIntensityPrior is True
    assert options.threshold is None


@pytest.mark.slow
def test_cli_threshold_transfer_writes_calibration(tmp_path):
    """The transfer workflow (no --threshold) must persist the calibrated
    operating point; serving auto-loads it (VERDICT r2 item 6)."""
    import json

    from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
        AnomalyDetector,
    )

    rc = main(["--synthetic", "-t", "AE", "-m", "autoencoder", "-b", "8",
               "-E", "1", "-z", "16", "-w", "32", "-g", "32", "-s", "0",
               "-e", "8", "--precision", "float32",
               "--workdir", str(tmp_path / "work")])
    assert rc == 0
    calib_file = tmp_path / "work" / "calibration.json"
    assert calib_file.exists(), "threshold transfer did not persist calibration"
    calib = json.loads(calib_file.read_text())
    assert calib["dataset"].upper() == "SYNTH"
    assert calib["threshold"] > 0 and 0 <= calib["bestDiceVAL"] <= 1
    assert calib["options"]["applyHyperIntensityPrior"] is False

    det = AnomalyDetector.from_workdir(str(tmp_path / "work"))
    assert det.threshold == calib["threshold"]
    assert det.calibration == calib
    assert det.options.applyHyperIntensityPrior is False
