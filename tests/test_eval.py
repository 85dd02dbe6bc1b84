"""End-to-end evaluation pipeline tests (SURVEY.md sections 2.6/4)."""

import os
import tempfile

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    Options,
    PathConfig,
)
from unsupervised_anomaly_detection_brain_mri_tpu.eval import (
    determine_threshold_on_labeled_patients,
    evaluate,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


@pytest.fixture(scope="module")
def trained_ae(request):
    from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
        SYNTH,
        SyntheticOptions,
    )

    healthy = SYNTH(SyntheticOptions(
        numPatients=6, imageSize=32, numSlices=8, targetSize=32))
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=6,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg)
    state = tr.fit(healthy)
    return tr, state, cfg


def _opts(tmp):
    return Options(paths=PathConfig(sample_dir=tmp), erosionIterations=1,
                   minLesionSize=2)


def test_evaluate_full_pipeline(trained_ae, synth_lesion_dataset):
    tr, state, cfg = trained_ae
    tmp = tempfile.mkdtemp()
    res = evaluate(synth_lesion_dataset, tr, state, _opts(tmp), cfg)

    # metric sanity: all finite; AUC must beat chance on bright lesions
    for k in ("diff_AUC", "diff_AUPRC", "bestDiceScore", "bestThreshold",
              "DiceScore", "DiceScorePerPatientMean", "TPR", "FPR", "VD"):
        assert np.isfinite(res[k]), k
    assert res["diff_AUC"] > 0.5
    assert 0.0 <= res["bestDiceScore"] <= 1.0
    # bestdice threshold selection: global dice equals the best dice
    np.testing.assert_allclose(res["DiceScore"], res["bestDiceScore"],
                               atol=0.05)

    # artifacts written
    ed = res["eval_dir"]
    for f in ("evalPC.npy", "evalPC.txt", "evalPC.json", "rocPC.npy",
              "prcPC.npy", "rocPC.png", "prcPC.png"):
        assert os.path.exists(os.path.join(ed, f)), f

    # exported dict round-trips and excludes bulky arrays
    export = np.load(os.path.join(ed, "evalPC.npy"),
                     allow_pickle=True).item()
    assert "diffs" not in export and "x" not in export
    assert export["bestDiceScore"] == res["bestDiceScore"]


def test_threshold_transfer(trained_ae, synth_lesion_dataset):
    tr, state, cfg = trained_ae
    tmp = tempfile.mkdtemp()
    bd, bt = determine_threshold_on_labeled_patients(
        synth_lesion_dataset, tr, state, _opts(tmp), cfg)
    assert np.isfinite(bd) and np.isfinite(bt)
    # transfer: evaluating TEST at the fitted threshold reports it
    res = evaluate(synth_lesion_dataset, tr, state,
                   _opts(tmp).replace(threshold=bt), cfg)
    assert res["thresholdType"] == bt


def test_mc_dropout_uncertainty(trained_ae, synth_lesion_dataset):
    tr, state, cfg = trained_ae
    tmp = tempfile.mkdtemp()
    opts = _opts(tmp).replace(numMonteCarloSamples=3)
    res = evaluate(synth_lesion_dataset, tr, state, opts, cfg)
    assert "epistemic_variance" in res
    ev = res["epistemic_variance"]
    assert ev.shape == res["labelmaps"].shape
    assert np.all(np.isfinite(ev))
