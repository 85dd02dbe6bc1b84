"""Round-2 parity fixes: exact precision-70 operating point, ceVAE masked
CE-branch target, fAnoGAN unified fit/resume, rng/step checkpointing, eval
shape-sanity skip, MC brainmask masking, cache-key completeness.

Each test cites the reference behaviour it locks in.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    Options,
    PathConfig,
)
from unsupervised_anomaly_detection_brain_mri_tpu.ops import metrics as M
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _cfg(trainer, model, **kw):
    base = dict(trainer=trainer, model=model, batchsize=8, outputWidth=32,
                outputHeight=32, zDim=16, numEpochs=2,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


# ---------------------------------------------------------------------------
# precision-70 operating point (`utils/Evaluation.py:425-440`)


def _legacy_prc(scores, labels):
    """sklearn 0.23 `precision_recall_curve` (the version the reference
    pins in requirements.txt): distinct-threshold curve TRUNCATED at the
    first full-recall point, ascending-threshold order.  Modern sklearn
    (>=1.x) dropped the truncation, so the reference semantics are
    reimplemented here in numpy."""
    desc = np.argsort(-scores, kind="mergesort")
    s, l = scores[desc], labels[desc].astype(float)
    distinct = np.where(np.r_[s[1:] != s[:-1], True])[0]
    tps = np.cumsum(l)[distinct]
    fps = np.cumsum(1 - l)[distinct]
    thr = s[distinct]
    with np.errstate(invalid="ignore"):
        prec = tps / (tps + fps)
    prec[np.isnan(prec)] = 0
    rec = tps / tps[-1]
    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    return np.r_[prec[sl], 1], np.r_[rec[sl], 0], thr[sl]


def _sklearn_p70(scores, labels):
    prec, rec, thr = _legacy_prc(scores, labels)
    idx = int(np.argmax(prec <= 0.7))
    return float(thr[min(idx, len(thr) - 1)])


@pytest.mark.parametrize("seed,quantize", [(0, None), (1, 50), (2, 8)])
def test_precision70_threshold_matches_sklearn(seed, quantize):
    rng = np.random.default_rng(seed)
    n = 4000
    labels = rng.random(n) < 0.15
    scores = rng.random(n) + 0.5 * labels
    if quantize:  # tie-heavy score sets (the reported weak spot)
        scores = np.round(scores * quantize) / quantize
    ours = float(M.precision70_threshold(jnp.asarray(scores),
                                         jnp.asarray(labels)))
    assert ours == pytest.approx(_sklearn_p70(scores, labels), abs=1e-6)


def test_precision70_no_crossing_falls_back_to_first_threshold():
    # all-positive scores high precision everywhere: argmax of all-False
    # returns index 0 (the lowest/first sklearn threshold)
    labels = np.array([1, 1, 1, 1, 0], bool)
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.1])
    ours = float(M.precision70_threshold(jnp.asarray(scores),
                                         jnp.asarray(labels)))
    assert ours == pytest.approx(_sklearn_p70(scores, labels), abs=1e-6)


def test_summary_exposes_precision70():
    rng = np.random.default_rng(3)
    labels = rng.random(1000) < 0.2
    scores = rng.random(1000) + labels
    s = M.anomaly_curve_summary(jnp.asarray(scores), jnp.asarray(labels))
    assert float(s["precision70_threshold"]) == pytest.approx(
        _sklearn_p70(scores, np.asarray(labels)), abs=1e-6)


# ---------------------------------------------------------------------------
# ceVAE CE-branch target (`trainers/ceVAE.py:40`: L1_ce vs the x_ce
# placeholder == the MASKED input during TRAIN)


def test_cevae_ce_branch_targets_masked_input():
    tr = get_trainer("ceVAE")(
        _cfg("ceVAE", "context_encoder_variational_autoencoder"))
    state = tr.init_state()
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 1)),
                    jnp.float32)
    mask = jnp.ones((4, 32, 32), jnp.float32)
    batch = {"x": x, "mask": mask}
    outputs, _, inputs = tr.apply_model(
        state.params, state.batch_stats, rng, batch, train=True,
        return_inputs=True)
    x_ce = inputs[1]
    # the train-mode input really is masked (boxes of zeros)
    assert float(jnp.sum(jnp.abs(x - x_ce))) > 0
    losses = tr.compute_losses_with_inputs(outputs, batch, inputs)
    # Rec_ce must equal the L1 sum against the MASKED input
    expected = float(jnp.mean(jnp.sum(
        jnp.abs(x_ce - outputs["x_hat_ce"]), axis=(1, 2, 3))))
    assert float(losses["Rec_ce"]) == pytest.approx(expected, rel=1e-5)
    # ... and differ from the clean-target version (the round-1 bug)
    wrong = float(jnp.mean(jnp.sum(
        jnp.abs(x - outputs["x_hat_ce"]), axis=(1, 2, 3))))
    assert abs(float(losses["Rec_ce"]) - wrong) > 1e-3
    # VAL path: x_ce == x, so both targets coincide
    outputs_v, _, inputs_v = tr.apply_model(
        state.params, state.batch_stats, rng, batch, train=False,
        return_inputs=True)
    np.testing.assert_array_equal(np.asarray(inputs_v[1]), np.asarray(x))


# ---------------------------------------------------------------------------
# checkpoint: rng + step restore (ADVICE r1: load_checkpoint restored only
# params/opt/epoch)


def test_checkpoint_restores_rng_and_step(synth_dataset):
    wd = tempfile.mkdtemp()
    cfg = _cfg("AE", "autoencoder", numEpochs=2)
    tr = get_trainer("AE")(cfg, workdir=wd)
    state = tr.fit(synth_dataset)
    tr2 = get_trainer("AE")(cfg, workdir=wd)
    template = tr2.init_state()
    restored, epoch = tr2.load_checkpoint(template)
    assert epoch == 2
    assert int(restored.step) == int(state.step) > 0
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(state.rng)))
    # the restored stream differs from a fresh init stream
    assert not np.array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(template.rng)))


@pytest.mark.slow
def test_resume_is_bitwise_deterministic(synth_dataset):
    """Killed-and-resumed training reproduces an uninterrupted run exactly:
    data order is (seed, epoch)-keyed AND the rng stream + step are part of
    the checkpoint, saved after the VAL pass."""
    wd1, wd2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    cfg = _cfg("AE", "autoencoder", numEpochs=2)
    full = get_trainer("AE")(cfg, workdir=wd1).fit(synth_dataset)

    tr_a = get_trainer("AE")(cfg, workdir=wd2)
    orig = tr_a.num_epochs
    tr_a.num_epochs = lambda: 1  # "crash" after epoch 0
    tr_a.fit(synth_dataset)
    resumed = get_trainer("AE")(cfg, workdir=wd2).fit(synth_dataset,
                                                      resume=True)
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_replays_early_stopping_history(synth_dataset):
    wd = tempfile.mkdtemp()
    cfg = _cfg("AE", "autoencoder", numEpochs=2)
    tr = get_trainer("AE")(cfg, workdir=wd)
    tr.fit(synth_dataset)
    # resuming into a DONE run trains no further epochs and reloads history
    tr2 = get_trainer("AE")(cfg, workdir=wd)
    tr2.fit(synth_dataset, resume=True)
    phases = [h["phase"] for h in tr2.history]
    assert phases.count("TRAIN") == 2  # from curves.json, not re-trained


# ---------------------------------------------------------------------------
# fAnoGAN unified fit (`trainers/DLMODEL.py:86-110` resume +
# `trainers/fAnoGAN.py:87-210` two-phase schedule)


@pytest.mark.slow
def test_fanogan_two_phase_history_and_resume(synth_dataset):
    wd = tempfile.mkdtemp()
    cfg = _cfg("fAnoGAN", "fanogan", numEpochs=1, batchsize=8,
               intermediateResolutions=(8, 8))
    tr = get_trainer("fAnoGAN")(cfg, workdir=wd)
    state = tr.fit(synth_dataset)
    phases = [h["phase"] for h in tr.history]
    assert "TRAIN_WGAN" in phases and "TRAIN_Encoder" in phases
    # VAL only runs in the encoder phase
    val_epochs = [h["epoch"] for h in tr.history if h["phase"] == "VAL"]
    assert all(e >= cfg.numEpochs for e in val_epochs)

    # kill-and-resume: a new trainer picks up AFTER the encoder phase
    tr2 = get_trainer("fAnoGAN")(cfg, workdir=wd)
    state2 = tr2.fit(synth_dataset, resume=True)
    assert int(state2.epoch) == int(state.epoch)
    p1 = jax.tree_util.tree_leaves(state.params)
    p2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fanogan_resumes_mid_phase(synth_dataset):
    # train only phase 1 (interrupt by monkey-limiting num_epochs), then
    # resume with the full schedule: the restored run must enter phase 2
    wd = tempfile.mkdtemp()
    cfg = _cfg("fAnoGAN", "fanogan", numEpochs=1, batchsize=8,
               intermediateResolutions=(8, 8))
    tr = get_trainer("fAnoGAN")(cfg, workdir=wd)
    orig = tr.num_epochs
    tr.num_epochs = lambda: 1  # stop after the WGAN epoch
    tr.fit(synth_dataset)
    assert [h["phase"] for h in tr.history
            if h["phase"].startswith("TRAIN")] == ["TRAIN_WGAN"]

    tr2 = get_trainer("fAnoGAN")(cfg, workdir=wd)
    tr2.fit(synth_dataset, resume=True)
    trained = [h["phase"] for h in tr2.history
               if h["phase"].startswith("TRAIN")]
    # history replays the WGAN epoch from curves.json, then trains Encoder
    assert trained == ["TRAIN_WGAN", "TRAIN_Encoder"]


# ---------------------------------------------------------------------------
# eval parity: shape-sanity skip + MC masking + fixed-threshold detection


@pytest.fixture(scope="module")
def tiny_trained_ae():
    from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
        SYNTH,
        SyntheticOptions,
    )

    healthy = SYNTH(SyntheticOptions(
        numPatients=6, imageSize=32, numSlices=8, targetSize=32))
    cfg = _cfg("AE", "autoencoder", numEpochs=2)
    tr = get_trainer("AE")(cfg)
    state = tr.fit(healthy)
    return tr, state, cfg


@pytest.fixture(scope="module")
def lesion_ds():
    from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
        SYNTH,
        SyntheticOptions,
    )

    return SYNTH(SyntheticOptions(
        numPatients=4, imageSize=32, numSlices=8, targetSize=32,
        withLesions=True,
        partition={"TRAIN": 0.0, "VAL": 0.5, "TEST": 0.5}))


def _opts(tmp, **kw):
    base = dict(erosionIterations=1, minLesionSize=2)
    base.update(kw)
    return Options(paths=PathConfig(sample_dir=tmp), **base)


def test_eval_skips_truncated_volume(tiny_trained_ae, lesion_ds):
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        _evaluate,
    )

    tr, state, cfg = tiny_trained_ae

    class Truncating:
        """Proxy dataset: the first TEST patient returns a bad volume."""

        def __init__(self, ds):
            self._ds = ds
            self.options = ds.options
            self._bad = ds.patients_of("TEST")[0]["name"]

        def __getattr__(self, k):
            return getattr(self._ds, k)

        def load_volume_and_groundtruth(self, patient):
            v, g, b, s = self._ds.load_volume_and_groundtruth(patient)
            if patient["name"] == self._bad:
                return v[:4], g[:4], b[:4], s[:4]  # min(shape) < slice span
            return v, g, b, s

    tmp = tempfile.mkdtemp()
    ds = Truncating(lesion_ds)
    ed, kept = _evaluate(ds, tr, state, tmp, _opts(tmp), cfg)
    n_test = len(lesion_ds.patients_of("TEST"))
    assert len(kept) == n_test - 1
    assert len(ed["slices_per_patient"]) == n_test - 1
    assert all(p["name"] != ds._bad for p in kept)


def test_mc_variance_masked_by_eroded_brainmask(tiny_trained_ae, lesion_ds):
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

    tr, state, cfg = tiny_trained_ae
    tmp = tempfile.mkdtemp()
    res = evaluate(lesion_ds, tr, state,
                   _opts(tmp, numMonteCarloSamples=3), cfg)
    assert "epistemic_variance" in res and "combined_variance" in res
    ev, cv = res["epistemic_variance"], res["combined_variance"]
    assert ev.shape == res["labelmaps"].shape == cv.shape
    # image corners are outside every phantom's skullmap: masked MC
    # reconstructions must have exactly zero variance there (:246-266)
    for m in (ev, cv):
        assert np.all(m[:, 0, 0] == 0) and np.all(m[:, -1, -1] == 0)
        assert np.all(np.isfinite(m))
    # variance is non-trivial inside the brain
    assert float(ev.max()) > 0


def test_fixed_threshold_detection_uses_unfiltered_volume(
        tiny_trained_ae, lesion_ds):
    """Reference quirk (`Evaluation.py:459-461`): with a numeric threshold
    the detection counts come from the UNFILTERED thresholded volume, so a
    huge CC filter can zero the Dice while detections remain."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

    tr, state, cfg = tiny_trained_ae
    tmp = tempfile.mkdtemp()
    base = evaluate(lesion_ds, tr, state, _opts(tmp), cfg)
    t = float(base["bestThreshold"])
    res = evaluate(lesion_ds, tr, state,
                   _opts(tmp, threshold=t, minLesionSize=10**6), cfg)
    assert res["DiceScore"] == 0.0  # everything CC-filtered away
    assert res["TPCC"] + res["FPCC"] > 0  # ... but detections persist


# ---------------------------------------------------------------------------
# cache key covers crop options (ADVICE r1)


def test_cache_key_includes_crop_options():
    from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
        BaseDataset,
        BaseOptions,
    )

    class Dummy(BaseDataset):
        def __init__(self, options):
            self.options = options  # skip discovery

    a = Dummy(BaseOptions(useCrops=True, cropWidth=64))
    b = Dummy(BaseOptions(useCrops=True, cropWidth=32))
    c = Dummy(BaseOptions(useCrops=True, cropWidth=64,
                          numRandomCropsPerSlice=9))
    d = Dummy(BaseOptions(useCrops=True, cropWidth=64, seed=7))
    keys = {x.cache_key() for x in (a, b, c, d)}
    assert len(keys) == 4


@pytest.mark.slow
def test_log_var_feeds_combined_variance(tiny_trained_ae, lesion_ds):
    """Aleatoric plumbing (`Evaluation.py:246-272`): a model emitting
    ``log_var`` must contribute mean(sigmas) to the COMBINED predictive
    variance (passed raw, log_var=False at `Metrics.py:165-173`), on top
    of the epistemic term, masked by the eroded brainmask."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

    tr, state, cfg = tiny_trained_ae
    sigma_value = 0.125

    class Aleatoric:
        """Wraps the trained AE, adding a constant log_var head."""

        def reconstruct_device(self, state, x, dropout=False, rng=None):
            out = tr.reconstruct_device(state, x, dropout=dropout, rng=rng)
            out["log_var"] = jnp.full_like(out["reconstruction"],
                                           sigma_value)
            return out

        def __getattr__(self, k):
            return getattr(tr, k)

    tmp = tempfile.mkdtemp()
    res = evaluate(lesion_ds, Aleatoric(), state,
                   _opts(tmp, numMonteCarloSamples=3), cfg)
    ev, cv = res["epistemic_variance"], res["combined_variance"]
    inside = cv > 0  # eroded-mask interior with nonzero variance
    assert inside.any()
    # combined - epistemic == mean(log_var samples) == sigma_value inside
    np.testing.assert_allclose((cv - ev)[inside], sigma_value, atol=1e-5)
