"""Extra trainer coverage: a GAN trainer, input-gradient restoration, and
deterministic resume ordering."""

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _cfg(trainer, model, **kw):
    base = dict(trainer=trainer, model=model, batchsize=8, outputWidth=32,
                outputHeight=32, zDim=16, numEpochs=1,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_aae_gan_schedule_trains(synth_dataset):
    """AAE: AE/critic/generator sub-updates in one jitted step, finite."""
    tr = get_trainer("AAE")(_cfg("AAE", "adversarial_autoencoder",
                                 intermediateResolutions=(8, 8)))
    state = tr.fit(synth_dataset)
    hist = [h for h in tr.history if h["phase"] == "TRAIN"][0]
    for k in ("loss", "disc_loss", "gen_loss", "reconstructionLoss"):
        assert np.isfinite(hist[k]), k
    res = tr.reconstruct(state, synth_dataset.slices("VAL")[:2])
    assert np.isfinite(res["l1err"])


def test_vae_you_restoration_changes_input(synth_dataset):
    """VAE_You reconstruct = iterative input restoration: the output is a
    modified input, not a decoder forward (`trainers/VAE_You.py:125-147`)."""
    tr = get_trainer("VAE_You")(_cfg(
        "VAE_You", "variational_autoencoder", restore_steps=3,
        tv_lambda=0.5, restore_lr=1e-3))
    state = tr.fit(synth_dataset)
    x = synth_dataset.slices("VAL")[:2]
    res = tr.reconstruct(state, x)
    moved = np.abs(res["reconstruction"] - x).max()
    assert 0 < moved < 0.5  # small gradient steps, not a full re-synthesis


def test_deterministic_epoch_order():
    """Data order is a pure function of (seed, epoch) — resume-safe."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
        epoch_indices,
    )

    a = epoch_indices(np.random.default_rng((43, 5)), 100, 8)
    b = epoch_indices(np.random.default_rng((43, 5)), 100, 8)
    c = epoch_indices(np.random.default_rng((43, 6)), 100, 8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.mark.parametrize("opt_name", [
    "SGD",
    pytest.param("MOMENTUM", marks=pytest.mark.slow),
    pytest.param("RMSPROP", marks=pytest.mark.slow),
])
def test_optimizer_variants_train(synth_dataset, opt_name):
    """SGD / MOMENTUM / RMS optimizer types (`trainers/DLMODEL.py:112-131`).
    ADAM is exercised by every other training test; one non-ADAM variant
    stays in the fast tier, the rest run nightly."""
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Optimizer

    opt = Optimizer[opt_name]
    tr = get_trainer("AE")(_cfg("AE", "autoencoder", optimizer=opt,
                                learningrate=1e-3))
    tr.fit(synth_dataset)
    assert np.isfinite(
        [h for h in tr.history if h["phase"] == "TRAIN"][0]["loss"])
