"""End-to-end training smoke tests (SURVEY.md section 4(d)).

AE trains on the synthetic phantom for 2 epochs and the loss decreases;
one GAN trainer runs a full step without NaNs.  Heavier all-trainer sweeps
live in test_trainers_all.py (marked slow).
"""

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _cfg(trainer, model, **kw):
    base = dict(trainer=trainer, model=model, batchsize=8, outputWidth=32,
                outputHeight=32, zDim=16, numEpochs=2,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def test_ae_loss_decreases(synth_dataset):
    tr = get_trainer("AE")(_cfg("AE", "autoencoder"))
    tr.fit(synth_dataset)
    train_hist = [h["loss"] for h in tr.history if h["phase"] == "TRAIN"]
    assert len(train_hist) == 2
    assert train_hist[1] < train_hist[0]
    assert np.isfinite(train_hist[1])


def test_ae_reconstruct_api(synth_dataset):
    tr = get_trainer("AE")(_cfg("AE", "autoencoder", numEpochs=1))
    state = tr.fit(synth_dataset)
    x = synth_dataset.slices("VAL")[:4]
    res = tr.reconstruct(state, x)
    assert res["reconstruction"].shape == x.shape
    assert np.isfinite(res["l1err"]) and np.isfinite(res["l2err"])
    # 3-D input is auto-batched (`trainers/AE.py:93-94`)
    res3 = tr.reconstruct(state, x[0])
    assert res3["reconstruction"].shape == (1,) + x.shape[1:]


def test_vae_trains_without_nan(synth_dataset):
    tr = get_trainer("VAE")(_cfg("VAE", "variational_autoencoder",
                                 numEpochs=1))
    tr.fit(synth_dataset)
    losses = [h for h in tr.history if h["phase"] == "TRAIN"]
    assert np.isfinite(losses[0]["loss"])
    assert np.isfinite(losses[0]["kl"])


def test_early_stopping_logic():
    from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
        early_stopping_update,
    )

    best, last, stop = np.inf, 0, False
    # 1 improvement then 5 non-improvements -> stop on the 5th
    best, last, stop = early_stopping_update(1.0, best, last)
    assert not stop and best == 1.0
    for i in range(5):
        best, last, stop = early_stopping_update(2.0, best, last)
    assert stop and last == 5


def test_context_masking_zeroes_inside_brain(rng):
    import jax
    import jax.numpy as jnp

    from unsupervised_anomaly_detection_brain_mri_tpu.train.context import (
        random_context_masks,
    )

    x = np.ones((4, 64, 64, 1), np.float32)
    mask = np.zeros((4, 64, 64), np.float32)
    mask[:, 8:56, 8:56] = 1.0
    out = np.asarray(random_context_masks(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(mask)))
    zeroed = (out == 0).sum(axis=(1, 2, 3))
    assert (zeroed > 0).all()  # every sample got at least one box
    assert (zeroed <= 3 * 400).all()  # at most 3 boxes of 20x20
    # boxes must be inside the brain bounding box
    outside = out[:, :8, :, :]
    assert (outside == 1).all()
