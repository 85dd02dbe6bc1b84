"""Round-3 parity fixes (VERDICT.md round 2).

1. MC dropout through restoration-based reconstruction: VAE_You / GMVAE
   `reconstruct_device` must honor ``dropout``/``rng`` — the reference
   applies dropout during the restoration loop "only during MC sampling"
   (`trainers/VAE_You.py:134`, `trainers/GMVAE.py:186`) — and ceVAE's
   gradient path must share the forward's dropout mask
   (`trainers/ceVAE.py:128-139`).
"""

import numpy as np
import jax
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    Options,
    PathConfig,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _mk(trainer, model, **kw):
    cfg = Config(trainer=trainer, model=model, batchsize=2, outputWidth=32,
                 outputHeight=32, zDim=16, numEpochs=1,
                 compute_dtype="float32", dropout_rate=0.2, **kw)
    tr = get_trainer(trainer)(cfg)
    state = tr.init_state(jax.random.key(7))
    return tr, state


def _slices(n=2):
    rng = np.random.default_rng(3)
    x = rng.random((n, 32, 32, 1), np.float32)
    return x


@pytest.mark.parametrize("trainer,model,kw", [
    ("VAE_You", "variational_autoencoder",
     dict(restore_steps=3, restore_lr=1e-3, tv_lambda=1.0)),
    ("GMVAE", "gaussian_mixture_variational_autoencoder",
     dict(restore_steps=3, restore_lr=1e-3, tv_lambda=1.0,
          dim_c=3, dim_z=16, dim_w=1)),
])
def test_restoration_honors_dropout_and_rng(trainer, model, kw):
    tr, state = _mk(trainer, model, **kw)
    x = _slices()
    r0 = jax.random.key(0)

    off = np.asarray(tr.reconstruct_device(
        state, x, dropout=False, rng=r0)["reconstruction"])
    off2 = np.asarray(tr.reconstruct_device(
        state, x, dropout=False, rng=r0)["reconstruction"])
    on = np.asarray(tr.reconstruct_device(
        state, x, dropout=True, rng=r0)["reconstruction"])
    on_b = np.asarray(tr.reconstruct_device(
        state, x, dropout=True, rng=jax.random.key(1))["reconstruction"])

    # deterministic given (dropout, rng)
    np.testing.assert_array_equal(off, off2)
    # dropout changes the restoration trajectory at the SAME rng
    assert np.abs(on - off).max() > 0, "dropout flag ignored in restoration"
    # distinct rngs give distinct MC samples
    assert np.abs(on - on_b).max() > 0, "rng ignored in restoration"
    assert np.all(np.isfinite(on)) and np.all(np.isfinite(on_b))


def test_cevae_restoration_honors_dropout():
    tr, state = _mk("ceVAE", "context_encoder_variational_autoencoder",
                    use_gradient_based_restoration=0.1)
    x = _slices()
    r0 = jax.random.key(0)
    off = np.asarray(tr.reconstruct_device(
        state, x, dropout=False, rng=r0)["reconstruction"])
    on = np.asarray(tr.reconstruct_device(
        state, x, dropout=True, rng=r0)["reconstruction"])
    on_b = np.asarray(tr.reconstruct_device(
        state, x, dropout=True, rng=jax.random.key(5))["reconstruction"])
    assert np.abs(on - off).max() > 0
    assert np.abs(on - on_b).max() > 0


def test_mc_eval_nonzero_epistemic_variance_restoration(
        synth_lesion_dataset, tmp_path):
    """End-to-end: numMonteCarloSamples=3 with a restoration trainer must
    produce nonzero epistemic variance inside the brainmask (pre-fix this
    was identically zero — every MC sample was the same)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

    tr, state = _mk("VAE_You", "variational_autoencoder",
                    restore_steps=2, restore_lr=1e-3, tv_lambda=1.0)
    opts = Options(paths=PathConfig(sample_dir=str(tmp_path)),
                   erosionIterations=1, minLesionSize=2,
                   numMonteCarloSamples=3)
    res = evaluate(synth_lesion_dataset, tr, state, opts, tr.config)
    ev = res["epistemic_variance"]
    assert np.all(np.isfinite(ev))
    assert float(np.max(ev)) > 0.0, "MC samples identical -> dropout ignored"
