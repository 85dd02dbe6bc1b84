"""Round-4 additions: cross-volume batched restoration (VERDICT r3 #7).

The iterative input-restoration eval loop (`trainers/VAE_You.py:125-147`,
`trainers/GMVAE.py:166-197`) is the slowest reference workflow; here it is
vmapped over stacked whole volumes so K patients restore per device
dispatch.  These tests pin the contract that batching is a pure execution
change: outputs match the sequential per-volume path, including zero-padded
ragged slice counts, MC-dropout rng streams, and GMVAE's d(mean loss)/dx
batch-scale semantics.
"""

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
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _cfg(trainer, model, **kw):
    base = dict(trainer=trainer, model=model, batchsize=8, outputWidth=32,
                outputHeight=32, zDim=16, numEpochs=1,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


def _stack_pad(vols):
    K = len(vols)
    S = max(v.shape[0] for v in vols)
    out = np.zeros((K, S) + vols[0].shape[1:], np.float32)
    for k, v in enumerate(vols):
        out[k, : v.shape[0]] = v
    return jnp.asarray(out)


def _ragged_vols():
    r = np.random.default_rng(0)
    return [r.uniform(0, 1, (6, 32, 32, 1)).astype(np.float32),
            r.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32),
            r.uniform(0, 1, (6, 32, 32, 1)).astype(np.float32)]


@pytest.mark.parametrize("dropout", [False, True])
def test_vae_you_batched_restoration_matches_sequential(dropout):
    tr = get_trainer("VAE_You")(_cfg(
        "VAE_You", "variational_autoencoder", restore_steps=3,
        tv_lambda=0.5, restore_lr=1e-3, dropout_rate=0.3))
    state = tr.init_state()
    vols = _ragged_vols()
    keys = [jax.random.key(11 + 7 * k) for k in range(len(vols))]
    seq = [np.asarray(tr.reconstruct_device(
        state, v, dropout=dropout, rng=k)["reconstruction"])
        for v, k in zip(vols, keys)]
    stacked = _stack_pad(vols)
    bat = tr.reconstruct_volumes_device(
        state, stacked, dropout=dropout,
        rngs=jnp.stack(keys))["reconstruction"]
    for k, v in enumerate(vols):
        np.testing.assert_allclose(
            np.asarray(bat[k, : v.shape[0]]), seq[k], rtol=2e-5, atol=2e-6)


def _gmvae_trainer(**kw):
    base = dict(restore_steps=3, tv_lambda=0.5, restore_lr=1e-3,
                dim_c=3, dim_z=1, dim_w=1)
    base.update(kw)
    return get_trainer("GMVAE_spatial")(_cfg(
        "GMVAE_spatial", "gaussian_mixture_variational_autoencoder_spatial",
        **base))


def test_gmvae_batched_restoration_matches_sequential_with_padding():
    """GMVAE restoration differentiates the loss SUM (the reference's
    scalar-mean broadcast under tf.gradients, `trainers/GMVAE.py:94-95`),
    which decomposes per-sample — so ragged zero-padded batching must
    reproduce the sequential per-volume outputs with no rescaling."""
    tr = _gmvae_trainer()
    state = tr.init_state()
    vols = _ragged_vols()
    keys = [jax.random.key(5 + 3 * k) for k in range(len(vols))]
    seq = [np.asarray(tr.reconstruct_device(
        state, v, rng=k)["reconstruction"]) for v, k in zip(vols, keys)]
    stacked = _stack_pad(vols)
    bat = tr.reconstruct_volumes_device(
        state, stacked, rngs=jnp.stack(keys))["reconstruction"]
    for k, v in enumerate(vols):
        np.testing.assert_allclose(
            np.asarray(bat[k, : v.shape[0]]), seq[k], rtol=2e-4, atol=1e-5)


def test_gmvae_restoration_batch_size_invariant():
    """The decisive reference semantic (round-4 audit): in
    `tf.gradients(loss + restore, x)` the scalar batch-mean loss
    broadcasts over the (B,) restore vector, so the differentiated
    objective is the loss SUM — a slice's restoration trajectory must not
    depend on how many other slices share the batch.  (A 1/B scale, as an
    earlier revision had, fails this: alone vs in a 6-slice batch differs
    6x on the pixel term.)"""
    tr = _gmvae_trainer()
    state = tr.init_state()
    vol = _ragged_vols()[0]  # (6, 32, 32, 1)
    key = jax.random.key(3)
    full = np.asarray(tr.reconstruct_device(
        state, vol, rng=key)["reconstruction"])
    alone = np.asarray(tr.reconstruct_device(
        state, vol[:1], rng=key)["reconstruction"])
    np.testing.assert_allclose(alone[0], full[0], rtol=2e-4, atol=1e-5)
    moved = np.abs(full - vol).max()
    assert moved > 0, "restoration did not move the input at all"


def test_log_every_n_batches_streams_from_jitted_epoch(synth_dataset,
                                                       capsys):
    """--log-every-n parity option (`trainers/AE.py:86`): per-batch metric
    lines stream from inside the jitted epoch scan via an async debug
    callback."""
    import jax as _jax

    from unsupervised_anomaly_detection_brain_mri_tpu.config import Options

    tr = get_trainer("AE")(_cfg("AE", "autoencoder", numEpochs=1),
                           options=Options(logEveryNBatches=2))
    tr.fit(synth_dataset)
    _jax.effects_barrier()
    out = capsys.readouterr().out
    assert "batch [" in out and "loss:" in out


def test_evaluate_batched_restoration_matches_sequential(
        synth_lesion_dataset):
    """The eval driver with restorationVolumeBatch>1 must produce the same
    residuals, reconstruction errors and uncertainty maps as the
    per-volume path (`utils/Evaluation.py:183-365` semantics)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        _evaluate,
    )

    tr = get_trainer("VAE_You")(_cfg(
        "VAE_You", "variational_autoencoder", restore_steps=2,
        tv_lambda=0.5, restore_lr=1e-3, dropout_rate=0.2))
    state = tr.init_state()
    cfg = tr.config

    def run(batch_volumes, mc):
        opts = Options(paths=PathConfig(sample_dir=tempfile.mkdtemp()),
                       erosionIterations=1, minLesionSize=2,
                       numMonteCarloSamples=mc,
                       restorationVolumeBatch=batch_volumes)
        out, kept = _evaluate(synth_lesion_dataset, tr, state,
                              tempfile.mkdtemp(), opts, cfg, split="TEST")
        return out

    for mc in (0, 2):
        a = run(1, mc)
        b = run(2, mc)
        np.testing.assert_allclose(np.asarray(b["diffs"]),
                                   np.asarray(a["diffs"]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(b["l1reconstructionErrors"],
                                   a["l1reconstructionErrors"], rtol=2e-5)
        assert b["slices_per_patient"] == a["slices_per_patient"]
        if mc > 1:
            np.testing.assert_allclose(
                b["epistemic_variance"], a["epistemic_variance"],
                rtol=2e-4, atol=1e-7)
