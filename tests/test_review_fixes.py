"""Round-5 self-review regression tests (train/eval findings).

Pins the fixes for:
  * the VAE_You/GMVAE tv_lambda sweep result persisting across processes
    (`trainers/VAE_You.py:149-173` ran the sweep once per process; here a
    fresh eval/serving process must restore the swept value, not the -1.0
    sentinel) and restoration clamping a negative sentinel to 0;
  * fit() owing post_fit on EVERY exit path, including the
    resume-after-early-stop early return;
  * MC-dropout l1/l2 reconstruction errors coming from the last UNMASKED
    sample (`Evaluation.py:277-280`), not from the eroded-masked MC mean;
  * falsy sliceStart/sliceEnd meaning "full volume depth"
    (`Evaluation.py:216-222`);
  * PNG artifact names using the full-split patient enumeration that
    counts shape-skipped volumes (`Evaluation.py:195,207-209`).
"""

import json
import os
import tempfile
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    Options,
    PathConfig,
)
from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
    SYNTH,
    SyntheticOptions,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _tiny_ds(seed=0):
    return SYNTH(SyntheticOptions(numPatients=4, imageSize=32, numSlices=6,
                                  targetSize=32, seed=seed))


def _vae_you_cfg(**kw):
    base = dict(trainer="VAE_You", model="variational_autoencoder",
                batchsize=8, outputWidth=32, outputHeight=32, zDim=16,
                numEpochs=1, compute_dtype="float32", restore_steps=2,
                restore_lr=1e-3, tv_lambda=-1.0)
    base.update(kw)
    return Config(**base)


class TestTvLambdaPersistence:
    def test_sweep_persists_and_fresh_process_restores(self, tmp_path):
        ds = _tiny_ds()
        tr = get_trainer("VAE_You")(_vae_you_cfg(), workdir=str(tmp_path))
        tr.fit(ds)  # post_fit sweep runs (tv_lambda sentinel is -1)
        assert tr.tv_lambda_value >= 0.0
        sidecar = tmp_path / "tv_lambda.json"
        assert sidecar.is_file()
        persisted = json.load(open(sidecar))["tv_lambda_value"]
        assert persisted == tr.tv_lambda_value

        # a FRESH trainer (fresh process stand-in) restores the swept value
        tr2 = get_trainer("VAE_You")(_vae_you_cfg(), workdir=str(tmp_path))
        assert tr2.tv_lambda_value == -1.0
        restored = tr2.load_checkpoint(tr2.init_state())
        assert restored is not None
        assert tr2.tv_lambda_value == persisted

    def test_restoration_clamps_negative_sentinel(self):
        tr = get_trainer("VAE_You")(_vae_you_cfg())
        state = tr.init_state()
        x = np.random.default_rng(0).uniform(
            0, 1, (4, 32, 32, 1)).astype(np.float32)
        tr.tv_lambda_value = -1.0
        neg = np.asarray(tr.reconstruct_device(
            state, x, rng=jax.random.key(1))["reconstruction"])
        tr.tv_lambda_value = 0.0
        zero = np.asarray(tr.reconstruct_device(
            state, x, rng=jax.random.key(1))["reconstruction"])
        assert np.isfinite(neg).all()
        np.testing.assert_allclose(neg, zero, rtol=0, atol=0)


def test_resume_after_early_stop_still_runs_post_fit(tmp_path):
    ds = _tiny_ds()
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=2,
                 compute_dtype="float32", earlyStoppingPatience=1)
    tr = get_trainer("AE")(cfg, workdir=str(tmp_path))
    tr.fit(ds)
    # craft a VAL history whose replay triggers early stopping on resume
    with open(tmp_path / "curves.json", "w") as f:
        json.dump([{"phase": "VAL", "epoch": 0, "loss": 1.0},
                   {"phase": "VAL", "epoch": 1, "loss": 2.0}], f)
    tr2 = get_trainer("AE")(cfg, workdir=str(tmp_path))
    called = []
    tr2.post_fit = lambda dataset, state: called.append(1)
    tr2.fit(ds, resume=True)
    assert called, "the early-stopped resume path must still run post_fit"


class _ConstTrainer:
    """reconstruct_device returning a constant 0.5 reconstruction."""

    def reconstruct_device(self, state, x, dropout=False, rng=None):
        return {"reconstruction": jnp.full_like(jnp.asarray(x), 0.5)}


def test_mc_l1_errors_use_unmasked_sample():
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        _reconstruct_volume,
    )

    x = np.random.default_rng(3).uniform(
        0, 1, (3, 8, 8, 1)).astype(np.float32)
    eroded = jnp.zeros((3, 8, 8), bool)  # mask kills EVERY voxel
    opts = Options(paths=PathConfig(), numMonteCarloSamples=3)
    out = _reconstruct_volume(_ConstTrainer(), None, x, opts,
                              jax.random.key(0), eroded)
    # masked-mean semantics would give sum|x - 0| = sum|x|; the reference
    # records the last raw sample's error: sum|x - 0.5|
    expect = np.abs(x - 0.5).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(out["l1"]), expect, rtol=1e-6)


class _MiniDataset:
    """Duck-typed dataset: first patient too small (shape-skipped)."""

    def __init__(self, slice_start, slice_end, n_slices=8, native=32):
        rng = np.random.default_rng(0)
        self.options = SimpleNamespace(sliceStart=slice_start,
                                       sliceEnd=slice_end)
        self._patients = []
        for p, ns in enumerate([2, n_slices, n_slices]):
            vol = rng.uniform(0, 1, (native, native, ns)).astype(np.float32)
            gt = (rng.uniform(0, 1, vol.shape) > 0.95).astype(np.float32)
            skm = np.ones_like(vol)
            self._patients.append(
                {"name": f"p{p}", "vol": vol, "gt": gt, "brainmask": skm,
                 "skullmap": skm})

    def patients_of(self, split):
        return self._patients

    def load_volume_and_groundtruth(self, patient):
        return (patient["vol"], patient["gt"], patient["brainmask"],
                patient["skullmap"])


class _FwdTrainer:
    def reconstruct(self, state, x, dropout=False, rng=None):
        x = np.asarray(x, np.float32)
        return {"reconstruction": (x * 0.9).astype(np.float32)}


def test_falsy_slice_end_means_full_depth(tmp_path):
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        evaluate,
    )

    ds = _MiniDataset(slice_start=0, slice_end=0, n_slices=8)
    # sliceEnd=0 must evaluate the FULL depth (reference truthiness
    # semantics), not produce 0-slice volumes; patient 0 (2 slices) is
    # included since the slice-span sanity skip is disabled when falsy
    cfg = Config(trainer="AE", model="autoencoder", batchsize=4,
                 outputWidth=32, outputHeight=32, compute_dtype="float32")
    opts = Options(paths=PathConfig(sample_dir=str(tmp_path)),
                   medianFiltering=False, erodeBrainmask=False,
                   applyHyperIntensityPrior=False)
    out = evaluate(ds, _FwdTrainer(), None, opts, cfg)
    assert len(out["l1reconstructionErrors"]) == 2 + 8 + 8


def test_artifact_names_count_skipped_patients(tmp_path):
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        evaluate,
    )

    ds = _MiniDataset(slice_start=0, slice_end=6, n_slices=8)
    cfg = Config(trainer="AE", model="autoencoder", batchsize=4,
                 outputWidth=32, outputHeight=32, compute_dtype="float32")
    opts = Options(paths=PathConfig(sample_dir=str(tmp_path)),
                   medianFiltering=False, erodeBrainmask=False,
                   applyHyperIntensityPrior=False, exportPNGs=True)
    evaluate(ds, _FwdTrainer(), None, opts, cfg)
    pngs = set()
    for root, _, files in os.walk(tmp_path):
        pngs.update(f for f in files if f.endswith(".png") and "_" in f)
    prefixes = {f.split("_")[0] for f in pngs if f.split("_")[0].isdigit()}
    # patient 0 was skipped (2 < 6-slice span) but still consumed index 0:
    # artifacts must be named 1_* / 2_*, exactly like the reference's
    # enumeration over ALL split patients
    assert "0" not in prefixes and {"1", "2"} <= prefixes, prefixes


class TestDataLayerReviewFixes:
    """Third review pass (ops/data/parallel): BRAINWEB's string-valued
    filtered_files must not be iterated character-by-character (the
    reference gathers each BrainWeb volume ONCE, `BRAINWEB.py:122,240`),
    and the slice cache must not survive a patient re-split (the cached
    pool bakes per-slice set assignments)."""

    def _counting_cls(self, gather_calls, files_value):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseDataset,
        )

        class CountD(BaseDataset):
            name = "COUNTD"

            def _get_patients(self):
                return [{"name": "p0", "filtered_files": files_value}]

            def _load_or_create_split(self):
                return {"TRAIN": ["p0"], "VAL": [], "TEST": []}

            def _gather_volume(self, patient, filename):
                gather_calls.append(filename)
                img = np.ones((4, 4), np.float32) * 0.5
                img[0, 0] = 0.0  # keep_slice needs >1 unique value
                return [img], [np.zeros((4, 4), np.float32)]

        return CountD

    def test_string_filtered_files_gathers_once(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        calls = []
        cls = self._counting_cls(calls, "/some/long/path/volume.mnc.gz")
        ds = cls(BaseOptions(dir=str(tmp_path), cache=False))
        assert calls == ["/some/long/path/volume.mnc.gz"]
        assert ds._images.shape[0] == 1

    def test_brainweb_patients_carry_file_lists(self, tmp_path):
        import gzip

        from unsupervised_anomaly_detection_brain_mri_tpu.data.brainweb import (
            BRAINWEB,
        )

        # discovery-only check: one fake .mnc.gz in the expected layout
        d = tmp_path / "normal"
        d.mkdir()
        with gzip.open(d / "t1_icbm_normal_1mm_pn3_rf20.mnc.gz", "wb") as f:
            f.write(b"\x00")
        (tmp_path / "groundtruth").mkdir()
        from unsupervised_anomaly_detection_brain_mri_tpu.data.brainweb import (
            BrainwebOptions,
        )

        pats = BRAINWEB.__new__(BRAINWEB)
        pats.options = BrainwebOptions(dir=str(tmp_path))
        found = pats._get_patients()
        assert found, "fixture file not discovered"
        for p in found:
            assert isinstance(p["filtered_files"], list), p

    def test_cache_key_tracks_patient_split(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.base import (
            BaseOptions,
        )

        calls = []
        cls = self._counting_cls(calls, ["f0"])
        split_holder = [{"TRAIN": ["p0"], "VAL": [], "TEST": []}]
        cls._load_or_create_split = lambda self: split_holder[0]
        ds1 = cls(BaseOptions(dir=str(tmp_path), cache=True))
        assert len(calls) == 1
        assert int(ds1._sets[0]) == 0  # TRAIN
        # re-split (as after deleting the split manifest): the cache must
        # NOT serve the old per-slice set assignment
        split_holder[0] = {"TRAIN": [], "VAL": [], "TEST": ["p0"]}
        ds2 = cls(BaseOptions(dir=str(tmp_path), cache=True))
        assert int(ds2._sets[0]) == 2  # TEST, rebuilt — not stale TRAIN


def test_initialize_multihost_argless_is_single_host_noop():
    """The documented contract: argless bring-up on a single host must not
    raise (run in a subprocess so jax.distributed state never leaks into
    this test process)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from unsupervised_anomaly_detection_brain_mri_tpu.parallel."
        "collectives import initialize_multihost\n"
        "initialize_multihost()\n"
        "print('NOOP-OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "NOOP-OK" in r.stdout
