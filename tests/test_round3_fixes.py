"""Round-3 parity fixes (VERDICT.md round 2).

1. MC dropout through restoration-based reconstruction: VAE_You / GMVAE
   `reconstruct_device` must honor ``dropout``/``rng`` — the reference
   applies dropout during the restoration loop "only during MC sampling"
   (`trainers/VAE_You.py:134`, `trainers/GMVAE.py:186`) — and ceVAE's
   gradient path must share the forward's dropout mask
   (`trainers/ceVAE.py:128-139`).
2. Geometry-preserving residual export: residual volumes are de-zoomed to
   native resolution and written into the source scan's geometry
   (`utils/Evaluation.py:323-334`, `utils/NII.py:107-109`).
3. Heatmap artifact parity: squash + colorbar + jet without per-slice
   renormalisation (`utils/Evaluation.py:70-79, 318-321`).
"""

import os

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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# 2. geometry-preserving residual export


def test_nifti_affine_roundtrip(tmp_path):
    from unsupervised_anomaly_detection_brain_mri_tpu.data import formats

    affine = [[0.0, -0.9, 0.0, 12.5],
              [1.1, 0.0, 0.0, -7.0],
              [0.0, 0.0, 1.2, 3.0]]
    data = np.arange(4 * 5 * 6, dtype=np.float32).reshape(4, 5, 6)
    path = str(tmp_path / "vol.nii.gz")
    formats.write_nifti(path, data, affine=affine)
    back, meta = formats.read_nifti(path)
    np.testing.assert_allclose(back, data)
    np.testing.assert_allclose(meta["affine"], affine, atol=1e-5)
    # pixdim = column norms of the rotation part
    np.testing.assert_allclose(meta["pixdim"], (1.1, 0.9, 1.2), atol=1e-5)


def test_export_residual_volume_native_geometry(tmp_path):
    from unsupervised_anomaly_detection_brain_mri_tpu.data import formats
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        export_residual_volume,
    )

    # source scan: (64, 70, 20), iterated along axis 1 (70 slices of 64x20)
    shape, axis = (64, 70, 20), 1
    geometry = {
        "shape": shape, "axis_index": axis,
        "pixdim": (0.9, 1.1, 1.2),
        "affine": [[0.9, 0, 0, -30.0], [0, 1.1, 0, 5.0], [0, 0, 1.2, 0.0]],
        "slice_range": (4, 16),
    }
    rng = np.random.default_rng(0)
    diff = rng.random((12, 32, 32), np.float32)  # model resolution
    path = str(tmp_path / "p0.nii.gz")
    native = export_residual_volume(path, diff, geometry, threshold=0.8)

    back, meta = formats.read_nifti(path)
    # full native extent + original geometry
    assert back.shape == shape
    np.testing.assert_allclose(meta["affine"], geometry["affine"],
                               atol=1e-5)
    np.testing.assert_allclose(back, native, atol=1e-6)
    # out-of-range slices zeroed, in-range slices carry the de-zoomed data
    assert np.all(back.take(range(0, 4), axis=axis) == 0)
    assert np.all(back.take(range(16, 70), axis=axis) == 0)
    assert float(np.abs(back.take(range(4, 16), axis=axis)).max()) > 0
    # de-zoom matches scipy on the slice grid (reference `:323-325`)
    from scipy import ndimage as ndi

    expect = ndi.zoom(diff, (1.0, 64 / 32, 20 / 32))
    got = np.moveaxis(back, axis, 2)[:, :, 4:16]
    np.testing.assert_allclose(np.transpose(got, (2, 0, 1)), expect,
                               atol=1e-5)
    # binary twin thresholded at native resolution
    binary, _ = formats.read_nifti(str(tmp_path / "p0.binary.nii.gz"))
    np.testing.assert_array_equal(binary, (back > 0.8).astype(np.float32))


def test_evaluate_exports_native_geometry(synth_lesion_dataset, tmp_path):
    """End-to-end: exportVolumes writes volumes in the dataset's native
    frame (full extent, zeros outside the evaluated slice range)."""
    import glob

    from unsupervised_anomaly_detection_brain_mri_tpu.data import formats
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

    tr, state = _mk("AE", "autoencoder")
    opts = Options(paths=PathConfig(sample_dir=str(tmp_path)),
                   erosionIterations=1, minLesionSize=2,
                   exportVolumes=True)
    res = evaluate(synth_lesion_dataset, tr, state, opts, tr.config)
    exports = sorted(glob.glob(os.path.join(
        res["eval_dir"], "samples_test_PC", "*.nii.gz")))
    assert exports, "exportVolumes produced no NIfTI files"
    vols = [p for p in exports if not p.endswith(".binary.nii.gz")]
    patient = synth_lesion_dataset.patients_of("TEST")[0]
    vol, _, _, _ = synth_lesion_dataset.load_volume_and_groundtruth(patient)
    back, _ = formats.read_nifti(vols[0])
    assert back.shape == vol.shape


# ---------------------------------------------------------------------------
# 3. heatmap artifact parity


def test_residual_heatmap_squash_and_colorbar():
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.artifacts import (
        add_colorbar,
        residual_heatmap,
        squash_intensities,
    )

    # logistic squash maps residual scale [0, 0.2] onto ~[0, 1)
    assert squash_intensities(np.float32(0.0)) == 0.0
    assert 0.99 < squash_intensities(np.float32(0.2)) <= 1.0
    ramp = add_colorbar(np.zeros((16, 16), np.float32))
    np.testing.assert_allclose(ramp[:, -1], np.arange(16) / 16.0)

    heat = residual_heatmap(np.zeros((16, 16), np.float32))
    assert heat.shape == (16, 16, 3)
    body = heat[:, :-1]
    # no per-slice renormalisation: a zero residual is uniformly jet(0)
    assert np.all(body == body[0, 0])
    # the colorbar column spans the colormap
    assert len(np.unique(heat[:, -1].reshape(-1, 3), axis=0)) > 8


def test_heatmaps_comparable_across_slices(tmp_path):
    """Two slices with different maxima must NOT be renormalised to the
    same heatmap (the pre-fix min-max normalisation erased scale)."""
    import imageio.v2 as imageio

    from unsupervised_anomaly_detection_brain_mri_tpu.eval import artifacts

    d = str(tmp_path)
    x = np.zeros((2, 8, 8), np.float32)
    diffs = np.stack([np.full((8, 8), 0.02, np.float32),
                      np.full((8, 8), 0.2, np.float32)])
    artifacts.export_slice_images(d, x, x, diffs, x, x)
    h0 = imageio.imread(os.path.join(d, "0_heatmap.png"))
    h1 = imageio.imread(os.path.join(d, "1_heatmap.png"))
    assert not np.array_equal(h0[:, :-1], h1[:, :-1])


def test_slice_png_artifact_parity(synth_lesion_dataset, tmp_path):
    """exportPNGs dumps the reference's per-slice artifact set under
    `{patient}_{absolute slice}` names: the raw pre-median `_diff.png`
    (:305) PLUS `_diff_filtered.png`/`_heatmap.png` from the filtered
    stack (:311-321) and the `_vis.png` overlay (:501-507)."""
    import glob

    import imageio.v2 as imageio

    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

    tr, state = _mk("AE", "autoencoder")
    opts = Options(paths=PathConfig(sample_dir=str(tmp_path)),
                   erosionIterations=1, minLesionSize=2,
                   exportPNGs=True, medianFiltering=True)
    res = evaluate(synth_lesion_dataset, tr, state, opts, tr.config)
    sdir = os.path.join(res["eval_dir"], "samples_test_PC")
    s0 = int(getattr(synth_lesion_dataset.options, "sliceStart", 0))
    pre = f"0_{s0}"
    for suffix in ("", "_rec", "_gt", "_diff", "_diff_filtered",
                   "_heatmap", "_vis"):
        path = os.path.join(sdir, f"{pre}{suffix}.png")
        assert os.path.exists(path), f"missing {pre}{suffix}.png"
    # an untrained AE's residuals are speckled -> the 5^3 median visibly
    # differs from the raw residual
    raw = imageio.imread(os.path.join(sdir, f"{pre}_diff.png"))
    filt = imageio.imread(os.path.join(sdir, f"{pre}_diff_filtered.png"))
    assert raw.shape == filt.shape
    assert not np.array_equal(raw, filt)
    # second kept TEST patient enumerates as prefix "1_"
    assert glob.glob(os.path.join(sdir, "1_*_diff.png"))


def test_logvar_png_export(tmp_path):
    """Models emitting a `log_var` head get `{p}_{s}_logvar.png` dumps
    (`utils/Evaluation.py:306-309`)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import artifacts

    d = str(tmp_path)
    x = np.zeros((2, 8, 8), np.float32)
    lv = np.stack([np.full((8, 8), -1.0, np.float32),
                   np.full((8, 8), 1.0, np.float32)])
    artifacts.export_slice_images(d, x, x, x, x, x, log_vars=lv,
                                  names=["0_20", "0_21"])
    assert os.path.exists(os.path.join(d, "0_20_logvar.png"))
    assert os.path.exists(os.path.join(d, "0_21_logvar.png"))


def test_resume_after_early_stop_trains_no_further(synth_dataset, tmp_path):
    """A run whose replayed VAL history has ALREADY triggered early
    stopping must be recognized on resume — fit(resume=True) returns the
    restored state instead of training extra epochs past the stop."""
    import json

    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=10,
                 compute_dtype="float32", earlyStoppingPatience=1)
    wd = str(tmp_path / "wd")
    tr = get_trainer("AE")(cfg, workdir=wd)
    state = tr.fit(synth_dataset)
    trained_epoch = int(np.asarray(state.epoch).ravel()[0])
    assert trained_epoch == cfg.numEpochs

    # synthesize the early-stopped run: non-improving VAL costs exhaust
    # patience within the checkpointed history
    curves = os.path.join(wd, "curves.json")
    with open(curves, "w") as f:
        json.dump([{"epoch": 0, "phase": "VAL", "loss": 100.0},
                   {"epoch": 1, "phase": "VAL", "loss": 100.0},
                   {"epoch": 2, "phase": "VAL", "loss": 100.0}], f)

    tr2 = get_trainer("AE")(cfg, workdir=wd)
    state2 = tr2.fit(synth_dataset, resume=True)
    # returned immediately from the restored checkpoint: no extra epoch
    assert int(np.asarray(state2.epoch).ravel()[0]) == trained_epoch
    # ...and no new history rows were appended past the replayed ones
    assert len(tr2.history) == 3


def test_checkpoint_restore_reapplies_mesh_layout(synth_dataset, tmp_path):
    """load_checkpoint must land the restored state in the SAME sharding
    layout init_state established (params sharded under tp, replicated
    otherwise) — not on the default device."""
    from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
        MeshConfig,
        make_mesh,
    )

    ctx = make_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=1,
                 compute_dtype="float32")
    wd = str(tmp_path / "wd")
    tr = get_trainer("AE")(cfg, mesh=ctx, workdir=wd)
    state = tr.init_state(jax.random.key(0))
    tr.save_checkpoint(state, 0)

    tr2 = get_trainer("AE")(cfg, mesh=ctx, workdir=wd)
    fresh = tr2.init_state(jax.random.key(1))
    restored, step = tr2.load_checkpoint(fresh)

    flat_f, _ = jax.tree_util.tree_flatten(fresh.params)
    flat_r, _ = jax.tree_util.tree_flatten(restored.params)
    assert len(flat_f) == len(flat_r)
    for lf, lr in zip(flat_f, flat_r):
        assert lr.sharding == lf.sharding, (lr.sharding, lf.sharding)
    # values restored from the checkpoint, not from the fresh template
    orig = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(flat_r[0]), np.asarray(orig))
