"""Whole-pipeline golden-parity harness (round-1 VERDICT item #1).

Re-implements the reference's ENTIRE evaluation recipe in pure
numpy/scipy/sklearn — zoom -> reconstruct -> positive residual -> eroded
brainmask -> hyperintensity prior -> 5^3 median filter -> threshold ->
CC<=7 filter -> dice/AUROC/AUPRC/detection counts — and asserts the
on-device `evaluate()` pipeline reproduces it end-to-end on randomized
synthetic volumes.

Host recipe parity map (all into /root/reference/):
  * slice zoom + residual + masking .... utils/Evaluation.py:228-289
  * MC-dropout uncertainty ............. utils/Evaluation.py:238-272
  * 3-D median filter .................. utils/Evaluation.py:108-110, 311
  * CC filter (filled_area <= 7) ....... utils/Evaluation.py:113-127
  * detection counts (20-slice chunks) . utils/Evaluation.py:130-172
  * ROC / PRC / AP ..................... trainers/Metrics.py:17-64
  * recursive dice curve ............... trainers/Metrics.py:110-162
  * precision-70 operating point ....... utils/Evaluation.py:425-440
  * per-patient + confusion metrics .... utils/Evaluation.py:461-499

The model is mocked with a deterministic reconstruction (separable blur +
shrink, plus key-addressed noise for MC samples) so both pipelines see
bitwise-identical reconstructions; everything downstream is computed twice
— once by the framework on device, once here on the host — and compared.
"""

import math
import os
import tempfile
from types import SimpleNamespace

import jax
import numpy as np
import pytest
from scipy import ndimage as ndi
from sklearn.metrics import (
    auc,
    average_precision_score,
    roc_curve,
)

from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    Options,
    PathConfig,
)
from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate

STRUCT26 = np.ones((3, 3, 3), bool)
CROSS2D = ndi.generate_binary_structure(2, 1)


def prc_sklearn_023(y_true: np.ndarray, probas_pred: np.ndarray):
    """Literal `precision_recall_curve` of scikit-learn 0.23 — the version
    the reference PINS (`requirements.txt:13`).  Vendored because modern
    sklearn (1.9 here) dropped the full-recall truncation (`last_ind`
    slice), which moves `np.argmax(precisions <= 0.7)`'s answer: the
    reference's curve STARTS at the highest full-recall threshold, the
    modern one at the minimum score.  The installed library is therefore
    NOT a valid oracle for `Evaluation.py:439`."""
    y = np.asarray(y_true).astype(bool)
    s = np.asarray(probas_pred)
    desc = np.argsort(-s, kind="mergesort")
    y, s = y[desc], s[desc]
    distinct = np.where(np.diff(s))[0]
    threshold_idxs = np.r_[distinct, y.size - 1]
    tps = np.cumsum(y)[threshold_idxs]
    fps = 1 + threshold_idxs - tps
    thresholds = s[threshold_idxs]
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = tps / (tps + fps)
    precision[np.isnan(precision)] = 0
    recall = tps / tps[-1]
    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    return np.r_[precision[sl], 1], np.r_[recall[sl], 0], thresholds[sl]


# ---------------------------------------------------------------------------
# deterministic mock model, shared bitwise by both pipelines


def _mock_reconstruct(x: np.ndarray, key=None) -> np.ndarray:
    """Blur + shrink; with a key, adds reproducible 'dropout' noise.

    x: (S, H, W, 1) float32.  Elementwise/per-slice, so whole-volume and
    per-slice invocations agree bitwise.
    """
    rec = ndi.gaussian_filter(x, sigma=(0.0, 1.5, 1.5, 0.0)) * np.float32(0.9)
    if key is not None:
        noise = np.asarray(jax.random.normal(key, x.shape, np.float32))
        rec = rec + np.float32(0.02) * noise
    return rec.astype(np.float32)


class GoldenTrainer:
    """Duck-typed trainer exposing only `reconstruct` (the eval contract)."""

    def reconstruct(self, state, x, dropout=False, rng=None):
        x = np.asarray(x, np.float32)
        rec = _mock_reconstruct(x, key=rng if dropout else None)
        return {"reconstruction": rec}


class GoldenDataset:
    """Duck-typed dataset: patients_of + load_volume_and_groundtruth."""

    name = "golden"

    def __init__(self, patients, slice_start, slice_end):
        self._patients = patients
        self.options = SimpleNamespace(sliceStart=slice_start,
                                       sliceEnd=slice_end)

    def patients_of(self, split):
        return self._patients

    def load_volume_and_groundtruth(self, patient):
        return (patient["vol"], patient["gt"], patient["brainmask"],
                patient["skullmap"])


def make_patients(n=3, native=80, n_slices=14, seed=0, truncate_last=False):
    """Synthetic (H, W, S) float32 volumes: disc brain, bright blob lesions."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:native, :native]
    cy = cx = native / 2.0
    brain = ((yy - cy) ** 2 + (xx - cx) ** 2) < (0.36 * native) ** 2
    patients = []
    for p in range(n):
        vol = np.zeros((native, native, n_slices), np.float32)
        gt = np.zeros_like(vol)
        skm = np.repeat(brain[:, :, None], n_slices, axis=2).astype(np.float32)
        for s in range(n_slices):
            tissue = 0.25 + 0.2 * rng.random((native, native))
            vol[:, :, s] = np.where(brain, tissue, 0.0)
        # a few bright lesion blobs per patient
        for _ in range(4):
            ly = rng.integers(native // 4, 3 * native // 4)
            lx = rng.integers(native // 4, 3 * native // 4)
            ls = rng.integers(2, n_slices - 4)
            r = rng.integers(3, 7)
            zz, hy, hx = np.mgrid[:n_slices, :native, :native]
            blob = (((hy - ly) ** 2 + (hx - lx) ** 2) / r ** 2
                    + (zz - ls) ** 2 / 4.0) < 1.0
            blob = np.transpose(blob, (1, 2, 0)) & (skm > 0.5)
            vol[blob] = 0.9
            gt[blob] = 1.0
        # salt noise outside lesions (makes curves non-trivial)
        salt = (rng.random(vol.shape) < 0.001) & (skm > 0.5) & (gt == 0)
        vol[salt] = 0.85
        if truncate_last and p == n - 1:
            vol = vol[:, :, :4]
            gt = gt[:, :, :4]
            skm = skm[:, :, :4]
        patients.append({"name": f"p{p}", "vol": vol, "gt": gt,
                         "brainmask": skm, "skullmap": skm})
    return patients


# ---------------------------------------------------------------------------
# host (reference-recipe) implementation


def ref_dice(P, G):
    P = np.asarray(P, np.float64).ravel()
    G = np.asarray(G, np.float64).ravel()
    return (2.0 * np.sum(P * G)) / (np.sum(P) + np.sum(G))


def ref_precision(P, G):
    P = np.asarray(P, bool).ravel()
    G = np.asarray(G, bool).ravel()
    tp = np.sum(P & G)
    fp = np.sum(P & ~G)
    return tp / (tp + fp) if (tp + fp) else np.nan


def ref_recall(P, G):
    P = np.asarray(P, bool).ravel()
    G = np.asarray(G, bool).ravel()
    tp = np.sum(P & G)
    fn = np.sum(~P & G)
    return tp / (tp + fn)


def ref_vd(P, G):
    tps = np.multiply(np.asarray(P, bool).ravel(),
                      np.asarray(G, bool).ravel())
    G = np.asarray(G, bool).ravel()
    return np.sum(np.abs(np.logical_xor(tps, G))) / np.sum(G)


def ref_filter_3d_connected_components(volume: np.ndarray) -> np.ndarray:
    """`filter_3d_connected_components` (Evaluation.py:113-127):
    26-connectivity, remove components with filled_area <= 7."""
    volume = volume.copy()
    labels, n = ndi.label(volume, structure=STRUCT26)
    for lbl in range(1, n + 1):
        comp = labels == lbl
        filled = ndi.binary_fill_holes(comp)
        if filled.sum() <= 7:
            volume[comp] = 0
    return volume


def ref_compute_detection_rate(pred, gt):
    """`compute_detection_rate` (Evaluation.py:130-172), scipy.ndimage
    (26-connectivity) in place of skimage label/regionprops."""
    tps = fps = fns = 0
    num_slices = gt.shape[0]
    inter = np.multiply(pred, gt)
    for s in range(int(math.ceil(num_slices / 20))):
        sl = slice(s * 20, min((s + 1) * 20, num_slices))
        cc_i, n_i = ndi.label(inter[sl], structure=STRUCT26)
        cc_p, n_p = ndi.label(pred[sl], structure=STRUCT26)
        cc_g, _ = ndi.label(gt[sl], structure=STRUCT26)
        sizes = np.bincount(cc_p.ravel(), minlength=n_p + 1)
        for lbl in range(1, n_p + 1):
            if sizes[lbl] < 8:
                cc_p[cc_p == lbl] = 0
        for lbl in range(1, n_i + 1):
            c = np.argwhere(cc_i == lbl)[0]
            cc_p[cc_p == cc_p[tuple(c)]] = 0
            cc_g[cc_g == cc_g[tuple(c)]] = 0
        tps += n_i
        fps += len([v for v in np.unique(cc_p) if v != 0])
        fns += len([v for v in np.unique(cc_g) if v != 0])
    return tps, fps, fns


def ref_compute_dice_score(predictions, labels, granularity):
    """`compute_dice_score` (Metrics.py:138-162): adaptive recursive grid."""

    def xfrange(start, stop, step):
        i = 0
        while start + i * step < stop:
            yield start + i * step
            i += 1

    def inner(start, stop, decimal):
        _threshs, _scores = [], []
        had_recursion = False
        if decimal == granularity:
            return _threshs, _scores
        for i, t in enumerate(xfrange(start, stop, 1.0 / (10.0 ** decimal))):
            score = ref_dice(np.where(predictions > t, 1, 0), labels)
            if i >= 2 and score <= _scores[i - 1] and not had_recursion:
                st, sc = inner(_threshs[i - 2], t, decimal + 1)
                _threshs.extend(st)
                _scores.extend(sc)
                had_recursion = True
            _scores.append(score)
            _threshs.append(t)
        return _threshs, _scores

    threshs, scores = inner(0, 1.0, 1)
    pairs = sorted(zip(threshs, scores))
    threshs, scores = list(zip(*pairs))
    return scores, threshs


def exact_best_dice(scores, labels):
    """Independent numpy global-optimum sweep over all distinct cut points
    under the reference's strict `scores > t` convention."""
    scores = np.asarray(scores, np.float64).ravel()
    labels = np.asarray(labels, np.float64).ravel()
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    tps = np.cumsum(labels[order])
    fps = np.cumsum(1.0 - labels[order])
    P = tps[-1]
    distinct = np.r_[s[:-1] != s[1:], True]
    dice_v = 2.0 * tps / (tps + fps + P)
    dice_v[~distinct] = -1.0
    i = int(np.argmax(dice_v))
    nxt = s[i + 1] if i + 1 < len(s) else 0.0
    return float(dice_v[i]), float(nxt)


def golden_host_eval(patients, options: Options, target, seed: int):
    """The reference `_evaluate` + `evaluate` recipe on the host."""
    S0 = 2
    S1 = S0 + 10
    mc = int(options.numMonteCarloSamples or 0)
    rng = jax.random.key(seed + 7)
    diffs_all, labels_all, epist_all, spp = [], [], [], []
    for p, pat in enumerate(patients):
        vol, gt, _, skm = (pat["vol"], pat["gt"], pat["brainmask"],
                           pat["skullmap"])
        if min(vol.shape) < (S1 - S0):
            continue  # shape-sanity skip (Evaluation.py:207-209)
        prior_q = np.float32(np.quantile(vol, 0.9))
        s1 = min(S1, vol.shape[2])
        xs, segs, sks = [], [], []
        for s in range(S0, s1):
            sd = vol[:, :, s]
            sg = gt[:, :, s].astype(int)
            sk = skm[:, :, s].astype(int)
            if sd.shape != tuple(target):
                zf = (target[0] / sd.shape[0], target[1] / sd.shape[1])
                sd = ndi.zoom(sd, zf)
                sg = ndi.zoom(sg, zf, mode="nearest")
                sk = ndi.zoom(sk, zf, mode="nearest")
            xs.append(sd.astype(np.float32))
            segs.append(sg != 0)
            sks.append(sk != 0)
        x = np.stack(xs)[..., None]  # (S, H, W, 1)
        if options.erodeBrainmask:
            eroded = np.stack([
                ndi.binary_erosion(m, structure=CROSS2D,
                                   iterations=options.erosionIterations)
                for m in sks])
        else:
            eroded = np.stack(sks)
        mask4 = eroded[..., None].astype(np.float32)
        if mc > 1:
            key_p = jax.random.fold_in(rng, p)
            recs = np.stack([
                _mock_reconstruct(x, key=jax.random.fold_in(key_p, i)) * mask4
                for i in range(mc)])
            rec = recs.mean(axis=0)
            epist = (np.mean(np.square(recs), axis=0)
                     - np.square(np.mean(recs, axis=0)))
            epist_all.append(epist[..., 0])
        else:
            rec = _mock_reconstruct(x)
        if options.keepOnlyPositiveResiduals:
            d = np.maximum(x - rec, 0.0)
        else:
            d = np.abs(x - rec)
        d = (d * mask4)[..., 0]
        if options.applyHyperIntensityPrior:
            d[x[..., 0] < prior_q] = 0.0
        d = d.astype(np.float32)
        if options.medianFiltering:
            d = ndi.median_filter(d, (5, 5, 5))
        diffs_all.append(d)
        labels_all.append(np.stack(segs))
        spp.append(len(d))

    diffs = np.concatenate(diffs_all)
    labels = np.concatenate(labels_all)
    flat_d = diffs.ravel()
    flat_l = labels.astype(int).ravel()

    out = {"diffs": diffs, "labels": labels, "slices_per_patient": spp}
    fpr_v, tpr_v, _ = roc_curve(flat_l, flat_d)
    out["diff_AUC"] = auc(fpr_v, tpr_v)
    precisions, recalls, threshs = prc_sklearn_023(flat_l, flat_d)
    out["diff_AUPRC"] = average_precision_score(flat_l, flat_d)
    idx70 = int(np.argmax(precisions <= 0.7))
    t70 = threshs[min(idx70, len(threshs) - 1)]
    out["precision70Threshold"] = float(t70)
    thr_p70 = ref_filter_3d_connected_components(
        np.squeeze(diffs > t70).astype(np.float32))

    scores_grid, threshs_grid = ref_compute_dice_score(flat_d, flat_l, 10)
    i = int(np.argmax(scores_grid))
    out["recursiveBestDice"] = scores_grid[i]
    out["recursiveBestThreshold"] = threshs_grid[i]
    out["exactBestDice"], out["exactBestThreshold"] = exact_best_dice(
        flat_d, flat_l)

    if options.threshold is None:
        threshold = out["exactBestThreshold"]
    else:
        threshold = float(options.threshold)
        thr_p70 = (diffs > threshold).astype(np.float32)  # quirk :459-461
    thresholded = ref_filter_3d_connected_components(
        np.squeeze(diffs > threshold).astype(np.float32))

    out["DiceScore"] = ref_dice(thresholded, labels)
    per_dice, per_prec, per_rec = [], [], []
    tpcc = fpcc = fncc = 0
    start = 0
    for n_slices in spp:
        sl = slice(start, start + n_slices)
        per_dice.append(ref_dice(thresholded[sl], labels[sl]))
        per_prec.append(ref_precision(thresholded[sl], labels[sl]))
        per_rec.append(ref_recall(thresholded[sl], labels[sl]))
        t, f, n = ref_compute_detection_rate(
            np.squeeze(thr_p70[sl]), np.squeeze(labels[sl].astype(bool)))
        tpcc += t
        fpcc += f
        fncc += n
        start += n_slices
    out.update(DiceScorePerPatient=per_dice, PrecisionPerPatient=per_prec,
               RecallPerPatient=per_rec, TPCC=tpcc, FPCC=fpcc, FNCC=fncc)
    P = thresholded.astype(bool).ravel()
    G = labels.astype(bool).ravel()
    out["TP"] = int(np.sum(P & G))
    out["FP"] = int(np.sum(P & ~G))
    out["TN"] = int(np.sum(~P & ~G))
    out["FN"] = int(np.sum(~P & G))
    out["TPR"] = out["TP"] / (out["TP"] + out["FN"])
    out["FPR"] = out["FP"] / (out["FP"] + out["TN"])
    out["VD"] = ref_vd(thresholded, labels)
    if mc > 1:
        out["epistemic_variance"] = np.concatenate(epist_all)
    return out


# ---------------------------------------------------------------------------
# the parity tests


CASES = {
    "bestdice_prior_median": dict(
        threshold=None, applyHyperIntensityPrior=True, medianFiltering=True,
        keepOnlyPositiveResiduals=True, erosionIterations=12),
    "fixed_threshold": dict(
        threshold=0.05, applyHyperIntensityPrior=False, medianFiltering=True,
        keepOnlyPositiveResiduals=True, erosionIterations=3),
    "abs_residual_nomedian": dict(
        threshold=None, applyHyperIntensityPrior=False,
        medianFiltering=False, keepOnlyPositiveResiduals=False,
        erosionIterations=3),
}


def _run_both(case_opts, mc=0, truncate_last=False, seed=0):
    patients = make_patients(n=3, native=80, n_slices=14, seed=seed,
                             truncate_last=truncate_last)
    dataset = GoldenDataset(patients, slice_start=2, slice_end=12)
    cfg = Config(trainer="AE", model="autoencoder", batchsize=4,
                 outputWidth=64, outputHeight=64, compute_dtype="float32",
                 seed=seed)
    tmp = tempfile.mkdtemp()
    opts = Options(paths=PathConfig(sample_dir=tmp),
                   numMonteCarloSamples=mc, **case_opts)
    dev = evaluate(dataset, GoldenTrainer(), None, opts, cfg)
    host = golden_host_eval(patients, opts, (64, 64), seed)
    return dev, host


@pytest.mark.parametrize("case", [
    "bestdice_prior_median",  # full recipe: prior + median + 12-iter
    pytest.param("fixed_threshold", marks=pytest.mark.slow),
    pytest.param("abs_residual_nomedian", marks=pytest.mark.slow),
])
def test_golden_parity(case):
    dev, host = _run_both(CASES[case])

    # identical residual volumes and labelmaps (the _evaluate recipe)
    assert dev["labelmaps"].shape == host["labels"].shape
    np.testing.assert_array_equal(dev["labelmaps"] > 0.5, host["labels"])
    np.testing.assert_allclose(dev["diffs"], host["diffs"],
                               atol=2e-6, rtol=0)

    # curve metrics vs sklearn on the composed pipeline
    np.testing.assert_allclose(dev["diff_AUC"], host["diff_AUC"], rtol=2e-4)
    np.testing.assert_allclose(dev["diff_AUPRC"], host["diff_AUPRC"],
                               rtol=2e-4)

    # best-dice: exact global optimum, >= the reference's recursive grid
    np.testing.assert_allclose(dev["bestDiceScore"], host["exactBestDice"],
                               rtol=1e-5)
    assert dev["bestDiceScore"] >= host["recursiveBestDice"] - 1e-6
    np.testing.assert_allclose(dev["bestThreshold"],
                               host["exactBestThreshold"], rtol=1e-5)

    # thresholded + CC-filtered segmentation metrics
    np.testing.assert_allclose(dev["DiceScore"], host["DiceScore"],
                               rtol=1e-5)
    np.testing.assert_allclose(dev["DiceScorePerPatient"],
                               host["DiceScorePerPatient"], rtol=1e-5)
    np.testing.assert_allclose(dev["RecallPerPatient"],
                               host["RecallPerPatient"], rtol=1e-5)
    for d, h in zip(dev["PrecisionPerPatient"], host["PrecisionPerPatient"]):
        if np.isnan(h):
            assert np.isnan(d)
        else:
            np.testing.assert_allclose(d, h, rtol=1e-5)
    for k in ("TP", "FP", "TN", "FN"):
        assert dev[k] == host[k], k
    np.testing.assert_allclose(dev["TPR"], host["TPR"], rtol=1e-6)
    np.testing.assert_allclose(dev["FPR"], host["FPR"], rtol=1e-6)
    np.testing.assert_allclose(dev["VD"], host["VD"], rtol=1e-6)

    # lesion-detection operating point + counts
    if CASES[case]["threshold"] is None:
        np.testing.assert_allclose(dev["precision70Threshold"],
                                   host["precision70Threshold"], rtol=1e-5)
    for k in ("TPCC", "FPCC", "FNCC"):
        assert dev[k] == host[k], (k, dev[k], host[k])


@pytest.mark.slow
def test_golden_parity_mc_dropout():
    """MC path: masked samples, mean reconstruction, epistemic variance."""
    dev, host = _run_both(CASES["bestdice_prior_median"], mc=3)
    np.testing.assert_allclose(dev["diffs"], host["diffs"], atol=2e-6,
                               rtol=0)
    np.testing.assert_allclose(dev["epistemic_variance"],
                               host["epistemic_variance"], atol=1e-6)
    np.testing.assert_allclose(dev["diff_AUC"], host["diff_AUC"], rtol=2e-4)
    for k in ("TPCC", "FPCC", "FNCC", "TP", "FP", "TN", "FN"):
        assert dev[k] == host[k], k


@pytest.mark.slow
def test_golden_parity_shape_sanity_skip():
    """A truncated volume is skipped identically by both pipelines.
    (Fast-tier twin: test_round2_fixes.py::test_eval_skips_truncated_volume
    covers the device pipeline's skip behavior.)"""
    dev, host = _run_both(CASES["fixed_threshold"], truncate_last=True)
    assert len(dev["slices_per_patient"]) == 2
    assert len(host["slices_per_patient"]) == 2
    np.testing.assert_allclose(dev["diffs"], host["diffs"], atol=2e-6,
                               rtol=0)
    assert dev["DiceScore"] == pytest.approx(host["DiceScore"], rel=1e-5)


def test_precision70_threshold_sklearn023_fuzz():
    """Second-eyes pin (round-4 audit): the device sweep's precision-70
    operating threshold must reproduce the reference's EXACT recipe —
    `np.argmax(precisions <= 0.7)` over scikit-learn 0.23's truncated
    curve (`Evaluation.py:439`, `requirements.txt:13`) — across fuzzed
    tie-heavy score distributions.  (The installed sklearn 1.9 dropped the
    full-recall truncation and is NOT a valid oracle: on tie-heavy data
    its argmax answer differs in ~1/3 of these trials.)"""
    from unsupervised_anomaly_detection_brain_mri_tpu.ops import metrics as M

    rng = np.random.default_rng(42)
    tested = 0
    for _ in range(25):
        n = int(rng.integers(50, 1500))
        scores = np.round(rng.uniform(0, 1, n), int(rng.integers(1, 4)))
        labels = rng.uniform(0, 1, n) < rng.uniform(0.05, 0.5)
        if labels.sum() == 0:
            continue
        prec, _, thr = prc_sklearn_023(labels, scores)
        idx = int(np.argmax(prec <= 0.7))
        if idx >= len(thr):  # the reference would IndexError here
            continue
        tested += 1
        got = float(M.precision70_threshold(scores, labels))
        np.testing.assert_allclose(got, thr[idx], atol=1e-6)
    assert tested >= 15
