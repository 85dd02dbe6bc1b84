"""Volume-wise evaluation driver.

Parity map (all citations into `/root/reference/utils/Evaluation.py`):
  * `_evaluate` (:183-365) — per-patient volume reload, slice resize (scipy
    zoom, preserving the reference's eval-path resize semantics vs the cv2
    train path), MC-dropout sampling, residual post-processing, 3-D median
    filter; here the whole volume is ONE device batch and the entire
    residual pipeline is jitted.
  * `evaluate` (:372-526) — ROC/PRC/DICE-curve metrics on flattened voxels,
    threshold selection ('bestdice' or numeric), 26-connected component
    filtering, global + per-patient Dice/Precision/Recall, lesion detection
    counts at the precision-70 operating point, evalPC.npy/txt export.
  * `determine_threshold_on_labeled_patients` (:529-567) — VAL-split
    threshold fitting for threshold-transfer evaluation.

Known reference bug NOT reproduced: `eval_pc['FPR']` was computed with
`Metrics.tpr` (:489); we report the true FPR.
"""

from __future__ import annotations

import json
import os
import time
import warnings
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config, Options
from unsupervised_anomaly_detection_brain_mri_tpu.ops import metrics as M
from unsupervised_anomaly_detection_brain_mri_tpu.ops import postprocess as P
from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
    json_sanitize,
)


def _zoom_volume(vol: np.ndarray, target: Tuple[int, int],
                 seg: bool = False) -> np.ndarray:
    """Per-slice scipy zoom, parity with the eval path (:228-232).

    vol: (H, W, S) -> (S, target_h, target_w); images use default spline
    order, segmentations keep the reference's (order-3, boundary 'nearest')
    call then binarize downstream.
    """
    H, W, S = vol.shape
    if (H, W) == tuple(target):
        return np.transpose(vol, (2, 0, 1)).astype(np.float32)
    zoom = (target[0] / H, target[1] / W)
    out = np.zeros((S, target[0], target[1]), np.float32)
    for s in range(S):
        if seg:
            out[s] = ndi.zoom(vol[:, :, s], zoom, mode="nearest")
        else:
            out[s] = ndi.zoom(vol[:, :, s], zoom)
    return out


def _reconstruct_volume(trainer, state, x: np.ndarray, options: Options,
                        rng: jax.Array, eroded: jnp.ndarray
                        ) -> Dict[str, Any]:
    """Reconstruct all slices of one volume, with optional MC dropout.

    x: (S, H, W, 1) host array; eroded: (S, H, W) eroded-brainmask on
    DEVICE.  All outputs stay on device — the eval driver never round-trips
    per-patient volumes through the host (the reference crossed the
    host<->device boundary per slice, `Evaluation.py:246-250`).  Parity
    (:246-272): every MC reconstruction is MASKED by the eroded brainmask
    BEFORE uncertainty combination, the exported mean reconstruction is the
    mean of the masked samples, and ``log_var`` model outputs (aleatoric
    heads) feed the combined predictive variance — passed through raw
    exactly as the reference does (``log_var=False`` at :265).
    """
    mc = int(options.numMonteCarloSamples or 0)
    xd = jnp.asarray(x)
    # device-returning fast path; duck-typed trainers exposing only the
    # numpy `reconstruct` contract (e.g. external models) still work
    rec_dev = getattr(trainer, "reconstruct_device", None)
    if rec_dev is None:
        def rec_dev(state, _xd, dropout=False, rng=None):
            return {k: jnp.asarray(v) for k, v in trainer.reconstruct(
                state, x, dropout=dropout, rng=rng).items()
                if k in ("reconstruction", "log_var")}
    if mc > 1:
        mask = eroded[..., None].astype(jnp.float32)
        recs, log_vars = [], []
        raw_last = None
        for i in range(mc):
            r = rec_dev(state, xd, dropout=True,
                        rng=jax.random.fold_in(rng, i))
            raw_last = jnp.asarray(r["reconstruction"])
            recs.append(raw_last * mask)
            if "log_var" in r:
                log_vars.append(jnp.asarray(r["log_var"]))
        recs = jnp.stack(recs, axis=0)
        sigmas = (jnp.stack(log_vars, axis=0) if log_vars
                  else jnp.zeros_like(recs))
        rec = recs.mean(axis=0)
        epistemic = M.combined_predictive_uncertainty(
            recs, jnp.zeros_like(recs), axis=0)
        combined = M.combined_predictive_uncertainty(
            recs, sigmas, axis=0) * mask
        log_var_mean = sigmas.mean(axis=0) if log_vars else None
    else:
        r = rec_dev(state, xd, dropout=False, rng=rng)
        rec = raw_last = jnp.asarray(r["reconstruction"])
        epistemic = combined = None
        log_var_mean = (jnp.asarray(r["log_var"])
                        if "log_var" in r else None)
    # exported l1/l2 errors come from the last (UNMASKED) sample — the
    # reference records results['l1err'] of its final reconstruct() call
    # (`Evaluation.py:277-280`), not an error against the masked MC mean;
    # masking would charge every eroded rim voxel its full |x|
    l1 = jnp.sum(jnp.abs(xd - raw_last), axis=(1, 2, 3))
    l2 = jnp.sum(jnp.sqrt((xd - raw_last) ** 2), axis=(1, 2, 3))
    return {"reconstruction": rec, "epistemic": epistemic,
            "combined": combined, "log_var": log_var_mean,
            "l1": l1, "l2": l2}


def _reconstruct_volume_group(trainer, state, x_group, options: Options,
                              rngs, erodeds) -> List[Dict[str, Any]]:
    """Batched `_reconstruct_volume` for iterative-restoration trainers.

    K prepared volumes are zero-padded to a common slice count, stacked to
    (K, S, H, W, 1), and driven through the trainer's vmapped restoration
    loop in ONE device dispatch (per MC sample) — the 150-step loop
    (`trainers/VAE_You.py:125-147`) then does K volumes of work per step
    instead of idling the chip on one small batch.  Semantics match
    per-volume calls exactly: each volume keeps its own rng stream, both
    restoration objectives decompose per-sample (so zero-padded batch
    mates never influence real slices), every MC sample is masked by
    its volume's eroded brainmask before uncertainty combination
    (`Evaluation.py:246-272`), and padded slices are cropped before return.
    """
    K = len(x_group)
    S_max = max(int(x.shape[0]) for x in x_group)
    tail = x_group[0].shape[1:]
    vols = np.zeros((K, S_max) + tail, np.float32)
    for k, x in enumerate(x_group):
        vols[k, : x.shape[0]] = x
    vols_d = jnp.asarray(vols)
    rngs_d = jnp.stack(list(rngs))
    mc = int(options.numMonteCarloSamples or 0)
    if mc > 1:
        mask = np.zeros((K, S_max) + tail, np.float32)
        for k, er in enumerate(erodeds):
            mask[k, : er.shape[0]] = np.asarray(er, np.float32)[..., None]
        mask = jnp.asarray(mask)
        recs = []
        raw_last = None
        for i in range(mc):
            ri = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(rngs_d)
            r = trainer.reconstruct_volumes_device(
                state, vols_d, dropout=True, rngs=ri)
            raw_last = jnp.asarray(r["reconstruction"])
            recs.append(raw_last * mask)
        recs = jnp.stack(recs, axis=0)  # (mc, K, S, H, W, 1)
        rec = recs.mean(axis=0)
        epistemic = M.combined_predictive_uncertainty(
            recs, jnp.zeros_like(recs), axis=0)
        # restoration trainers carry no aleatoric log_var, so combined
        # collapses to the epistemic variance (masked) — one reduction
        combined = epistemic * mask
    else:
        r = trainer.reconstruct_volumes_device(
            state, vols_d, dropout=False, rngs=rngs_d)
        rec = raw_last = jnp.asarray(r["reconstruction"])
        epistemic = combined = None
    # l1/l2 from the last UNMASKED sample, matching `_reconstruct_volume`
    # and the reference (`Evaluation.py:277-280`)
    l1 = jnp.sum(jnp.abs(vols_d - raw_last), axis=(2, 3, 4))  # (K, S_max)
    l2 = jnp.sum(jnp.sqrt((vols_d - raw_last) ** 2), axis=(2, 3, 4))
    out = []
    for k, x in enumerate(x_group):
        S = int(x.shape[0])
        out.append({
            "reconstruction": rec[k, :S],
            "epistemic": epistemic[k, :S] if epistemic is not None else None,
            "combined": combined[k, :S] if combined is not None else None,
            "log_var": None,
            "l1": l1[k, :S], "l2": l2[k, :S],
        })
    return out


def _erode_jit(erosion_iters: int):
    @jax.jit
    def fn(skullmap, erode):
        return jnp.where(
            erode, P.binary_erosion_2d(skullmap, erosion_iters),
            skullmap.astype(bool))

    return fn


def _postprocess_jit(want_raw: bool):
    """Jitted residual pipeline: residual -> eroded brainmask -> prior ->
    median filter (:282-312).  With ``want_raw`` the pre-median residual is
    emitted too (it feeds the `_diff.png` artifacts, `Evaluation.py:305`);
    compiled as a separate variant so the metrics-only path pays nothing."""

    @jax.jit
    def fn(x, rec, eroded, prior_q, keep_pos, use_prior, use_median):
        diff = jnp.where(keep_pos, jnp.maximum(x - rec, 0.0),
                         jnp.abs(x - rec))
        diff = diff * eroded.astype(diff.dtype)
        diff = jnp.where(use_prior & (x < prior_q), 0.0, diff)
        from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_median import (
            median_filter_3d_auto,
        )

        filtered = median_filter_3d_auto(diff, 5)
        out = jnp.where(use_median, filtered, diff)
        return (out, diff) if want_raw else out

    return fn


_POSTPROCESS_CACHE: Dict[Tuple, Any] = {}


def _eroded_mask(skullmap, options: Options) -> jnp.ndarray:
    """Eroded brainmask (12 binary-erosion iterations at 128x128,
    `Evaluation.py:84-89`); erosion iterations are compile-time."""
    key = ("erode", int(options.erosionIterations))
    if key not in _POSTPROCESS_CACHE:
        _POSTPROCESS_CACHE[key] = _erode_jit(int(options.erosionIterations))
    return _POSTPROCESS_CACHE[key](
        jnp.asarray(skullmap), jnp.bool_(options.erodeBrainmask))


def _erode_postprocess_jit(erosion_iters: int, keep_pos: bool,
                           want_raw: bool):
    """ONE dispatch for erosion + residual post-processing (non-MC path —
    when MC masking needs the eroded mask separately, `_eroded_mask` +
    `_postprocess` run as two).

    A fully-fused Pallas kernel (residual+mask+prior+median in one HBM
    pass) was built, proven bit-exact, and DELETED: the bisection median
    dominates the cost, so fusing the elementwise prologue measured
    1.00-1.02x at every cohort scale (448/1550/3875 slices, TPU v5e).
    The Pallas win lives in `median_filter_3d_auto` (3.8x vs XLA)."""

    @jax.jit
    def fn(x, rec, skm, prior_q, erode, use_prior, use_median):
        eroded = jnp.where(
            erode, P.binary_erosion_2d(skm, erosion_iters),
            skm.astype(bool))
        diff = (jnp.maximum(x - rec, 0.0) if keep_pos
                else jnp.abs(x - rec))
        diff = diff * eroded.astype(diff.dtype)
        diff = jnp.where(use_prior & (x < prior_q), 0.0, diff)
        from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_median import (
            median_filter_3d_auto,
        )

        filtered = median_filter_3d_auto(diff, 5)
        out = jnp.where(use_median, filtered, diff)
        return (out, diff) if want_raw else out

    return fn


def _erode_and_postprocess(x, rec, skm, prior_q, options: Options,
                           want_raw: bool = False):
    """Erosion + residual pipeline fused into one jitted dispatch."""
    key = ("erode_pp", int(options.erosionIterations),
           bool(options.keepOnlyPositiveResiduals), want_raw)
    if key not in _POSTPROCESS_CACHE:
        _POSTPROCESS_CACHE[key] = _erode_postprocess_jit(
            int(options.erosionIterations),
            bool(options.keepOnlyPositiveResiduals), want_raw)
    return _POSTPROCESS_CACHE[key](
        jnp.asarray(x), jnp.asarray(rec), jnp.asarray(skm),
        jnp.float32(prior_q), jnp.bool_(options.erodeBrainmask),
        jnp.bool_(options.applyHyperIntensityPrior),
        jnp.bool_(options.medianFiltering))


def _postprocess(x, rec, eroded, prior_q, options: Options,
                 want_raw: bool = False):
    key = ("pipeline", want_raw)
    if key not in _POSTPROCESS_CACHE:
        _POSTPROCESS_CACHE[key] = _postprocess_jit(want_raw)
    return _POSTPROCESS_CACHE[key](
        jnp.asarray(x), jnp.asarray(rec), jnp.asarray(eroded),
        jnp.float32(prior_q),
        jnp.bool_(options.keepOnlyPositiveResiduals),
        jnp.bool_(options.applyHyperIntensityPrior),
        jnp.bool_(options.medianFiltering))


def export_residual_volume(path: str, diff_sub: np.ndarray,
                           geometry: Dict[str, Any],
                           threshold: Optional[float] = None) -> np.ndarray:
    """Write a residual subvolume back into its source scan's geometry.

    Parity with `utils/Evaluation.py:323-334` + `utils/NII.py:107-109`:
    the model-resolution residual stack (S, h, w) is de-zoomed to the
    native slice resolution, placed into a zeroed full-extent volume at
    ``geometry['slice_range']`` along the iteration axis, and written with
    the source pixdim/affine so it overlays on the original scan.  When
    ``threshold`` is given, the binary twin ``<path minus .nii.gz>
    .binary.nii.gz`` is written too (thresholded at native resolution,
    matching the reference's post-de-zoom threshold).  Returns the native
    full-extent float volume.
    """
    shape = tuple(geometry["shape"])
    axis = int(geometry["axis_index"])
    s0, s1 = geometry["slice_range"]
    # native shape seen axial-last (the eval frame): iteration axis moved
    # to the end, matching data/base.py::load_volume_and_groundtruth
    dims = list(shape)
    dims.append(dims.pop(axis))
    eval_shape = tuple(dims)
    h, w = eval_shape[:2]
    S, th, tw = diff_sub.shape
    if (th, tw) != (h, w):
        # reference de-zoom: scipy zoom by the reciprocal slice factors
        # (`Evaluation.py:323-325`); factors chosen so the output is
        # exactly the native slice shape
        diff_sub = ndi.zoom(diff_sub, (1.0, h / th, w / tw))
        assert diff_sub.shape == (S, h, w), diff_sub.shape
    full = np.zeros(eval_shape, np.float32)
    full[:, :, s0:s0 + S] = np.transpose(diff_sub, (1, 2, 0))
    native = np.moveaxis(full, 2, axis)
    from unsupervised_anomaly_detection_brain_mri_tpu.data.formats import (
        write_nifti,
    )

    write_nifti(path, native, pixdim=tuple(geometry.get(
        "pixdim", (1.0, 1.0, 1.0))), affine=geometry.get("affine"))
    if threshold is not None:
        base = path[:-7] if path.endswith(".nii.gz") else os.path.splitext(
            path)[0]
        write_nifti(base + ".binary.nii.gz",
                    (native > threshold).astype(np.float32),
                    pixdim=tuple(geometry.get("pixdim", (1.0, 1.0, 1.0))),
                    affine=geometry.get("affine"))
    return native


def _evaluate(dataset, trainer, state, sample_dir: str, options: Options,
              config: Config, split: str = "TEST") -> Tuple[Dict, List]:
    """Per-patient reconstruction + residual post-processing (:183-365)."""
    os.makedirs(sample_dir, exist_ok=True)
    patients = dataset.patients_of(split)
    print(f"Testing {len(patients)} patients...")

    xs, recs, diffs, labelmaps, geoms = [], [], [], [], []
    l1s, l2s, times, epistemics, combineds = [], [], [], [], []
    raw_diffs, log_vars, slice_names = [], [], []
    target = (config.outputHeight, config.outputWidth)
    rng = jax.random.key(config.seed + 7)
    slice_span = (getattr(dataset.options, "sliceEnd", 0)
                  - getattr(dataset.options, "sliceStart", 0))
    skipped: set = set()

    # ---- streaming prepare -> reconstruct -> accumulate, one restoration
    # group at a time.  Iterative-restoration trainers (VAE_You/GMVAE)
    # restore `restorationVolumeBatch` patients per vmapped dispatch;
    # everything else streams per volume.  Device residency (eroded MC
    # masks, reconstructions, MC variance maps) is bounded by ONE group
    # regardless of cohort size — only the residual maps accumulate
    # on device (their consumers are the on-device curve/CC stages).
    mc = int(options.numMonteCarloSamples or 0)
    group_size = max(1, int(getattr(options, "restorationVolumeBatch", 1)))
    batched = (group_size > 1 and len(patients) > 1 and getattr(
        trainer, "batched_volume_restoration", lambda: False)())
    if not batched:
        group_size = 1

    def _prepare(p, patient):
        vol, gt, brainmask, skullmap = dataset.load_volume_and_groundtruth(
            patient)
        # shape sanity: skip badly-coregistered volumes (:207-209)
        if slice_span > 0 and min(vol.shape) < slice_span:
            print(f"Skipping patient {patient.get('name', p)}: shape "
                  f"{vol.shape} smaller than slice range {slice_span}")
            skipped.add(p)
            return None
        # falsy sliceStart/sliceEnd mean "full volume depth", exactly like
        # the reference's truthiness guards (`Evaluation.py:216-222`) — a
        # literal sliceEnd=0 must not produce 0-slice volumes
        s0 = getattr(dataset.options, "sliceStart", 0) or 0
        se = getattr(dataset.options, "sliceEnd", 0)
        s1 = min(se, vol.shape[2]) if se else vol.shape[2]
        x = _zoom_volume(vol[:, :, s0:s1], target)  # (S, H, W)
        seg = _zoom_volume(gt[:, :, s0:s1], target, seg=True)
        skm = _zoom_volume(skullmap[:, :, s0:s1], target, seg=True)
        seg = (seg > 0.5).astype(np.float32)
        skm = (skm > 0.5).astype(np.float32)
        # native geometry for residual re-export; datasets without file
        # provenance (e.g. synthetic) fall back to the axial-last frame
        geo = dict(getattr(dataset, "last_geometry", None)
                   or {"shape": vol.shape, "axis_index": 2,
                       "pixdim": (1.0, 1.0, 1.0), "affine": None})
        geo["slice_range"] = (s0, s1)
        return {
            "p": p, "x": x, "seg": seg, "skm": skm, "geo": geo,
            "s0": s0, "s1": s1,
            "prior_q": float(np.quantile(vol, 0.9)),
            # the standalone eroded mask is only needed to mask MC samples;
            # otherwise erosion folds into the postprocess dispatch
            "eroded": _eroded_mask(skm, options) if mc > 1 else None,
        }

    def _reconstruct_group(grp):
        if batched and len(grp) > 1:
            t0 = time.time()
            res_g = _reconstruct_volume_group(
                trainer, state, [it["x"][..., None] for it in grp], options,
                [jax.random.fold_in(rng, it["p"]) for it in grp],
                [it["eroded"] for it in grp])
            jax.block_until_ready(res_g[-1]["reconstruction"])
            per_slice = (time.time() - t0) / max(
                sum(len(it["x"]) for it in grp), 1)
            return res_g, [per_slice] * len(grp)
        res_g, per_slice = [], []
        for it in grp:
            t0 = time.time()
            res = _reconstruct_volume(trainer, state, it["x"][..., None],
                                      options,
                                      jax.random.fold_in(rng, it["p"]),
                                      it["eroded"])
            jax.block_until_ready(res["reconstruction"])  # honest timing
            per_slice.append((time.time() - t0) / max(len(it["x"]), 1))
            res_g.append(res)
        return res_g, per_slice

    def _accumulate(it, res):
        x, seg, skm = it["x"], it["seg"], it["skm"]
        s0, s1, prior_q, eroded = it["s0"], it["s1"], it["prior_q"], \
            it["eroded"]
        rec = res["reconstruction"][..., 0]

        want_raw = bool(options.exportPNGs)
        if mc > 1:
            out = _postprocess(x, rec, eroded, prior_q, options,
                               want_raw=want_raw)
        else:
            out = _erode_and_postprocess(x, rec, skm, prior_q, options,
                                         want_raw=want_raw)
        diff, raw = out if want_raw else (out, None)
        if options.exportPNGs:
            # pre-median residuals + per-MC-mean log-variance maps feed the
            # `_diff.png` / `_logvar.png` artifacts (:302-309); host copies
            # only when PNGs are requested
            raw_diffs.append(np.asarray(raw))
            if res["log_var"] is not None:
                log_vars.append(np.asarray(res["log_var"][..., 0]))
            # artifact names use the patient's index in the FULL split
            # enumeration — the reference's `p` counts skipped volumes too
            # (`Evaluation.py:195,207-209`), so filenames stay comparable
            # side-by-side even when a volume fails the shape sanity check
            slice_names.extend(f"{it['p']}_{s}" for s in range(s0, s1))

        # residuals accumulate on DEVICE (every downstream curve/CC/metric
        # consumer is on-device; ONE host copy is made where artifacts need
        # it).  Reconstructions and MC variance maps are only ever consumed
        # host-side (PNG/histogram artifacts), so they accumulate on host —
        # this also bounds HBM pinning to one volume set for big cohorts.
        xs.append(x)
        recs.append(np.asarray(rec))
        diffs.append(diff)
        labelmaps.append(seg)
        geoms.append(it["geo"])
        l1s.append(res["l1"])
        l2s.append(res["l2"])
        if res["epistemic"] is not None:
            epistemics.append(np.asarray(res["epistemic"][..., 0]))
            combineds.append(np.asarray(res["combined"][..., 0]))

    pending: List[Dict[str, Any]] = []

    def _flush():
        res_g, per_slice = _reconstruct_group(pending)
        times.extend(per_slice)
        for it, res in zip(pending, res_g):
            _accumulate(it, res)
        pending.clear()

    for p, patient in enumerate(patients):
        it = _prepare(p, patient)
        if it is None:
            continue
        pending.append(it)
        if len(pending) >= group_size:
            _flush()
    if pending:
        _flush()

    l1_np = (np.asarray(jnp.concatenate(l1s)) if l1s
             else np.zeros((0,), np.float32))
    l2_np = (np.asarray(jnp.concatenate(l2s)) if l2s
             else np.zeros((0,), np.float32))
    eval_dict = {
        "x": np.concatenate(xs) if xs else np.zeros((0,) + target),
        "reconstructions": np.concatenate(recs) if recs else None,
        "diffs": jnp.concatenate(diffs) if diffs else None,
        "labelmaps": np.concatenate(labelmaps) if labelmaps else None,
        "slices_per_patient": [len(x) for x in xs],
        "geometries": geoms,
        "l1reconstructionErrors": l1_np.tolist(),
        "l2reconstructionErrors": l2_np.tolist(),
        "l1reconstructionErrorMean": float(l1_np.mean()) if l1s else 0.0,
        "l1reconstructionErrorVariance": float(l1_np.var()) if l1s else 0.0,
        "l2reconstructionErrorMean": float(l2_np.mean()) if l2s else 0.0,
        "l2reconstructionErrorVariance": float(l2_np.var()) if l2s else 0.0,
        "reconstructionTimes": float(np.mean(times)) if times else 0.0,
        "TPCC": 0, "FPCC": 0, "FNCC": 0,
    }
    if epistemics:
        eval_dict["epistemic_variance"] = np.concatenate(epistemics)
        # combined aleatoric+epistemic variance (x_recs_var, :265-270)
        eval_dict["combined_variance"] = np.concatenate(combineds)
    if raw_diffs:
        eval_dict["raw_diffs"] = np.concatenate(raw_diffs)
        eval_dict["slice_names"] = slice_names
    if log_vars:
        eval_dict["log_vars"] = np.concatenate(log_vars)
    kept = [pt for p, pt in enumerate(patients) if p not in skipped]
    return eval_dict, kept


def evaluate(dataset, trainer, state, options: Options, config: Config,
             epoch: Any = "last", description: Optional[str] = None
             ) -> Dict[str, Any]:
    """Full TEST evaluation (:372-526).  Returns the eval dict and writes
    evalPC.npy / evalPC.txt / curve artifacts under the eval dir."""
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import artifacts

    ts = time.strftime("%Y%m%d-%H%M%S")
    eval_dir = os.path.join(
        options.paths.sample_dir, config.model,
        config.model_dir(str(getattr(dataset, "name", "ds"))),
        f"eval-{epoch}-{ts}" + (f"-{description}" if description else ""))
    sample_dir = os.path.join(eval_dir, "samples_test_PC")
    os.makedirs(sample_dir, exist_ok=True)

    eval_pc, patients = _evaluate(dataset, trainer, state, sample_dir,
                                  options, config, split="TEST")
    if eval_pc["diffs"] is None:
        raise ValueError(
            "evaluate(): no evaluable patients — every volume was skipped "
            "by the shape-sanity check (volume min dim < sliceEnd - "
            "sliceStart). Check the --slices/-s/-e range against the "
            "volume shapes.")
    diffs = eval_pc["diffs"]  # device-resident
    labels = jnp.asarray(eval_pc["labelmaps"])
    flat_scores = diffs.ravel()
    flat_labels = labels.ravel() > 0.5

    # ONE bulk device->host copy of the residuals (histogram artifacts and
    # the reference's host-side exports need host data; everything metric-
    # shaped stays on device)
    diffs_np = np.asarray(diffs)
    eval_pc["diffs"] = diffs_np

    # per-class residual histograms (:398-412)
    histogram_range = (0.01, 0.075)
    hist, _ = np.histogram(diffs_np, bins=50, range=histogram_range)
    eval_pc["diffHistogram"] = hist
    artifacts.plot_histogram_with_labels(
        diffs_np, eval_pc["labelmaps"], "auto", histogram_range,
        "Histogram of difference images in the lesion testing dataset",
        export_pdf=os.path.join(
            eval_dir, "testing_lesions_diffimages_histogram.pdf"))
    if "epistemic_variance" in eval_pc:
        ev = eval_pc["epistemic_variance"]
        pos = ev[ev >= 0]
        if pos.size:
            p998 = float(np.percentile(pos, 99.8))
            # kept in evalPC.npy, matching the reference (:407-409)
            eval_pc["uncertaintyHistogram"], _ = np.histogram(
                ev, bins=50, range=(1e-5, max(p998, 2e-5)))
            artifacts.plot_histogram_with_labels(
                ev, eval_pc["labelmaps"], 50, (1e-5, max(p998, 2e-5)),
                "Histogram of epistemic variances",
                export_pdf=os.path.join(
                    eval_dir,
                    "testing_lesions_epistemic_variances_histogram.pdf"))

    # ROC / PRC / best-dice — one jitted sorted sweep (:414-451)
    t0 = time.time()
    if "curve_summary" not in _POSTPROCESS_CACHE:
        _POSTPROCESS_CACHE["curve_summary"] = jax.jit(M.anomaly_curve_summary)
    summary = _POSTPROCESS_CACHE["curve_summary"](flat_scores, flat_labels)
    summary = jax.tree_util.tree_map(np.asarray, summary)
    eval_pc["bestDiceScore"] = float(summary["best_dice"])
    eval_pc["bestThreshold"] = float(summary["best_threshold"])
    prc = summary["prc"]
    if options.computeROC:
        eval_pc["diff_AUC"] = float(summary["auc"])
        roc = summary["roc"]
        np.save(os.path.join(eval_dir, "rocPC.npy"), roc,
                allow_pickle=True)
        artifacts.plot_roc(roc, eval_pc["diff_AUC"],
                           os.path.join(eval_dir, "rocPC.png"))
    if options.computePRC:
        eval_pc["diff_AUPRC"] = float(summary["ap"])
        np.save(os.path.join(eval_dir, "prcPC.npy"), dict(prc),
                allow_pickle=True)
        artifacts.plot_prc(prc, eval_pc["diff_AUPRC"],
                           os.path.join(eval_dir, "prcPC.png"))
    artifacts.plot_dice_curve(
        summary["dice_curve"], eval_pc["bestDiceScore"],
        eval_pc["bestThreshold"], os.path.join(eval_dir, "dicePC.png"))
    print(f"Curves done in {time.time() - t0:.2f}s "
          f"(AUC={eval_pc.get('diff_AUC', float('nan')):.4f} "
          f"AUPRC={eval_pc.get('diff_AUPRC', float('nan')):.4f} "
          f"bestDice={eval_pc['bestDiceScore']:.4f} @ "
          f"{eval_pc['bestThreshold']:.5f})")

    # threshold selection + CC filtering (:453-458)
    threshold = (eval_pc["bestThreshold"] if options.threshold is None
                 else float(options.threshold))
    eval_pc["thresholdType"] = (
        "bestdice" if options.threshold is None else options.threshold)
    thresholded, cc_conv = P.filter_small_components(
        diffs > threshold, options.minLesionSize, return_converged=True)

    # precision-70 operating point for detection counts (:425-440).
    # Reference quirk preserved (:459-461): with a NUMERIC threshold the
    # detection counts reuse the fixed-threshold volume, UNFILTERED (the
    # reassignment happens before the CC filter is applied).
    if options.threshold is not None:
        thresholded_p70 = diffs > threshold
    elif options.computePRC:
        t70 = float(summary["precision70_threshold"])
        eval_pc["precision70Threshold"] = t70
        thresholded_p70, conv70 = P.filter_small_components(
            diffs > t70, options.minLesionSize, return_converged=True)
        cc_conv = cc_conv & conv70
    else:
        thresholded_p70 = thresholded

    # global + per-patient metrics (:461-491): ONE segmented-confusion
    # dispatch for every dice/precision/recall/TPR/FPR/VD value (the
    # reference looped 3 metric evaluations per patient); lesion-detection
    # chunks are batched across ALL patients into one vmapped dispatch
    n_pat = len(eval_pc["slices_per_patient"])
    owners_np = np.repeat(np.arange(max(n_pat, 1), dtype=np.int32),
                          eval_pc["slices_per_patient"])
    if "seg_stats" not in _POSTPROCESS_CACHE:
        _POSTPROCESS_CACHE["seg_stats"] = jax.jit(
            M.segmented_confusion_stats, static_argnames=("n_patients",))
    stats = _POSTPROCESS_CACHE["seg_stats"](
        thresholded, labels, jnp.asarray(owners_np), n_patients=max(n_pat, 1))
    stats = jax.tree_util.tree_map(
        lambda v: np.asarray(v).astype(np.float64), stats)  # one fetch
    with np.errstate(divide="ignore", invalid="ignore"):
        per_dice = (2.0 * stats["per_tp"]
                    / (stats["per_p"] + stats["per_g"]))[:n_pat].tolist()
        per_prec = (stats["per_tp"] / stats["per_p"])[:n_pat].tolist()
        per_rec = (stats["per_tp"] / stats["per_g"])[:n_pat].tolist()
    pred_chunks, gt_chunks = [], []
    start = 0
    for n_slices in eval_pc["slices_per_patient"]:
        sl = slice(start, start + n_slices)
        pred_chunks.append(P.volume_to_chunks(thresholded_p70[sl]))
        gt_chunks.append(P.volume_to_chunks(
            (labels[sl] > 0.5).astype(jnp.float32)))
        start += n_slices
    tpcc = fpcc = fncc = 0
    if pred_chunks:
        t, f, n, conv_d = P.detection_counts_batch(
            jnp.concatenate(pred_chunks), jnp.concatenate(gt_chunks))
        cc_conv = cc_conv & jnp.all(conv_d)
        tpcc, fpcc, fncc = (int(v) for v in np.asarray(
            jnp.stack([jnp.sum(t), jnp.sum(f), jnp.sum(n)])))
    # ONE scalar fetch at a point that already syncs: surface the honest
    # CC failure mode (iteration cap hit -> partially-merged labels could
    # drop lesion fragments / inflate detection counts) instead of
    # leaving it silent
    eval_pc["ccConverged"] = bool(cc_conv)
    if not eval_pc["ccConverged"]:
        warnings.warn(
            "connected-component labeling hit its iteration cap before "
            "the fixpoint; CC-filtered masks and detection counts may "
            "treat one snake-shaped component as several", RuntimeWarning)
    # NaN entries (0/0: an empty prediction makes precision NaN; a patient
    # with no GT lesion in the slice range makes recall AND dice NaN) are
    # excluded from every aggregate — one such patient must not turn the
    # whole run's mean/std into NaN
    _finite_dice = [v for v in per_dice if np.isfinite(v)]
    _finite_prec = [p for p in per_prec if np.isfinite(p)]
    _finite_rec = [r for r in per_rec if np.isfinite(r)]
    eval_pc.update(
        DiceScorePerPatient=per_dice,
        DiceScorePerPatientMean=(float(np.mean(_finite_dice))
                                 if _finite_dice else 0.0),
        DiceScorePerPatientStd=(float(np.std(_finite_dice))
                                if _finite_dice else 0.0),
        PrecisionPerPatient=per_prec,
        PrecisionPerPatientMean=(float(np.mean(_finite_prec))
                                 if _finite_prec else 0.0),
        PrecisionPerPatientStd=(float(np.std(_finite_prec))
                                if _finite_prec else 0.0),
        RecallPerPatient=per_rec,
        RecallPerPatientMean=(float(np.mean(_finite_rec))
                              if _finite_rec else 0.0),
        RecallPerPatientStd=(float(np.std(_finite_rec))
                             if _finite_rec else 0.0),
        TPCC=tpcc, FPCC=fpcc, FNCC=fncc,
    )
    tp, fp = int(stats["TP"]), int(stats["FP"])
    tn, fn = int(stats["TN"]), int(stats["FN"])
    eval_pc.update(TP=tp, FP=fp, TN=tn, FN=fn)
    with np.errstate(divide="ignore", invalid="ignore"):
        eval_pc["DiceScore"] = float(
            np.float64(2 * tp) / (2 * tp + fp + fn))
        eval_pc["TPR"] = float(np.float64(tp) / (tp + fn))
        eval_pc["FPR"] = float(np.float64(fp) / (fp + tn))
        eval_pc["VD"] = float(np.float64(fn) / (tp + fn))
    eval_pc["TPRCC"] = tpcc / (tpcc + fncc) if (tpcc + fncc) > 0 else 0.0
    eval_pc["PrecisionCC"] = tpcc / (tpcc + fpcc) if (tpcc + fpcc) > 0 else 0.0

    if options.exportPNGs:
        # the variance heatmap PNGs use the COMBINED predictive variance
        # (x_recs_var, `Evaluation.py:308-309`), not the epistemic-only map
        artifacts.export_slice_images(
            sample_dir, eval_pc["x"], eval_pc["reconstructions"],
            diffs_np, eval_pc["labelmaps"],
            np.asarray(thresholded),
            epistemic=eval_pc.get("combined_variance",
                                  eval_pc.get("epistemic_variance")),
            raw_diffs=eval_pc.get("raw_diffs"),
            log_vars=eval_pc.get("log_vars"),
            names=eval_pc.get("slice_names"))

    if options.exportVolumes:
        # residual-volume NIfTI export (+ binary at the operating point)
        # in the SOURCE scan's geometry, parity with `Evaluation.py:323-334`
        start = 0
        for n_slices, patient, geo in zip(eval_pc["slices_per_patient"],
                                          patients,
                                          eval_pc["geometries"]):
            name = patient.get("name", f"patient{start}")
            export_residual_volume(
                os.path.join(sample_dir, f"{name}.nii.gz"),
                diffs_np[start:start + n_slices], geo,
                threshold=float(threshold))
            start += n_slices

    # evalPC export (:519-526)
    export = {k: v for k, v in eval_pc.items()
              if k not in ("x", "diffs", "labelmaps", "reconstructions",
                           "geometries", "l1reconstructionErrors",
                           "l2reconstructionErrors", "epistemic_variance",
                           "combined_variance", "raw_diffs", "log_vars",
                           "slice_names", "diffHistogram")}
    np.save(os.path.join(eval_dir, "evalPC.npy"), export)  # type: ignore
    with open(os.path.join(eval_dir, "evalPC.txt"), "w") as f:
        f.write(str(export))
    with open(os.path.join(eval_dir, "evalPC.json"), "w") as f:
        json.dump(json_sanitize({k: v for k, v in export.items()
                                 if isinstance(v, (int, float, str, list))}),
                  f, indent=2)
    eval_pc["eval_dir"] = eval_dir
    return eval_pc


def determine_threshold_on_labeled_patients(
    datasets, trainer, state, options: Options, config: Config,
    epoch: Any = "last", description: Optional[str] = None
) -> Tuple[float, float]:
    """Fit (bestDice, bestThreshold) on VAL splits (:529-567)."""
    if not isinstance(datasets, list):
        datasets = [datasets]
    all_diffs, all_labels = [], []
    ts = time.strftime("%Y%m%d-%H%M%S")
    eval_dir = os.path.join(
        options.paths.sample_dir, config.model,
        config.model_dir("val"), f"eval-{epoch}-{ts}")
    sample_dir = os.path.join(eval_dir, "samples_val_PC")
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import artifacts

    for ds_idx, ds in enumerate(datasets):
        # one artifact dir per dataset: _evaluate's per-slice names restart
        # per call, so two VAL datasets writing into ONE dir would silently
        # overwrite each other's PNGs
        ds_sample_dir = (sample_dir if len(datasets) == 1 else os.path.join(
            sample_dir, f"ds{ds_idx}_{type(ds).__name__}"))
        ed, _ = _evaluate(ds, trainer, state, ds_sample_dir, options, config,
                          split="VAL")
        if ed["diffs"] is not None and len(ed["diffs"]):
            all_diffs.append(ed["diffs"])  # device-resident
            all_labels.append(ed["labelmaps"])
            if options.exportPNGs:
                # the reference's threshold-fitting pass dumps the same
                # per-slice PNG artifacts as the TEST pass
                # (`Evaluation.py:529-567` -> `:302-321`)
                d_np = np.asarray(ed["diffs"])
                ep = ed.get("combined_variance",
                            ed.get("epistemic_variance"))
                artifacts.export_slice_images(
                    ds_sample_dir, ed["x"],
                    np.asarray(ed["reconstructions"]),
                    d_np, ed["labelmaps"], np.zeros_like(d_np),
                    epistemic=np.asarray(ep) if ep is not None else None,
                    raw_diffs=ed.get("raw_diffs"),
                    log_vars=ed.get("log_vars"),
                    names=ed.get("slice_names"))
    if not all_diffs:
        raise ValueError(
            "threshold fitting found no evaluable VAL volumes in any "
            "dataset — every VAL split is empty or every volume was "
            "skipped by the shape-sanity check (slice range "
            f"[{options.sliceStart}, {options.sliceEnd}) vs volume "
            "extents); check the dataset partitions and slice options")
    diffs = jnp.concatenate(all_diffs)
    labels = jnp.asarray(np.concatenate(all_labels)) > 0.5
    best_dice, best_thresh = M.best_dice_threshold(
        diffs.ravel(), labels.ravel())
    return float(best_dice), float(best_thresh)
