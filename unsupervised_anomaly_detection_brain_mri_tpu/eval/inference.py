"""Serving API: load a trained run and detect anomalies in new volumes.

No reference equivalent (the reference stopped at offline evaluation); this
is the deployment layer: restore a (config, checkpoint) pair from a workdir
and run volume -> anomaly-map -> binary-mask inference with the same
on-device post-processing as the evaluation pipeline.

Usage:
    det = AnomalyDetector.from_workdir("checkpoints/autoencoder/AE_...")
    result = det.detect(volume)            # (H, W, S) raw volume
    result["anomaly_map"], result["mask"], result["scores"]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config, Options
from unsupervised_anomaly_detection_brain_mri_tpu.data.preprocess import (
    normalize_volume,
)
from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
    _erode_and_postprocess,
    _eroded_mask,
    _postprocess,
    _reconstruct_volume,
    _zoom_volume,
)
from unsupervised_anomaly_detection_brain_mri_tpu.ops import postprocess as P
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


CALIBRATION_FILE = "calibration.json"

# eval knobs that define the calibrated operating point — the threshold is
# only meaningful under the same post-processing it was fitted with
_CALIB_OPTION_KEYS = (
    "applyHyperIntensityPrior", "medianFiltering", "erodeBrainmask",
    "erosionIterations", "minLesionSize", "keepOnlyPositiveResiduals",
    "numMonteCarloSamples", "normalizationMethod", "upperpercentile",
)


def save_calibration(workdir: str, threshold: float, best_dice: float,
                     options: Options, dataset: str,
                     epoch: Any = None) -> str:
    """Persist the calibrated operating point of a threshold-transfer run.

    The reference's transfer protocol (`run.py:85-100`) fits the threshold
    on a labeled VAL split and then uses it immediately — the fitted value
    dies with the process.  Here it is written to
    ``<workdir>/calibration.json`` together with the eval options it was
    fitted under, so `AnomalyDetector.from_workdir` can serve at the
    calibrated operating point with no manual re-entry.
    """
    payload = {
        "threshold": float(threshold),
        "bestDiceVAL": float(best_dice),
        "dataset": str(dataset),
        "epoch": epoch if isinstance(epoch, (int, str)) else str(epoch),
        "options": {k: getattr(options, k) for k in _CALIB_OPTION_KEYS},
    }
    path = os.path.join(workdir, CALIBRATION_FILE)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def load_calibration(workdir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(workdir, CALIBRATION_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class AnomalyDetector:
    """A trained model + threshold, packaged for inference."""

    def __init__(self, trainer, state, config: Config,
                 options: Optional[Options] = None,
                 threshold: Optional[float] = None):
        self.trainer = trainer
        self.state = state
        self.config = config
        self.options = options or Options()
        self.threshold = threshold
        self.calibration: Optional[Dict[str, Any]] = None

    @classmethod
    def from_workdir(cls, workdir: str, threshold: Optional[float] = None,
                     options: Optional[Options] = None) -> "AnomalyDetector":
        """Restore from a training workdir (config.json + orbax ckpt/).

        If the workdir holds a ``calibration.json`` (written by the CLI's
        threshold-transfer workflow), the fitted threshold and the eval
        options it was calibrated under are applied automatically;
        explicitly passed ``threshold``/``options`` still win.
        """
        with open(os.path.join(workdir, "config.json")) as f:
            config = Config.from_json(f.read())
        calibration = load_calibration(workdir)
        if calibration is not None:
            if threshold is None:
                threshold = float(calibration["threshold"])
            if options is None:
                options = Options().replace(**{
                    k: v for k, v in calibration.get("options", {}).items()
                    if k in _CALIB_OPTION_KEYS})
        trainer = get_trainer(config.trainer)(
            config, options, workdir=workdir)
        template = trainer.init_state()
        restored = trainer.load_checkpoint(template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {workdir}")
        state, _ = restored
        det = cls(trainer, state, config, options, threshold)
        det.calibration = calibration
        return det

    def detect(self, volume: np.ndarray,
               brainmask: Optional[np.ndarray] = None,
               threshold: Optional[float] = None,
               rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """volume: (H, W, S) raw intensities, axial slices on the last axis.

        Returns per-slice anomaly scores plus the post-processed anomaly map
        and (if a threshold is configured) the CC-filtered binary mask, all
        at the model resolution.  The calibrated eval options are honored
        end-to-end: when ``numMonteCarloSamples > 1`` was part of the
        operating point, detection runs the same MC-dropout sampling and
        masked-mean residual pipeline the threshold was fitted under (and
        reports ``epistemic_variance`` / ``combined_variance``).
        """
        c = self.config
        o = self.options
        vol = normalize_volume(volume, method=o.normalizationMethod,
                               upper_percentile=o.upperpercentile)
        x = _zoom_volume(vol, (c.outputHeight, c.outputWidth))  # (S, H, W)
        if brainmask is not None:
            skm = (_zoom_volume(brainmask.astype(np.float32),
                                (c.outputHeight, c.outputWidth),
                                seg=True) > 0.5).astype(np.float32)
        else:
            skm = (x > 0.05).astype(np.float32)
        prior_q = float(np.quantile(vol, 0.9))

        # same reconstruction + residual pipeline as the eval driver
        # (_evaluate): MC sampling and the standalone eroded mask engage
        # exactly when the calibrated options say so
        mc = int(o.numMonteCarloSamples or 0)
        eroded = _eroded_mask(skm, o) if mc > 1 else None
        res = _reconstruct_volume(
            self.trainer, self.state, x[..., None], o,
            rng if rng is not None else jax.random.PRNGKey(0), eroded)
        rec = res["reconstruction"][..., 0]
        if mc > 1:
            diff = _postprocess(x, rec, eroded, prior_q, o)
        else:
            diff = _erode_and_postprocess(x, rec, skm, prior_q, o)

        diff_np = np.asarray(diff)
        result: Dict[str, Any] = {
            "anomaly_map": diff_np,
            "reconstruction": np.asarray(rec),
            "scores": diff_np.reshape(diff_np.shape[0], -1).max(axis=1),
        }
        if res["epistemic"] is not None:
            result["epistemic_variance"] = np.asarray(
                res["epistemic"][..., 0])
            result["combined_variance"] = np.asarray(
                res["combined"][..., 0])
        t = threshold if threshold is not None else self.threshold
        if t is not None:
            mask, cc_conv = P.filter_small_components(
                diff > float(t), o.minLesionSize, return_converged=True)
            result["mask"] = np.asarray(mask)
            result["anomalous_voxels"] = int(result["mask"].sum())
            result["cc_converged"] = bool(cc_conv)
        return result
