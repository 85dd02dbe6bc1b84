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
import jax.numpy as jnp
import numpy as np

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config, Options
from unsupervised_anomaly_detection_brain_mri_tpu.data.preprocess import (
    normalize_volume,
)
from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
    _erode_and_postprocess,
    _zoom_volume,
)
from unsupervised_anomaly_detection_brain_mri_tpu.ops import postprocess as P
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


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

    @classmethod
    def from_workdir(cls, workdir: str, threshold: Optional[float] = None,
                     options: Optional[Options] = None) -> "AnomalyDetector":
        """Restore from a training workdir (config.json + orbax ckpt/)."""
        with open(os.path.join(workdir, "config.json")) as f:
            config = Config.from_json(f.read())
        trainer = get_trainer(config.trainer)(
            config, options, workdir=workdir)
        template = trainer.init_state()
        restored = trainer.load_checkpoint(template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {workdir}")
        state, _ = restored
        return cls(trainer, state, config, options, threshold)

    def detect(self, volume: np.ndarray,
               brainmask: Optional[np.ndarray] = None,
               threshold: Optional[float] = None) -> Dict[str, Any]:
        """volume: (H, W, S) raw intensities, axial slices on the last axis.

        Returns per-slice anomaly scores plus the post-processed anomaly map
        and (if a threshold is configured) the CC-filtered binary mask, all
        at the model resolution.
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

        rec_dev = getattr(self.trainer, "reconstruct_device", None)
        if rec_dev is not None:
            rec = rec_dev(
                self.state, jnp.asarray(x[..., None]))["reconstruction"]
        else:  # duck-typed trainer with only the numpy reconstruct contract
            rec = jnp.asarray(self.trainer.reconstruct(
                self.state, x[..., None])["reconstruction"])
        rec = rec[..., 0]
        # erosion + residual pipeline exactly like the evaluation pipeline,
        # as ONE device dispatch
        diff = _erode_and_postprocess(x, rec, skm, prior_q, o)

        diff_np = np.asarray(diff)
        result: Dict[str, Any] = {
            "anomaly_map": diff_np,
            "reconstruction": np.asarray(rec),
            "scores": diff_np.reshape(diff_np.shape[0], -1).max(axis=1),
        }
        t = threshold if threshold is not None else self.threshold
        if t is not None:
            mask = P.filter_small_components(
                diff > float(t), o.minLesionSize)
            result["mask"] = np.asarray(mask)
            result["anomalous_voxels"] = int(result["mask"].sum())
        return result
