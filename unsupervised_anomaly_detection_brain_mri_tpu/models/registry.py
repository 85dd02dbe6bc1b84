"""Model registry: reference model names -> Flax modules + metadata.

The reference dynamically loaded `models/{name}.py` by filename
(`run.py:21-24`); here the same names map to module classes, plus the
metadata trainers/evaluation need to stay model-agnostic:

  * ``reconstruction_key`` — which output dict entry is the reconstruction
    (``x_hat`` for AEs, ``xz_mu`` for GMVAEs, ``x_enc`` for fAnoGAN, ``out``
    for AnoVAEGAN, matching each reference trainer's ``reconstruct``).
  * ``takes_prior_z`` — adversarial models whose forward pass consumes a
    prior latent sample (`models/adversarial_autoencoder.py:10`).
  * ``takes_context`` — ceVAE models with a second masked-image input.
  * ``rngs`` — which rng streams the module draws (dropout/sample/gp).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.models import (
    aae,
    ae,
    anovaegan,
    cevae,
    chen,
    fanogan,
    gmvae,
    vae,
)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    build: Callable[[Config, Any], Any]  # (config, dtype) -> nn.Module
    reconstruction_key: str = "x_hat"
    takes_prior_z: bool = False
    takes_context: bool = False
    rngs: Tuple[str, ...] = ("dropout",)


# Reverse-free ConvT kernel gradient (ops/convt.py), measured per decoder
# family on TPU v5e (round-4 campaign): the UnifiedDecoder 5x5 pyramid wins
# 1.08x end-to-end; the Zimmerer 4x4 high-channel stages measure 0.98x
# (both b=8 and b=64) and the Chen/Schlegl resnet up-blocks 0.99x — for
# those the correlation formulation lowers no better than XLA's
# reverse+conv, so they keep jax's built-in rule.  The wiring and parity
# tests remain for all families (construct the module with
# fast_convt_grad=True directly to re-measure).
_FAST_CONVT_GRAD_OFF = {
    "VariationalAutoencoderZimmerer",
    "ContextEncoderVAEZimmerer",
    "ConstrainedAAEChen",
    "FAnoGANSchlegl",
}


def _maybe_fast_convt(kwargs: Dict[str, Any], cls, config: Config) -> None:
    """Apply the measurement-gated fast-ConvT-gradient flag (shared by every
    builder so the gate semantics live in exactly one place)."""
    fields = getattr(cls, "__dataclass_fields__", {})
    if ("fast_convt_grad" in fields
            and getattr(config, "fastConvTGrad", False)
            and cls.__name__ not in _FAST_CONVT_GRAD_OFF):
        kwargs["fast_convt_grad"] = True


def _std(cls):
    def build(config: Config, dtype: Any):
        kwargs = dict(
            image_size=config.outputWidth,
            channels=config.numChannels,
            z_dim=config.zDim,
            intermediate_resolution=config.intermediateResolutions[0],
            dropout_rate=config.dropout_rate,
            dtype=dtype,
        )
        # opt-in non-parity perf paths, only for models that declare them
        fields = getattr(cls, "__dataclass_fields__", {})
        if ("space_to_depth_stem" in fields
                and getattr(config, "spaceToDepthStem", False)):
            kwargs["space_to_depth_stem"] = True
        if ("depth_to_space_head" in fields
                and getattr(config, "depthToSpaceHead", False)):
            kwargs["depth_to_space_head"] = True
        _maybe_fast_convt(kwargs, cls, config)
        return cls(**kwargs)

    return build


def _gmvae(cls):
    def build(config: Config, dtype: Any):
        kwargs = dict(
            image_size=config.outputWidth,
            channels=config.numChannels,
            intermediate_resolution=config.intermediateResolutions[0],
            dim_c=config.dim_c,
            dim_z=config.dim_z,
            dim_w=config.dim_w,
            dropout_rate=config.dropout_rate,
            dtype=dtype,
        )
        _maybe_fast_convt(kwargs, cls, config)
        return cls(**kwargs)

    return build


MODEL_REGISTRY: Dict[str, ModelSpec] = {
    "autoencoder": ModelSpec(_std(ae.Autoencoder)),
    "autoencoder_spatial": ModelSpec(_std(ae.AutoencoderSpatial)),
    "variational_autoencoder": ModelSpec(
        _std(vae.VariationalAutoencoder), rngs=("dropout", "sample")),
    "variational_autoencoder_Zimmerer": ModelSpec(
        _std(vae.VariationalAutoencoderZimmerer), rngs=("dropout", "sample")),
    "context_encoder_variational_autoencoder": ModelSpec(
        _std(cevae.ContextEncoderVAE), takes_context=True,
        rngs=("dropout", "sample")),
    "context_encoder_variational_autoencoder_Zimmerer": ModelSpec(
        _std(cevae.ContextEncoderVAEZimmerer), takes_context=True,
        rngs=("dropout", "sample")),
    "gaussian_mixture_variational_autoencoder": ModelSpec(
        _gmvae(gmvae.GMVAE), reconstruction_key="xz_mu",
        rngs=("dropout", "sample")),
    "gaussian_mixture_variational_autoencoder_spatial": ModelSpec(
        _gmvae(gmvae.GMVAESpatial), reconstruction_key="xz_mu",
        rngs=("dropout", "sample")),
    "gaussian_mixture_variational_autoencoder_You": ModelSpec(
        _gmvae(gmvae.GMVAEYou), reconstruction_key="xz_mu",
        rngs=("dropout", "sample")),
    "adversarial_autoencoder": ModelSpec(
        _std(aae.AdversarialAutoencoder), takes_prior_z=True,
        rngs=("dropout", "gp")),
    "constrained_autoencoder": ModelSpec(_std(aae.ConstrainedAutoencoder)),
    "constrained_adversarial_autoencoder": ModelSpec(
        _std(aae.ConstrainedAAE), takes_prior_z=True, rngs=("dropout", "gp")),
    "constrained_adversarial_autoencoder_Chen": ModelSpec(
        _std(chen.ConstrainedAAEChen), takes_prior_z=True,
        rngs=("dropout", "gp")),
    "fanogan": ModelSpec(
        _std(fanogan.FAnoGAN), reconstruction_key="x_enc", takes_prior_z=True,
        rngs=("dropout", "gp")),
    "fanogan_schlegl": ModelSpec(
        _std(fanogan.FAnoGANSchlegl), reconstruction_key="x_enc",
        takes_prior_z=True, rngs=("dropout", "gp")),
    "anovaegan": ModelSpec(
        _std(anovaegan.AnoVAEGAN), reconstruction_key="out",
        rngs=("dropout", "sample", "gp")),
}


def get_model(config: Config, dtype: Any = None) -> Tuple[Any, ModelSpec]:
    """Build the Flax module named by ``config.model``."""
    if config.model not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {config.model!r}; known: {sorted(MODEL_REGISTRY)}")
    spec = MODEL_REGISTRY[config.model]
    return spec.build(config, dtype), spec
