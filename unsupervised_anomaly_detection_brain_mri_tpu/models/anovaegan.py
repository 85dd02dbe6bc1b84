"""AnoVAEGAN: VAE encoder/decoder with a WGAN-GP image critic.

Parity: `models/anovaegan.py:10-80` — unified VAE encoder (dense mu/sigma
heads), generator = unified decoder with spatial LayerNorm (use_batchnorm=
False) and identity output, critic = unified encoder (LayerNorm) with a
per-position Dense(1) head and image-space interpolates for the gradient
penalty.

Output keys: ``z_mu``, ``z_log_sigma``, ``z_sigma``, ``out``,
``d_fake_features``, ``d_``, ``d_features``, ``d``, ``x_hat``,
``d_hat_features``, ``d_hat``.  NOTE: in this model the reference uses
``out`` for the reconstruction and ``x_hat`` for the GP interpolate.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    UnifiedDecoder,
    UnifiedEncoder,
    conv_init,
    dense_init,
)

Array = jnp.ndarray


class AnoVAEGAN(nn.Module):
    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 8
    dropout_rate: float = 0.1
    space_to_depth_stem: bool = False
    depth_to_space_head: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        self.encoder = UnifiedEncoder(
            self.image_size, self.intermediate_resolution,
            space_to_depth_stem=self.space_to_depth_stem, dtype=self.dtype,
            name="encoder")
        n = int(math.log2(self.image_size)
                - math.log2(self.intermediate_resolution))
        channels = int(min(128, 32 * (2 ** (n - 1))))
        self.intermediate_conv = nn.Conv(
            channels // 8, (1, 1), padding="SAME", kernel_init=conv_init,
            dtype=self.dtype, name="intermediate_conv")
        self.intermediate_conv_reverse = nn.Conv(
            channels, (1, 1), padding="SAME", kernel_init=conv_init,
            dtype=self.dtype, name="intermediate_conv_reverse")
        self.mu_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                                 dtype=self.dtype, name="mu_layer")
        self.sigma_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                                    dtype=self.dtype, name="sigma_layer")
        feat = self.intermediate_resolution
        self.dec_dense = nn.Dense(feat * feat * (channels // 8),
                                  kernel_init=dense_init, dtype=self.dtype,
                                  name="dec_dense")
        self.drop = nn.Dropout(self.dropout_rate)
        self.generator = UnifiedDecoder(
            self.image_size, self.channels, self.intermediate_resolution,
            use_batchnorm=False,
            depth_to_space_head=self.depth_to_space_head,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype, name="generator")
        self.disc_features = UnifiedEncoder(
            self.image_size, self.intermediate_resolution,
            use_batchnorm=False,
            space_to_depth_stem=self.space_to_depth_stem,
            dtype=self.dtype, name="disc_features")
        self.disc_dense = nn.Dense(1, kernel_init=dense_init,
                                   dtype=self.dtype, name="disc_dense")

    def generate(self, z: Array, *, train: bool = False,
                 dropout: bool = False) -> Array:
        feat = self.intermediate_resolution
        # reference quirk: dec_dense dropout has no training flag -> inactive
        dec = self.dec_dense(z.astype(self.dtype or z.dtype))
        h = dec.reshape((z.shape[0], feat, feat, -1))
        h = self.intermediate_conv_reverse(h)
        return self.generator(h, train=train)

    def discriminate(self, x: Array, *, train: bool = False):
        feats = self.disc_features(x, train=train)
        return feats.astype(jnp.float32), self.disc_dense(
            feats).astype(jnp.float32)

    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        h = self.encoder(x, train=train)
        sq = self.intermediate_conv(h)
        flat = sq.reshape((sq.shape[0], -1))
        det = not dropout
        z_mu = self.drop(self.mu_layer(flat), deterministic=det).astype(jnp.float32)
        z_log_sigma = self.drop(self.sigma_layer(flat),
                                deterministic=det).astype(jnp.float32)
        z_sigma = jnp.exp(z_log_sigma)
        eps = jax.random.normal(self.make_rng("sample"), z_sigma.shape)
        z_vae = z_mu + eps * z_sigma
        rec = self.generate(z_vae, train=train, dropout=dropout)

        out.update(z_mu=z_mu, z_log_sigma=z_log_sigma, z_sigma=z_sigma, out=rec)
        out["d_fake_features"], out["d_"] = self.discriminate(rec, train=train)
        out["d_features"], out["d"] = self.discriminate(x, train=train)
        alpha = jax.random.uniform(self.make_rng("gp"), (x.shape[0], 1, 1, 1))
        x_hat = x + alpha * (rec - x)
        out["x_hat_gp"] = out["x_hat"] = x_hat
        out["d_hat_features"], out["d_hat"] = self.discriminate(
            x_hat, train=train)
        return out
