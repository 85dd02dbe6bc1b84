"""Constrained adversarial autoencoder, Chen et al. ResNet variant.

Parity: `models/constrained_adversarial_autoencoder_Chen.py:11-162` — ResNet
encoder/decoder (dim=64, spatial LayerNorm, AvgPool shortcuts), 400-200-1
latent MLP critic, and the *scalar* epsilon interpolate
``z_hat = eps*z + (1-eps)*z_`` (`:109-110`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    MLPDiscriminator,
    dense_init,
)
from unsupervised_anomaly_detection_brain_mri_tpu.models.resnet import (
    ResNetDecoder,
    ResNetEncoder,
)

Array = jnp.ndarray


class ConstrainedAAEChen(nn.Module):
    """Chen ResNet constrained AAE."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 16  # unused (fixed /8 backbone); API parity
    dropout_rate: float = 0.1
    dim: int = 64
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        self.encoder = ResNetEncoder(self.dim, dtype=self.dtype, name="encoder")
        self.enc_dense = nn.Dense(self.z_dim, kernel_init=dense_init,
                                  dtype=self.dtype, name="enc_dense")
        feat = self.image_size // 8
        self.dec_dense = nn.Dense(feat * feat * 8 * self.dim,
                                  kernel_init=dense_init, dtype=self.dtype,
                                  name="dec_dense")
        self.decoder = ResNetDecoder(self.dim, self.channels,
                                     fast_convt_grad=self.fast_convt_grad,
                                     dtype=self.dtype, name="decoder")
        self.discriminator = MLPDiscriminator((400, 200), dtype=self.dtype,
                                              name="discriminator")

    def encode(self, x: Array, *, train: bool = False,
               dropout: bool = False) -> Array:
        h = self.encoder(x)
        flat = h.reshape((h.shape[0], -1))
        return self.enc_dense(flat).astype(jnp.float32)

    def decode(self, z: Array, *, train: bool = False,
               dropout: bool = False) -> Array:
        feat = self.image_size // 8
        h = self.dec_dense(z.astype(self.dtype or z.dtype))
        h = h.reshape((z.shape[0], feat, feat, 8 * self.dim))
        return self.decoder(h)

    def discriminate(self, z: Array) -> Array:
        return self.discriminator(z.astype(self.dtype or z.dtype))

    def __call__(
        self,
        x: Array,
        z: Optional[Array] = None,
        *,
        train: bool = False,
        dropout: bool = False,
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        z_ = self.encode(x, train=train, dropout=dropout)
        out["z_"] = out["z"] = z_
        x_hat = self.decode(z_, train=train, dropout=dropout)
        out["x_hat"] = x_hat
        out["z_rec"] = self.encode(x_hat, train=train, dropout=dropout)
        if z is not None:
            out["d_"] = self.discriminate(z_)
            out["d"] = self.discriminate(z)
            eps = jax.random.uniform(self.make_rng("gp"), ())
            z_hat = eps * z + (1.0 - eps) * z_
            out["z_hat"] = z_hat
            out["d_hat"] = self.discriminate(z_hat)
        return out
