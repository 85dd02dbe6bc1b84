"""Variational autoencoders.

Parity: `models/variational_autoencoder.py:9-47` (unified backbone, dense
mu/sigma heads, reparameterised latent) and
`models/variational_autoencoder_Zimmerer.py:6-32` (fixed 16/64/256/1024
4-stage conv backbone, k=4, leaky_relu alpha=0.2, no normalisation).

Output keys: ``z_mu``, ``z_log_sigma``, ``z_sigma``, ``x_hat``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    UnifiedDecoder,
    UnifiedEncoder,
    conv_init,
    conv_transpose,
    dense_init,
)

Array = jnp.ndarray


class VAEBottleneck(nn.Module):
    """Shared dense variational bottleneck.

    1x1 conv squeeze to C/8, Dense mu / Dense log-sigma heads (dropout on
    both), reparameterise, Dense back up, 1x1 conv expand
    (`models/variational_autoencoder.py:20-38`).  Exposes ``encode`` /
    ``decode`` separately so the context-encoding VAE can run its
    deterministic branch through the same weights
    (`models/context_encoder_variational_autoencoder.py:23-44`).
    """

    z_dim: int
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h: Array, *, dropout: bool, rng_collection: str = "sample"
                 ) -> Tuple[Dict[str, Array], Array]:
        channels = h.shape[-1]
        squeeze = nn.Conv(channels // 8, (1, 1), padding="SAME",
                          kernel_init=conv_init, dtype=self.dtype,
                          name="intermediate_conv")
        expand = nn.Conv(channels, (1, 1), padding="SAME",
                         kernel_init=conv_init, dtype=self.dtype,
                         name="intermediate_conv_reverse")
        drop = nn.Dropout(self.dropout_rate)

        squeezed = squeeze(h)
        reshape = squeezed.shape[1:]
        flat = squeezed.reshape((squeezed.shape[0], -1))
        mu_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                            dtype=self.dtype, name="mu_layer")
        sigma_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                               dtype=self.dtype, name="sigma_layer")
        dec_dense = nn.Dense(math.prod(reshape), kernel_init=dense_init,
                             dtype=self.dtype, name="dec_dense")

        det = not dropout
        z_mu = drop(mu_layer(flat), deterministic=det).astype(jnp.float32)
        z_log_sigma = drop(sigma_layer(flat), deterministic=det).astype(jnp.float32)
        z_sigma = jnp.exp(z_log_sigma)
        eps = jax.random.normal(self.make_rng(rng_collection), z_sigma.shape)
        z = z_mu + eps * z_sigma
        dec = drop(dec_dense(z.astype(self.dtype or z.dtype)), deterministic=det)
        out = expand(dec.reshape((h.shape[0],) + tuple(reshape)))
        outputs = {"z_mu": z_mu, "z_log_sigma": z_log_sigma, "z_sigma": z_sigma}
        return outputs, out


class VariationalAutoencoder(nn.Module):
    """Unified-backbone VAE (`models/variational_autoencoder.py:9-47`)."""

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
            space_to_depth_stem=self.space_to_depth_stem, dtype=self.dtype
        )
        self.bottleneck = VAEBottleneck(self.z_dim, self.dropout_rate, self.dtype)
        self.decoder = UnifiedDecoder(
            self.image_size, self.channels, self.intermediate_resolution,
            depth_to_space_head=self.depth_to_space_head,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype,
        )

    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        h = self.encoder(x, train=train)
        outputs, h = self.bottleneck(h, dropout=dropout)
        outputs["x_hat"] = self.decoder(h, train=train)
        return outputs


def _leaky02(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)  # tf.nn.leaky_relu default


class VariationalAutoencoderZimmerer(nn.Module):
    """Zimmerer backbone VAE (`models/variational_autoencoder_Zimmerer.py`).

    Four k=4 s=2 convs with 16/64/256/1024 filters and leaky_relu(0.2), no
    normalisation; dense mu/sigma; mirrored k=4 transposed convs; final k=4
    s=1 conv to 1 channel.
    """

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 8
    dropout_rate: float = 0.1
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        outputs: Dict[str, Array] = {}
        h = x
        for i, filters in enumerate((16, 64, 256, 1024)):
            h = _leaky02(
                nn.Conv(filters, (4, 4), strides=(2, 2), padding="SAME",
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f"enc_conv_{i + 1}")(h)
            )
        inter = self.image_size // 16  # 4 stride-2 stages
        flat = h.reshape((h.shape[0], -1))
        z_mu = nn.Dense(self.z_dim, kernel_init=dense_init, dtype=self.dtype,
                        name="mu_layer")(flat).astype(jnp.float32)
        z_log_sigma = nn.Dense(self.z_dim, kernel_init=dense_init,
                               dtype=self.dtype, name="sigma_layer")(flat
                               ).astype(jnp.float32)
        z_sigma = jnp.exp(z_log_sigma)
        eps = jax.random.normal(self.make_rng("sample"), z_sigma.shape)
        z = z_mu + eps * z_sigma
        h = nn.Dense(inter * inter * 1024, kernel_init=dense_init,
                     dtype=self.dtype, name="dec_dense")(
            z.astype(self.dtype or z.dtype))
        h = h.reshape((x.shape[0], inter, inter, 1024))
        for i, filters in enumerate((1024, 256, 64, 16)):
            h = _leaky02(
                conv_transpose(filters, (4, 4), (2, 2),
                               self.fast_convt_grad, self.dtype,
                               name=f"dec_convT_{i + 1}")(h)
            )
        x_hat = nn.Conv(self.channels, (4, 4), padding="SAME",
                        kernel_init=conv_init, dtype=self.dtype,
                        name="dec_conv_final")(h).astype(jnp.float32)
        outputs.update(
            z_mu=z_mu, z_log_sigma=z_log_sigma, z_sigma=z_sigma, x_hat=x_hat
        )
        return outputs
