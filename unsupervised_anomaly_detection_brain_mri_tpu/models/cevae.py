"""Context-encoding variational autoencoders (ceVAE).

Parity: `models/context_encoder_variational_autoencoder.py:9-59` and
`models/context_encoder_variational_autoencoder_Zimmerer.py:7-45`.

Both run a *shared* encoder/bottleneck/decoder over two inputs: the clean
image ``x`` (variational branch, reparameterised) and the context-masked
image ``x_ce`` (deterministic branch decoded from its mean ``z_mu_ce``).
Output keys: ``z_mu``, ``z_mu_ce``, ``z_log_sigma``, ``z_sigma``, ``x_hat``,
``x_hat_ce``.
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
    conv_transpose,
    dense_init,
)

Array = jnp.ndarray


class ContextEncoderVAE(nn.Module):
    """Unified-backbone ceVAE (`models/context_encoder_variational_autoencoder.py`)."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 8
    dropout_rate: float = 0.1
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_ce: Optional[Array] = None,
        *,
        train: bool = False,
        dropout: bool = False,
    ) -> Dict[str, Array]:
        if x_ce is None:
            x_ce = x  # eval path feeds the unmasked image (trainers/CE.py:101-120)
        encoder = UnifiedEncoder(
            self.image_size, self.intermediate_resolution, dtype=self.dtype,
            name="encoder",
        )
        decoder = UnifiedDecoder(
            self.image_size, self.channels, self.intermediate_resolution,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype, name="decoder",
        )
        h = encoder(x, train=train)
        h_ce = encoder(x_ce, train=train)

        channels = h.shape[-1]
        squeeze = nn.Conv(channels // 8, (1, 1), padding="SAME",
                          kernel_init=conv_init, dtype=self.dtype,
                          name="intermediate_conv")
        expand = nn.Conv(channels, (1, 1), padding="SAME",
                         kernel_init=conv_init, dtype=self.dtype,
                         name="intermediate_conv_reverse")
        drop = nn.Dropout(self.dropout_rate)

        sq = squeeze(h)
        sq_ce = squeeze(h_ce)
        reshape = sq.shape[1:]
        flat = sq.reshape((sq.shape[0], -1))
        flat_ce = sq_ce.reshape((sq_ce.shape[0], -1))
        mu_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                            dtype=self.dtype, name="mu_layer")
        sigma_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                               dtype=self.dtype, name="sigma_layer")
        dec_dense = nn.Dense(math.prod(reshape), kernel_init=dense_init,
                             dtype=self.dtype, name="dec_dense")

        det = not dropout
        z_mu = drop(mu_layer(flat), deterministic=det).astype(jnp.float32)
        z_mu_ce = drop(mu_layer(flat_ce), deterministic=det).astype(jnp.float32)
        z_log_sigma = drop(sigma_layer(flat),
                           deterministic=det).astype(jnp.float32)
        z_sigma = jnp.exp(z_log_sigma)
        eps = jax.random.normal(self.make_rng("sample"), z_sigma.shape)
        z = z_mu + eps * z_sigma

        cdtype = self.dtype or z.dtype
        dec = drop(dec_dense(z.astype(cdtype)), deterministic=det)
        dec_ce = drop(dec_dense(z_mu_ce.astype(cdtype)), deterministic=det)
        hb = expand(dec.reshape((x.shape[0],) + tuple(reshape)))
        hb_ce = expand(dec_ce.reshape((x.shape[0],) + tuple(reshape)))

        return {
            "z_mu": z_mu,
            "z_mu_ce": z_mu_ce,
            "z_log_sigma": z_log_sigma,
            "z_sigma": z_sigma,
            "x_hat": decoder(hb, train=train),
            "x_hat_ce": decoder(hb_ce, train=train),
        }


def _leaky02(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class ContextEncoderVAEZimmerer(nn.Module):
    """Zimmerer-backbone ceVAE
    (`models/context_encoder_variational_autoencoder_Zimmerer.py:7-45`).
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
        self,
        x: Array,
        x_ce: Optional[Array] = None,
        *,
        train: bool = False,
        dropout: bool = False,
    ) -> Dict[str, Array]:
        if x_ce is None:
            x_ce = x
        convs = [
            nn.Conv(f, (4, 4), strides=(2, 2), padding="SAME",
                    kernel_init=conv_init, dtype=self.dtype,
                    name=f"enc_conv_{i + 1}")
            for i, f in enumerate((16, 64, 256, 1024))
        ]

        def encode(v: Array) -> Array:
            for c in convs:
                v = _leaky02(c(v))
            return v.reshape((v.shape[0], -1))

        flat, flat_ce = encode(x), encode(x_ce)
        mu_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                            dtype=self.dtype, name="mu_layer")
        sigma_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                               dtype=self.dtype, name="sigma_layer")
        z_mu = mu_layer(flat).astype(jnp.float32)
        z_mu_ce = mu_layer(flat_ce).astype(jnp.float32)
        z_log_sigma = sigma_layer(flat).astype(jnp.float32)
        z_sigma = jnp.exp(z_log_sigma)
        eps = jax.random.normal(self.make_rng("sample"), z_sigma.shape)
        z = z_mu + eps * z_sigma

        inter = self.image_size // 16
        dec_dense = nn.Dense(inter * inter * 1024, kernel_init=dense_init,
                             dtype=self.dtype, name="dec_dense")
        deconvs = [
            conv_transpose(f, (4, 4), (2, 2), self.fast_convt_grad,
                           self.dtype, name=f"dec_convT_{i + 1}")
            for i, f in enumerate((1024, 256, 64, 16))
        ]
        final = nn.Conv(self.channels, (4, 4), padding="SAME",
                        kernel_init=conv_init, dtype=self.dtype,
                        name="dec_conv_final")

        cdtype = self.dtype or z.dtype

        def decode(latent: Array) -> Array:
            v = dec_dense(latent.astype(cdtype))
            v = v.reshape((x.shape[0], inter, inter, 1024))
            for d in deconvs:
                v = _leaky02(d(v))
            return final(v).astype(jnp.float32)

        return {
            "z_mu": z_mu,
            "z_mu_ce": z_mu_ce,
            "z_log_sigma": z_log_sigma,
            "z_sigma": z_sigma,
            "x_hat": decode(z),
            "x_hat_ce": decode(z_mu_ce),
        }
