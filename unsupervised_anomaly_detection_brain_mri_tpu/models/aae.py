"""Adversarial and constrained autoencoders (latent-space WGAN-GP family).

Parity: `models/adversarial_autoencoder.py:10-72` (AAE: unified AE + 50-50-1
latent MLP discriminator), `models/constrained_autoencoder.py:9-48`
(re-encodes the reconstruction through the shared encoder), and
`models/constrained_adversarial_autoencoder.py:10-79` (both, 100-50-1 disc).

Output keys follow the reference: ``z_`` (encoded latent), ``x_hat``,
``z_rec`` (constrained variants), ``d``/``d_``/``d_hat`` (critic outputs on
real prior sample / encoded latent / interpolate), ``z_hat``.

The WGAN-GP interpolate matches the reference direction quirk
``z_hat = z + eps * (z - z_)`` (`adversarial_autoencoder.py:64-65`), with
per-sample eps ~ U[0,1).  The gradient-penalty gradient itself is computed in
the trainer with ``jax.grad`` of the ``discriminate`` method.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    MLPDiscriminator,
    UnifiedDecoder,
    UnifiedEncoder,
    conv_init,
    dense_init,
)

Array = jnp.ndarray


class _AAECore(nn.Module):
    """Shared encoder/bottleneck/decoder + latent critic wiring."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 16
    dropout_rate: float = 0.1
    disc_hidden: Sequence[int] = (50, 50)
    constrained: bool = False
    # Chen-style scalar epsilon interpolate (z_hat = eps*z + (1-eps)*z_)
    scalar_eps: bool = False
    with_discriminator: bool = True
    space_to_depth_stem: bool = False
    depth_to_space_head: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        self.encoder = UnifiedEncoder(
            self.image_size, self.intermediate_resolution,
            space_to_depth_stem=self.space_to_depth_stem, dtype=self.dtype,
            name="encoder")
        self.decoder = UnifiedDecoder(
            self.image_size, self.channels, self.intermediate_resolution,
            depth_to_space_head=self.depth_to_space_head,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype, name="decoder")
        # channel count after the unified encoder
        n = int(math.log2(self.image_size)
                - math.log2(self.intermediate_resolution))
        channels = int(min(128, 32 * (2 ** (n - 1))))
        self.intermediate_conv = nn.Conv(
            channels // 8, (1, 1), padding="SAME", kernel_init=conv_init,
            dtype=self.dtype, name="intermediate_conv")
        self.intermediate_conv_reverse = nn.Conv(
            channels, (1, 1), padding="SAME", kernel_init=conv_init,
            dtype=self.dtype, name="intermediate_conv_reverse")
        self.z_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                                dtype=self.dtype, name="z_layer")
        feat = self.intermediate_resolution
        self.dec_dense = nn.Dense(feat * feat * (channels // 8),
                                  kernel_init=dense_init, dtype=self.dtype,
                                  name="dec_dense")
        self.drop = nn.Dropout(self.dropout_rate)
        if self.with_discriminator:
            self.discriminator = MLPDiscriminator(tuple(self.disc_hidden),
                                                  dtype=self.dtype,
                                                  name="discriminator")

    def encode(self, x: Array, *, train: bool = False,
               dropout: bool = False) -> Array:
        h = self.encoder(x, train=train)
        sq = self.intermediate_conv(h)
        flat = sq.reshape((sq.shape[0], -1))
        z = self.drop(self.z_layer(flat), deterministic=not dropout)
        return z.astype(jnp.float32)

    def decode(self, z: Array, *, train: bool = False,
               dropout: bool = False) -> Array:
        feat = self.intermediate_resolution
        dec = self.drop(self.dec_dense(z.astype(self.dtype or z.dtype)),
                        deterministic=not dropout)
        h = dec.reshape((z.shape[0], feat, feat, -1))
        h = self.intermediate_conv_reverse(h)
        return self.decoder(h, train=train)

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
        # Constrained-ADVERSARIAL reference quirk: its decoder-dense and
        # z_rec dropout calls lack the training flag and never fire
        # (`models/constrained_adversarial_autoencoder.py:36,49`).  The
        # plain AAE (`adversarial_autoencoder.py:30-31`) and the
        # non-adversarial constrained AE (`constrained_autoencoder.py:
        # 30,46`) pass the flag on every call.
        quirk = self.constrained and self.with_discriminator
        x_hat = self.decode(z_, train=train, dropout=dropout and not quirk)
        out["x_hat"] = x_hat
        if self.constrained:
            out["z_rec"] = self.encode(x_hat, train=train,
                                       dropout=dropout and not quirk)
        if z is not None:
            out["d_"] = self.discriminate(z_)
            out["d"] = self.discriminate(z)
            if self.scalar_eps:
                eps = jax.random.uniform(self.make_rng("gp"), ())
                z_hat = eps * z + (1.0 - eps) * z_
            else:
                eps = jax.random.uniform(self.make_rng("gp"), (z.shape[0], 1))
                z_hat = z + eps * (z - z_)
            out["z_hat"] = z_hat
            out["d_hat"] = self.discriminate(z_hat)
        return out


class AdversarialAutoencoder(_AAECore):
    """AAE (`models/adversarial_autoencoder.py:10-72`)."""

    constrained: bool = False
    disc_hidden: Sequence[int] = (50, 50)


class ConstrainedAAE(_AAECore):
    """Constrained AAE (`models/constrained_adversarial_autoencoder.py`)."""

    constrained: bool = True
    disc_hidden: Sequence[int] = (100, 50)


class ConstrainedAutoencoder(nn.Module):
    """Constrained AE (`models/constrained_autoencoder.py:9-48`): dense AE
    whose reconstruction is re-encoded through the shared encoder."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 1024
    intermediate_resolution: int = 16
    dropout_rate: float = 0.1
    space_to_depth_stem: bool = False
    depth_to_space_head: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        self.core = _AAECore(
            image_size=self.image_size, channels=self.channels,
            z_dim=self.z_dim,
            intermediate_resolution=self.intermediate_resolution,
            dropout_rate=self.dropout_rate, constrained=True,
            with_discriminator=False,
            space_to_depth_stem=self.space_to_depth_stem,
            depth_to_space_head=self.depth_to_space_head,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype, name="core")

    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        out = self.core(x, None, train=train, dropout=dropout)
        return {"z": out["z_"], "x_hat": out["x_hat"], "z_rec": out["z_rec"]}
