"""Deterministic autoencoders.

Parity: `models/autoencoder.py:9-40` (dense bottleneck AE) and
`models/autoencoder_spatial.py:7-27` (fully-convolutional AE with a spatial
latent).  Output dict keys match the reference (`z`, `x_hat`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    DenseBottleneck,
    UnifiedDecoder,
    UnifiedEncoder,
)

Array = jnp.ndarray


class Autoencoder(nn.Module):
    """Dense-bottleneck AE (`models/autoencoder.py:9-40`)."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 8
    dropout_rate: float = 0.2
    space_to_depth_stem: bool = False
    depth_to_space_head: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        self.encoder = UnifiedEncoder(
            self.image_size, self.intermediate_resolution,
            space_to_depth_stem=self.space_to_depth_stem, dtype=self.dtype
        )
        self.bottleneck = DenseBottleneck(
            self.z_dim, self.dropout_rate,
            # reference AE quirk: the decoder-dense dropout call lacks the
            # training flag and never fires (`models/autoencoder.py:31`)
            decoder_dropout=False, dtype=self.dtype
        )
        self.decoder = UnifiedDecoder(
            self.image_size,
            self.channels,
            self.intermediate_resolution,
            depth_to_space_head=self.depth_to_space_head,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype,
        )

    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        h = self.encoder(x, train=train)
        z, h = self.bottleneck(h, dropout=dropout)
        x_hat = self.decoder(h, train=train)
        return {"z": z, "x_hat": x_hat}


class AutoencoderSpatial(nn.Module):
    """Spatial-latent AE (`models/autoencoder_spatial.py:7-27`): the unified
    encoder output IS the latent (with dropout), no dense bottleneck."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128  # unused; kept for a uniform constructor signature
    intermediate_resolution: int = 8
    dropout_rate: float = 0.2
    space_to_depth_stem: bool = False
    depth_to_space_head: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        self.encoder = UnifiedEncoder(
            self.image_size, self.intermediate_resolution,
            space_to_depth_stem=self.space_to_depth_stem, dtype=self.dtype
        )
        self.decoder = UnifiedDecoder(
            self.image_size,
            self.channels,
            self.intermediate_resolution,
            depth_to_space_head=self.depth_to_space_head,
            fast_convt_grad=self.fast_convt_grad,
            dtype=self.dtype,
        )
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        z = self.drop(self.encoder(x, train=train), deterministic=not dropout)
        x_hat = self.decoder(z, train=train)
        return {"z": z.astype(jnp.float32), "x_hat": x_hat}
