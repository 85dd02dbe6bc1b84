"""fAnoGAN models: WGAN-GP generator/critic + izif encoder.

Parity: `models/fanogan.py:11-84` (unified backbones; encoder with tanh
latent, generator = unified decoder with spatial LayerNorm instead of BN and
sigmoid output, critic = unified encoder (LayerNorm) with a per-position
Dense(1) head) and `models/fanogan_schlegl.py:11-161` (Schlegl ResNet
generator/critic, tanh output; encoder = unified encoder + tanh dense).

Output keys (both): ``z_enc``, ``x_enc``, ``x_``, ``d_fake_features``,
``d_``, ``d_features``, ``d``, ``x_hat``, ``d_hat_features``, ``d_hat``,
``d_enc_features``, ``d_enc``.

Reference quirk kept: the critic's Dense(1) head is applied to the 4-D
feature map (Dense acts on the channel axis), so ``d*`` outputs are spatial
score maps, not scalars (`models/fanogan.py:53-63`); WGAN losses reduce over
all axes.
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
from unsupervised_anomaly_detection_brain_mri_tpu.models.resnet import (
    ResNetDecoder,
    ResNetEncoder,
)

Array = jnp.ndarray


class FAnoGAN(nn.Module):
    """Unified-backbone fAnoGAN (`models/fanogan.py:11-84`)."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 128
    intermediate_resolution: int = 16
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
        self.z_layer = nn.Dense(self.z_dim, kernel_init=dense_init,
                                dtype=self.dtype, name="z_layer")
        feat = self.intermediate_resolution
        self.dec_dense = nn.Dense(feat * feat * (channels // 8),
                                  kernel_init=dense_init, dtype=self.dtype,
                                  name="dec_dense")
        self.drop = nn.Dropout(self.dropout_rate)
        # generator/critic use the LayerNorm flavour (use_batchnorm=False)
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

    def encode(self, x: Array, *, train: bool = False,
               dropout: bool = False) -> Array:
        h = self.encoder(x, train=train)
        sq = self.intermediate_conv(h)
        flat = sq.reshape((sq.shape[0], -1))
        z = self.drop(self.z_layer(flat), deterministic=not dropout)
        return jnp.tanh(z.astype(jnp.float32))

    def generate(self, z: Array, *, train: bool = False,
                 dropout: bool = False) -> Array:
        feat = self.intermediate_resolution
        dec = self.drop(self.dec_dense(z.astype(self.dtype or z.dtype)),
                        deterministic=not dropout)
        h = dec.reshape((z.shape[0], feat, feat, -1))
        h = self.intermediate_conv_reverse(h)
        return jax.nn.sigmoid(self.generator(h, train=train))

    def discriminate(self, x: Array, *, train: bool = False):
        feats = self.disc_features(x, train=train)
        return feats.astype(jnp.float32), self.disc_dense(
            feats).astype(jnp.float32)

    def __call__(
        self,
        x: Array,
        z: Optional[Array] = None,
        *,
        train: bool = False,
        dropout: bool = False,
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        z_enc = self.encode(x, train=train, dropout=dropout)
        out["z_enc"] = z_enc
        x_enc = self.generate(z_enc, train=train, dropout=dropout)
        out["x_enc"] = x_enc
        out["x_hat_enc"] = x_enc  # alias used by generic reconstruction paths
        if z is None:
            z = z_enc
        x_ = self.generate(z, train=train, dropout=dropout)
        out["x_"] = x_
        out["d_fake_features"], out["d_"] = self.discriminate(x_, train=train)
        out["d_features"], out["d"] = self.discriminate(x, train=train)
        alpha = jax.random.uniform(self.make_rng("gp"),
                                   (x.shape[0], 1, 1, 1))
        x_hat = x + alpha * (x_ - x)
        out["x_hat"] = x_hat
        out["d_hat_features"], out["d_hat"] = self.discriminate(
            x_hat, train=train)
        out["d_enc_features"], out["d_enc"] = self.discriminate(
            x_enc, train=train)
        return out


class FAnoGANSchlegl(nn.Module):
    """Schlegl ResNet fAnoGAN (`models/fanogan_schlegl.py:11-161`)."""

    image_size: int = 128
    channels: int = 1
    z_dim: int = 64
    intermediate_resolution: int = 16
    dropout_rate: float = 0.1
    dim: int = 64
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    def setup(self) -> None:
        # encoder: unified (BatchNorm) backbone + tanh dense
        self.encoder = UnifiedEncoder(
            self.image_size, self.intermediate_resolution, dtype=self.dtype,
            name="encoder")
        self.enc_dense = nn.Dense(self.z_dim, kernel_init=dense_init,
                                  dtype=self.dtype, name="enc_dense")
        # The ResNet generator has a fixed x8 upsampling factor, so its
        # input grid is image_size/8 (== intermediateResolutions in every
        # valid reference config, `models/fanogan_schlegl.py:122-124`).
        inter = self.image_size // 8
        self.gen_dense = nn.Dense(inter * inter * 8 * self.dim,
                                  kernel_init=dense_init, dtype=self.dtype,
                                  name="gen_dense")
        self.generator = ResNetDecoder(self.dim, self.channels,
                                       final_tanh=True,
                                       fast_convt_grad=self.fast_convt_grad,
                                       dtype=self.dtype, name="generator")
        self.disc_features = ResNetEncoder(self.dim, dtype=self.dtype,
                                           name="disc_features")
        self.disc_dense = nn.Dense(1, kernel_init=dense_init,
                                   dtype=self.dtype, name="disc_dense")

    def encode(self, x: Array, *, train: bool = False,
               dropout: bool = False) -> Array:
        h = self.encoder(x, train=train)
        flat = h.reshape((h.shape[0], -1))
        return jnp.tanh(self.enc_dense(flat).astype(jnp.float32))

    def generate(self, z: Array, *, train: bool = False,
                 dropout: bool = False) -> Array:
        inter = self.image_size // 8
        h = self.gen_dense(z.astype(self.dtype or z.dtype))
        h = h.reshape((z.shape[0], inter, inter, 8 * self.dim))
        return self.generator(h)

    def discriminate(self, x: Array, *, train: bool = False):
        feats = self.disc_features(x)
        return feats.astype(jnp.float32), self.disc_dense(
            feats).astype(jnp.float32)

    def __call__(
        self,
        x: Array,
        z: Optional[Array] = None,
        *,
        train: bool = False,
        dropout: bool = False,
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        z_enc = self.encode(x, train=train, dropout=dropout)
        out["z_enc"] = z_enc
        x_enc = self.generate(z_enc, train=train, dropout=dropout)
        out["x_enc"] = x_enc
        out["x_hat_enc"] = x_enc
        if z is None:
            z = z_enc
        x_ = self.generate(z, train=train, dropout=dropout)
        out["x_"] = x_
        out["d_fake_features"], out["d_"] = self.discriminate(x_, train=train)
        out["d_features"], out["d"] = self.discriminate(x, train=train)
        alpha = jax.random.uniform(self.make_rng("gp"),
                                   (x.shape[0], 1, 1, 1))
        x_hat = x + alpha * (x_ - x)
        out["x_hat"] = x_hat
        out["d_hat_features"], out["d_hat"] = self.discriminate(
            x_hat, train=train)
        out["d_enc_features"], out["d_enc"] = self.discriminate(
            x_enc, train=train)
        return out
