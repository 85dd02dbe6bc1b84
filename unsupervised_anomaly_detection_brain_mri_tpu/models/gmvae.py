"""Gaussian-mixture variational autoencoders (GMVAE).

Parity: `models/gaussian_mixture_variational_autoencoder.py:11-75` (dense),
`models/gaussian_mixture_variational_autoencoder_spatial.py:9-65` (spatial
1x1-conv latent heads), `models/gaussian_mixture_variational_autoencoder_You.py:8-85`
(You et al. 64-channel backbone with nearest-neighbour upsampling).

Output keys (all three): ``w_mu``, ``w_log_sigma``, ``w_sampled``, ``z_mu``,
``z_log_sigma``, ``z_sampled``, ``z_wc_mus``, ``z_wc_log_sigma_invs``,
``z_wc_sampled``, ``xz_mu``, ``pc_logit``, ``pc``.

Faithfully-preserved reference quirks (they change the learned model):
  * ``z_wc_log_sigma`` gets an extra *trainable* bias initialised at 0.1
    before use (`...variational_autoencoder.py:53`).
  * The z_wc reparameterisation uses ``exp(log_sigma_inv)`` as the std (not
    ``exp(0.5*...)``) (`...variational_autoencoder.py:58`).
  * The mixture-assignment log-likelihood adds ``log(pi)`` (not
    ``-0.5*log(2*pi)``) (`...variational_autoencoder.py:70`).
  * In the spatial variants the decoder consumes the *encoder features*
    directly (the sampled latent influences training only through the loss)
    (`...spatial.py:55-58`); the dense variant decodes from ``z_sampled``.
  * In the dense variant, dropout is NOT applied to ``z_log_sigma`` (the
    reference passes no training flag at `...variational_autoencoder.py:42`).
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

LOG_PI = math.log(math.pi)


def _mixture_posterior(z_sampled: Array, z_wc_mus: Array,
                       z_wc_log_sigma_invs: Array) -> Dict[str, Array]:
    """p(c) from the Gaussian log-likelihood of z under each component.

    Shapes: dense — z (B, dz), mus (B, dz, C); spatial — z (B, H, W, dz),
    mus (B, H, W, dz, C).  Reduction is over the dz axis.
    """
    z_tiled = jnp.expand_dims(z_sampled, -1)
    loglh = (
        -0.5 * (jnp.square(z_tiled - z_wc_mus) * jnp.exp(z_wc_log_sigma_invs))
        - z_wc_log_sigma_invs
        + LOG_PI
    )
    pc_logit = jnp.sum(loglh, axis=-2)
    return {"pc_logit": pc_logit, "pc": jax.nn.softmax(pc_logit, axis=-1)}


class GMVAE(nn.Module):
    """Dense-latent GMVAE (`models/gaussian_mixture_variational_autoencoder.py`)."""

    image_size: int = 128
    channels: int = 1
    intermediate_resolution: int = 8
    dim_c: int = 6
    dim_z: int = 1
    dim_w: int = 1
    dropout_rate: float = 0.1
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        h = UnifiedEncoder(self.image_size, self.intermediate_resolution,
                           dtype=self.dtype, name="encoder")(x, train=train)
        channels = h.shape[-1]
        squeezed = nn.Conv(channels // 8, (1, 1), padding="SAME",
                           kernel_init=conv_init, dtype=self.dtype,
                           name="intermediate_conv")(h)
        reshape = squeezed.shape[1:]
        flat = squeezed.reshape((squeezed.shape[0], -1))
        drop = nn.Dropout(self.dropout_rate)
        det = not dropout

        def dense(n: int, name: str) -> nn.Dense:
            return nn.Dense(n, kernel_init=dense_init, dtype=self.dtype, name=name)

        w_mu = drop(dense(self.dim_w, "w_mu_layer")(flat),
                    deterministic=det).astype(jnp.float32)
        w_log_sigma = drop(dense(self.dim_w, "w_log_sigma_layer")(flat),
                           deterministic=det).astype(jnp.float32)
        w_sampled = w_mu + jax.random.normal(
            self.make_rng("sample"), w_log_sigma.shape) * jnp.exp(0.5 * w_log_sigma)

        z_mu = drop(dense(self.dim_z, "z_mu_layer")(flat),
                    deterministic=det).astype(jnp.float32)
        # reference quirk: no dropout on z_log_sigma
        z_log_sigma = dense(self.dim_z, "z_log_sigma_layer")(flat).astype(jnp.float32)
        z_sampled = z_mu + jax.random.normal(
            self.make_rng("sample"), z_log_sigma.shape) * jnp.exp(0.5 * z_log_sigma)

        # prior net p(z|w,c)
        z_wc_mu = dense(self.dim_z * self.dim_c, "z_wc_mu_layer")(
            w_sampled.astype(self.dtype or w_sampled.dtype)).astype(jnp.float32)
        z_wc_log_sigma = dense(self.dim_z * self.dim_c, "z_wc_log_sigma_layer")(
            w_sampled.astype(self.dtype or w_sampled.dtype)).astype(jnp.float32)
        sigma_bias = self.param(
            "z_wc_log_sigma_inv_bias",
            nn.initializers.constant(0.1),
            (self.dim_z * self.dim_c,),
        )
        z_wc_log_sigma_inv = z_wc_log_sigma + sigma_bias
        z_wc_mus = z_wc_mu.reshape((-1, self.dim_z, self.dim_c))
        z_wc_log_sigma_invs = z_wc_log_sigma_inv.reshape(
            (-1, self.dim_z, self.dim_c))
        z_wc_sampled = z_wc_mus + jax.random.normal(
            self.make_rng("sample"), z_wc_log_sigma_invs.shape
        ) * jnp.exp(z_wc_log_sigma_invs)

        # decoder p(x|z) — dense variant decodes from z_sampled
        dec = drop(dense(math.prod(reshape), "dec_dense")(
            z_sampled.astype(self.dtype or z_sampled.dtype)), deterministic=det)
        hd = nn.Conv(channels, (1, 1), padding="SAME", kernel_init=conv_init,
                     dtype=self.dtype, name="intermediate_conv_reverse")(
            dec.reshape((x.shape[0],) + tuple(reshape)))
        xz_mu = UnifiedDecoder(self.image_size, self.channels,
                               self.intermediate_resolution,
                               fast_convt_grad=self.fast_convt_grad,
                               dtype=self.dtype,
                               name="decoder")(hd, train=train)

        out.update(
            w_mu=w_mu, w_log_sigma=w_log_sigma, w_sampled=w_sampled,
            z_mu=z_mu, z_log_sigma=z_log_sigma, z_sampled=z_sampled,
            z_wc_mus=z_wc_mus, z_wc_log_sigma_invs=z_wc_log_sigma_invs,
            z_wc_sampled=z_wc_sampled, xz_mu=xz_mu,
        )
        out.update(_mixture_posterior(z_sampled, z_wc_mus, z_wc_log_sigma_invs))
        out["x_hat"] = xz_mu  # uniform key for generic reconstruction paths
        return out


class _SpatialGMVAEHeads(nn.Module):
    """Shared spatial latent heads + prior net (1x1 convs) for the spatial
    and You variants (`...spatial.py:16-52`, `...You.py:22-52`)."""

    dim_c: int
    dim_z: int
    dim_w: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, enc: Array) -> Dict[str, Array]:
        def conv(n: int, name: str, act: bool = False) -> nn.Conv:
            return nn.Conv(n, (1, 1), padding="SAME", kernel_init=conv_init,
                           dtype=self.dtype, name=name)

        w_mu = conv(self.dim_w, "w_mu")(enc).astype(jnp.float32)
        w_log_sigma = conv(self.dim_w, "w_log_sigma")(enc).astype(jnp.float32)
        w_sampled = w_mu + jax.random.normal(
            self.make_rng("sample"), w_log_sigma.shape) * jnp.exp(0.5 * w_log_sigma)

        z_mu = conv(self.dim_z, "z_mu")(enc).astype(jnp.float32)
        z_log_sigma = conv(self.dim_z, "z_log_sigma")(enc).astype(jnp.float32)
        z_sampled = z_mu + jax.random.normal(
            self.make_rng("sample"), z_log_sigma.shape) * jnp.exp(0.5 * z_log_sigma)

        mid = nn.relu(conv(64, "p_z_wc_conv")(
            w_sampled.astype(self.dtype or w_sampled.dtype)))
        z_wc_mu = conv(self.dim_z * self.dim_c, "z_wc_mu")(mid).astype(jnp.float32)
        z_wc_log_sigma = conv(self.dim_z * self.dim_c, "z_wc_log_sigma")(
            mid).astype(jnp.float32)
        sigma_bias = self.param(
            "z_wc_log_sigma_inv_bias",
            nn.initializers.constant(0.1),
            (self.dim_z * self.dim_c,),
        )
        z_wc_log_sigma_inv = z_wc_log_sigma + sigma_bias
        spatial = z_wc_mu.shape[1:3]
        z_wc_mus = z_wc_mu.reshape((-1, *spatial, self.dim_z, self.dim_c))
        z_wc_log_sigma_invs = z_wc_log_sigma_inv.reshape(
            (-1, *spatial, self.dim_z, self.dim_c))
        z_wc_sampled = z_wc_mus + jax.random.normal(
            self.make_rng("sample"), z_wc_log_sigma_invs.shape
        ) * jnp.exp(z_wc_log_sigma_invs)

        out = dict(
            w_mu=w_mu, w_log_sigma=w_log_sigma, w_sampled=w_sampled,
            z_mu=z_mu, z_log_sigma=z_log_sigma, z_sampled=z_sampled,
            z_wc_mus=z_wc_mus, z_wc_log_sigma_invs=z_wc_log_sigma_invs,
            z_wc_sampled=z_wc_sampled,
        )
        out.update(_mixture_posterior(z_sampled, z_wc_mus, z_wc_log_sigma_invs))
        return out


class GMVAESpatial(nn.Module):
    """Spatial-latent GMVAE (`...spatial.py:9-65`)."""

    image_size: int = 128
    channels: int = 1
    intermediate_resolution: int = 8
    dim_c: int = 9
    dim_z: int = 1
    dim_w: int = 1
    dropout_rate: float = 0.1
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        enc = UnifiedEncoder(self.image_size, self.intermediate_resolution,
                             dtype=self.dtype, name="encoder")(x, train=train)
        out = _SpatialGMVAEHeads(self.dim_c, self.dim_z, self.dim_w,
                                 dtype=self.dtype, name="heads")(enc)
        # reference quirk: decoder consumes the encoder features directly
        xz_mu = UnifiedDecoder(self.image_size, self.channels,
                               self.intermediate_resolution,
                               fast_convt_grad=self.fast_convt_grad,
                               dtype=self.dtype,
                               name="decoder")(enc, train=train)
        out["xz_mu"] = out["x_hat"] = xz_mu
        return out


class GMVAEYou(nn.Module):
    """You et al. backbone (`...You.py:8-85`): six 64-channel k=3 convs
    (strides 2,1,1,2,1,1), spatial heads, decoder with two nearest-neighbour
    x2 upsampling stages, all ReLU."""

    image_size: int = 128
    channels: int = 1
    intermediate_resolution: int = 8  # unused (fixed backbone); kept for API
    dim_c: int = 9
    dim_z: int = 1
    dim_w: int = 1
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: Array, *, train: bool = False, dropout: bool = False
    ) -> Dict[str, Array]:
        def conv(name: str, k: int = 3, s: int = 1, f: int = 64,
                 act: bool = True):
            def f_(v):
                v = nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                            kernel_init=conv_init, dtype=self.dtype,
                            name=name)(v)
                return nn.relu(v) if act else v
            return f_

        def convT(name: str):
            def f_(v):
                # stride-1 ConvT: no lhs dilation, so jax's built-in kernel
                # gradient has no full-map reverse (ops/convt.py is for the
                # strided decoder stages)
                v = nn.ConvTranspose(64, (3, 3), strides=(1, 1), padding="SAME",
                                     kernel_init=conv_init, dtype=self.dtype,
                                     name=name)(v)
                return nn.relu(v)
            return f_

        h = x
        for i, s in enumerate((2, 1, 1, 2, 1, 1)):
            h = conv(f"enc_conv_{i + 1}", s=s)(h)
        out = _SpatialGMVAEHeads(self.dim_c, self.dim_z, self.dim_w,
                                 dtype=self.dtype, name="heads")(h)

        # decoder p(x|z) — decodes from z_sampled (`...You.py:62-78`)
        v = out["z_sampled"].astype(self.dtype or x.dtype)
        v = conv("dec_conv_8")(v)
        v = convT("dec_convT_1")(v)
        v = convT("dec_convT_2")(v)
        b, hgt, wid, c = v.shape
        v = jax.image.resize(v, (b, 2 * hgt, 2 * wid, c), method="nearest")
        v = conv("dec_conv_9")(v)
        v = convT("dec_convT_3")(v)
        v = convT("dec_convT_4")(v)
        b, hgt, wid, c = v.shape
        v = jax.image.resize(v, (b, 2 * hgt, 2 * wid, c), method="nearest")
        v = conv("dec_conv_10", act=False)(v)
        xz_mu = nn.Conv(self.channels, (3, 3), padding="SAME",
                        kernel_init=conv_init, dtype=self.dtype,
                        name="xz_mu_layer")(v).astype(jnp.float32)
        out["xz_mu"] = out["x_hat"] = xz_mu
        return out
