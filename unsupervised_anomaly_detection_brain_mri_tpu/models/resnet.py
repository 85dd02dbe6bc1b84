"""ResNet building blocks for the Chen and Schlegl model variants.

Parity with the residual stacks in
`models/constrained_adversarial_autoencoder_Chen.py:120-199` and
`models/fanogan_schlegl.py:119-161`:

  * down block:  LN -> ReLU -> Conv3x3(f) -> LN -> ReLU -> Conv3x3(f, s=2)
                 shortcut: Conv1x1(f) -> AvgPool2x2
  * same block:  LN -> ReLU -> Conv3x3(f) -> LN -> ReLU -> Conv3x3(f)
                 shortcut: identity
  * up block:    LN -> ReLU -> Conv3x3(f) -> LN -> ReLU -> ConvT3x3(f, s=2)
                 shortcut: ConvT1x1(f, s=2)

LayerNorm normalises over the spatial axes (TF ``LayerNormalization([1,2])``)
with per-channel scale/bias (see `layers.Norm`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    conv_init,
    conv_transpose,
)

Array = jnp.ndarray


def _spatial_ln(dtype: Optional[Any], name: str) -> nn.LayerNorm:
    # epsilon 1e-3 = keras LayerNormalization default
    # (`constrained_adversarial_autoencoder_Chen.py:20`)
    return nn.LayerNorm(reduction_axes=(-3, -2), feature_axes=-1,
                        epsilon=1e-3, dtype=dtype, name=name)


class ResBlockDown(nn.Module):
    """Stride-2 residual downsampling block (encoder/discriminator)."""

    filters: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(_spatial_ln(self.dtype, "ln1")(x))
        h = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(_spatial_ln(self.dtype, "ln2")(h))
        h = nn.Conv(self.filters, (3, 3), strides=(2, 2), padding="SAME",
                    kernel_init=conv_init, dtype=self.dtype, name="conv2")(h)
        sc = nn.Conv(self.filters, (1, 1), padding="SAME", kernel_init=conv_init,
                     dtype=self.dtype, name="shortcut")(x)
        sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        return h + sc


class ResBlockSame(nn.Module):
    """Resolution-preserving residual block (identity shortcut)."""

    filters: int
    transpose_second: bool = False  # reference uses ConvT for the 2nd conv
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(_spatial_ln(self.dtype, "ln1")(x))
        h = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(_spatial_ln(self.dtype, "ln2")(h))
        if self.transpose_second:
            h = conv_transpose(self.filters, (3, 3), (1, 1),
                               self.fast_convt_grad, self.dtype,
                               name="conv2")(h)
        else:
            h = nn.Conv(self.filters, (3, 3), padding="SAME",
                        kernel_init=conv_init, dtype=self.dtype, name="conv2")(h)
        return h + x


class ResBlockUp(nn.Module):
    """Stride-2 transposed-conv residual upsampling block (decoder/generator)."""

    filters: int
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(_spatial_ln(self.dtype, "ln1")(x))
        h = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(_spatial_ln(self.dtype, "ln2")(h))
        h = conv_transpose(self.filters, (3, 3), (2, 2),
                           self.fast_convt_grad, self.dtype,
                           name="conv2")(h)
        sc = conv_transpose(self.filters, (1, 1), (2, 2),
                            self.fast_convt_grad, self.dtype,
                            name="shortcut")(x)
        return h + sc


class ResNetEncoder(nn.Module):
    """Chen encoder / Schlegl discriminator backbone: stem conv + 3 down
    blocks (2f, 4f, 8f) + 1 same block (8f)."""

    dim: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.dim, (3, 3), padding="SAME", kernel_init=conv_init,
                    dtype=self.dtype, name="stem")(x)
        h = ResBlockDown(2 * self.dim, dtype=self.dtype, name="res1")(h)
        h = ResBlockDown(4 * self.dim, dtype=self.dtype, name="res2")(h)
        h = ResBlockDown(8 * self.dim, dtype=self.dtype, name="res3")(h)
        h = ResBlockSame(8 * self.dim, dtype=self.dtype, name="res4")(h)
        return h


class ResNetDecoder(nn.Module):
    """Chen decoder / Schlegl generator backbone: 1 same block (8f, ConvT
    second conv) + 3 up blocks (4f, 2f, f) + LN/ReLU + 1x1 conv head."""

    dim: int = 64
    out_channels: int = 1
    final_tanh: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fcg = self.fast_convt_grad
        h = ResBlockSame(8 * self.dim, transpose_second=True,
                         fast_convt_grad=fcg, dtype=self.dtype,
                         name="res1")(x)
        h = ResBlockUp(4 * self.dim, fast_convt_grad=fcg, dtype=self.dtype,
                       name="res2")(h)
        h = ResBlockUp(2 * self.dim, fast_convt_grad=fcg, dtype=self.dtype,
                       name="res3")(h)
        h = ResBlockUp(self.dim, fast_convt_grad=fcg, dtype=self.dtype,
                       name="res4")(h)
        h = nn.relu(_spatial_ln(self.dtype, "ln_out")(h))
        h = nn.Conv(self.out_channels, (1, 1), padding="SAME",
                    kernel_init=conv_init, dtype=self.dtype, name="head")(h)
        h = h.astype(jnp.float32)
        return jnp.tanh(h) if self.final_tanh else h
