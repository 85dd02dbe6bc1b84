"""Shared layer builders for the model zoo.

TPU-native re-design of the reference `models/customlayers.py:16-38`
(`build_unified_encoder` / `build_unified_decoder`): strided 5x5 convolutions
down to an intermediate resolution, mirrored transposed convolutions back up.

Architecture parity:
  * encoder stage i: Conv(k=5, s=2, SAME, filters=min(128, 32*2^i)) -> Norm ->
    LeakyReLU(0.3)   (`customlayers.py:16-24`; keras LeakyReLU alpha=0.3)
  * decoder: Norm -> ReLU -> [ConvT(k=5, s=2, filters=max(32, 128/2^i)) ->
    Norm -> LeakyReLU]*n -> 1x1 Conv to output channels + final activation
    (`customlayers.py:27-38`)
  * num stages = log2(width) - log2(intermediate_resolution)

TPU notes:
  * Convolutions run in bfloat16 (configurable) with float32 params — XLA maps
    them onto the MXU; 5x5 stride-2 convs at 128x128/bs>=8 are MXU-bound.
  * Norm defaults to BatchNorm with properly-updated running statistics.  The
    reference constructed `tf.compat.v1.layers.BatchNormalization` but invoked
    it without `training=True`, freezing the moving statistics at (0, 1); we
    implement real BatchNorm (a deliberate, documented deviation that the
    UPDATE_OPS plumbing in `trainers/DLMODEL.py:128-131` shows was intended).
    Under a data-parallel mesh the batch statistics are global: XLA reduces
    over the sharded batch axis automatically in SPMD.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray
Dtype = Any

# TF-parity nonlinearity/initialiser constants.
LEAKY_SLOPE = 0.3  # keras LeakyReLU default alpha
BN_EPS = 1e-3  # tf.layers BatchNormalization default epsilon
BN_MOMENTUM = 0.99

conv_init = nn.initializers.glorot_uniform()  # TF1 layers default
dense_init = nn.initializers.glorot_uniform()


def leaky_relu(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def num_scale_stages(width: int, intermediate_resolution: int) -> int:
    """log2(width) - log2(intermediate) stages (`customlayers.py:18`)."""
    return int(math.log2(width) - math.log2(float(intermediate_resolution)))


class Norm(nn.Module):
    """BatchNorm (default) or spatial LayerNorm, selected per-model.

    The LayerNorm variant normalizes over the spatial axes like the
    reference's `LayerNormalization([1, 2])` (`customlayers.py:22`); scale and
    bias are per-channel (deviation: the TF layer parameterized per-pixel,
    which pins the module to a single image size — per-channel keeps the
    module resolution-agnostic with identical normalization statistics).
    """

    use_batchnorm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        if self.use_batchnorm:
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
            )(x)
        # keras LayerNormalization's default epsilon is 1e-3 (BN_EPS was
        # already matched); flax's 1e-6 default deviates wherever spatial
        # variance is small
        return nn.LayerNorm(
            reduction_axes=(-3, -2), feature_axes=-1, epsilon=BN_EPS,
            dtype=self.dtype
        )(x)


def space_to_depth(x: Array, block: int = 2) -> Array:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b) by packing b x b pixel blocks
    into channels — a pure reshape/transpose (free on TPU: layout change
    fuses into the consumer conv)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // block, W // block, C * block * block)


class UnifiedEncoder(nn.Module):
    """Strided-conv pyramid down to ``intermediate_resolution``.

    ``space_to_depth_stem`` (opt-in, NON-PARITY): replaces stage 0's
    Conv(k=5, s=2) on the C=1 input with space-to-depth(2x2) +
    Conv(k=3, s=1).  The parity stem contracts only K*K*C = 25 values per
    output — 25 of the MXU's 128 lanes; the packed stem contracts 9*4 = 36
    over a 4x smaller spatial domain and lets XLA tile the input stationary,
    lifting the input-conv's MXU utilisation.  Output shapes (and every
    later stage) are unchanged; weights are NOT interchangeable with the
    parity stem, which is why it sits behind ``Config.spaceToDepthStem``.
    """

    image_width: int
    intermediate_resolution: int = 8
    use_batchnorm: bool = True
    space_to_depth_stem: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n = num_scale_stages(self.image_width, self.intermediate_resolution)
        for i in range(n):
            filters = int(min(128, 32 * (2 ** i)))
            if i == 0 and self.space_to_depth_stem and n > 0:
                x = space_to_depth(x, 2)
                x = nn.Conv(
                    filters,
                    kernel_size=(3, 3),
                    strides=(1, 1),
                    padding="SAME",
                    kernel_init=conv_init,
                    dtype=self.dtype,
                    name="enc_conv_0_s2d",
                )(x)
            else:
                x = nn.Conv(
                    filters,
                    kernel_size=(5, 5),
                    strides=(2, 2),
                    padding="SAME",
                    kernel_init=conv_init,
                    dtype=self.dtype,
                    name=f"enc_conv_{i}",
                )(x)
            x = Norm(self.use_batchnorm, dtype=self.dtype, name=f"enc_norm_{i}")(
                x, train=train
            )
            x = leaky_relu(x)
        return x


def depth_to_space(x: Array, block: int = 2) -> Array:
    """(B, H, W, C*b*b) -> (B, H*b, W*b, C): inverse of ``space_to_depth``."""
    B, H, W, C = x.shape
    c = C // (block * block)
    x = x.reshape(B, H, W, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * block, W * block, c)


class ConvTransposeNRG(nn.Module):
    """Drop-in twin of ``nn.ConvTranspose(k, strides, 'SAME')`` routing
    through `ops/convt.py::conv_transpose_nrev`: identical forward (same
    ``lax.conv_transpose`` call, same param names/initialisers — shared
    checkpoints), but the kernel gradient avoids XLA's full-feature-map
    spatial ``reverse`` (docs/STATUS.md roofline: ~7.6% of the AE step).
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from unsupervised_anomaly_detection_brain_mri_tpu.ops.convt import (
            conv_transpose_nrev,
        )

        k = self.param("kernel", conv_init,
                       (self.kernel_size, self.kernel_size,
                        x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        y = conv_transpose_nrev(x.astype(dt), k.astype(dt), self.stride)
        return y + b.astype(dt)


def conv_transpose(features: int, kernel_size, strides, fast: bool,
                   dtype, name: str):
    """``nn.ConvTranspose(..., 'SAME')`` or its reverse-free-gradient twin
    (`ConvTransposeNRG`, checkpoint-compatible) — every decoder ConvT site
    in the zoo routes through here so ``Config.fastConvTGrad`` switches
    the whole model family at once."""
    if fast:
        return ConvTransposeNRG(features, kernel_size=kernel_size[0],
                                stride=strides[0], dtype=dtype, name=name)
    return nn.ConvTranspose(features, kernel_size=kernel_size,
                            strides=strides, padding="SAME",
                            kernel_init=conv_init, dtype=dtype, name=name)


class UnifiedDecoder(nn.Module):
    """Mirrored transposed-conv pyramid up to ``output_width``.

    ``depth_to_space_head`` (opt-in, NON-PARITY): replaces the LAST
    ConvT(k=5, s=2, 32ch) stage + BN + LeakyReLU + 1x1 output conv with one
    Conv(k=3, s=1, 4*C_out) at half resolution followed by
    depth-to-space(2x2).  The parity head materialises a full-resolution
    32-channel feature map (128x128x128x32 bf16 = 134 MB at batch 128) that
    dominates the train step's HBM traffic — measured ~60% of the AE epoch
    on TPU v5e (profiler: the dec_convT_3 / dec_conv_final fusions).  The
    packed head computes everything at half resolution and writes only the
    C_out-channel output.  Behind ``Config.depthToSpaceHead``.

    (A PARITY-PRESERVING fused Pallas last stage with in-pass BN statistics
    and a custom-VJP backward also lived here; it was measured on TPU v5e at
    0.41x end-to-end vs the production ConvT path — the XLA composition it
    beat in isolation is not the composition XLA emits in context — and was
    deleted per that measurement, like the fused postprocess kernel.  The
    full campaign is recorded in docs/STATUS.md.)
    """

    output_width: int
    output_channels: int = 1
    intermediate_resolution: int = 8
    use_batchnorm: bool = True
    final_activation: Optional[Callable[[Array], Array]] = None
    depth_to_space_head: bool = False
    fast_convt_grad: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n = num_scale_stages(self.output_width, self.intermediate_resolution)
        x = Norm(self.use_batchnorm, dtype=self.dtype, name="dec_norm_in")(
            x, train=train
        )
        x = nn.relu(x)
        packed_head = self.depth_to_space_head and n > 0
        n_convt = n - 1 if packed_head else n
        for i in range(n_convt):
            filters = int(max(32, 128 // (2 ** i)))
            if self.fast_convt_grad:
                # same forward + params, reverse-free kernel gradient
                x = ConvTransposeNRG(filters, dtype=self.dtype,
                                     name=f"dec_convT_{i}")(x)
            else:
                x = nn.ConvTranspose(
                    filters,
                    kernel_size=(5, 5),
                    strides=(2, 2),
                    padding="SAME",
                    kernel_init=conv_init,
                    dtype=self.dtype,
                    name=f"dec_convT_{i}",
                )(x)
            x = Norm(self.use_batchnorm, dtype=self.dtype, name=f"dec_norm_{i}")(
                x, train=train
            )
            x = leaky_relu(x)
        if packed_head:
            x = nn.Conv(
                4 * self.output_channels,
                kernel_size=(3, 3),
                padding="SAME",
                kernel_init=conv_init,
                dtype=self.dtype,
                name="dec_conv_d2s_head",
            )(x)
            x = depth_to_space(x, 2)
        else:
            x = nn.Conv(
                self.output_channels,
                kernel_size=(1, 1),
                padding="SAME",
                kernel_init=conv_init,
                dtype=self.dtype,
                name="dec_conv_final",
            )(x)
        if self.final_activation is not None:
            x = self.final_activation(x)
        # Final output always in float32 for stable losses/metrics.
        return x.astype(jnp.float32)


class DenseBottleneck(nn.Module):
    """1x1-conv channel squeeze -> Dense(zDim) -> Dense back -> 1x1 expand.

    Parity with the reference bottleneck (`models/autoencoder.py:20-31`):
    the feature map is squeezed to C/8 channels by a 1x1 conv, flattened into
    Dense(zDim) with dropout on the latent, then projected back and expanded
    to C channels.  Returns (z, feature_map).
    """

    z_dim: int
    dropout_rate: float = 0.2
    # the AE's reference decoder-dense dropout call lacks the training
    # flag and is therefore INACTIVE (`models/autoencoder.py:31` —
    # `dropout_layer(dec_dense(z))` vs the z call's `, dropout`); models
    # whose reference passes the flag (VAE/CE/constrainedAE) keep it on
    decoder_dropout: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, *, dropout: bool) -> Tuple[Array, Array]:
        channels = x.shape[-1]
        squeezed = nn.Conv(
            channels // 8, kernel_size=(1, 1), padding="SAME",
            kernel_init=conv_init, dtype=self.dtype, name="intermediate_conv",
        )(x)
        reshape = squeezed.shape[1:]
        flat = squeezed.reshape((squeezed.shape[0], -1))
        drop = nn.Dropout(self.dropout_rate)
        z = drop(
            nn.Dense(self.z_dim, kernel_init=dense_init, dtype=self.dtype,
                     name="z_layer")(flat),
            deterministic=not dropout,
        )
        dec = drop(
            nn.Dense(math.prod(reshape), kernel_init=dense_init,
                     dtype=self.dtype, name="dec_dense")(z),
            deterministic=not (dropout and self.decoder_dropout),
        )
        out = nn.Conv(
            channels, kernel_size=(1, 1), padding="SAME", kernel_init=conv_init,
            dtype=self.dtype, name="intermediate_conv_reverse",
        )(dec.reshape((x.shape[0],) + tuple(reshape)))
        return z.astype(jnp.float32), out


def sample_from_prior(model, variables, rng, n: int, z_dim: int,
                      method: str = "decode", **kwargs):
    """Decode latents drawn from N(0, I) — parity with
    `models/customlayers.py:8-13` (``sample``).

    Works with any zoo model exposing a latent->image method (``decode`` on
    the AAE family, ``generate`` on the GAN family).
    """
    z = jax.random.normal(rng, (n, z_dim))
    return model.apply(variables, z, method=method, **kwargs)


class MLPDiscriminator(nn.Module):
    """Latent-space MLP discriminator (AAE family).

    Parity: `models/adversarial_autoencoder.py:45-49` (50-50-1),
    `models/constrained_adversarial_autoencoder.py` (100-50-1),
    `models/constrained_adversarial_autoencoder_Chen.py` (400-200-1).
    """

    hidden: Sequence[int] = (50, 50)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = z
        for i, width in enumerate(self.hidden):
            h = nn.Dense(width, kernel_init=dense_init, dtype=self.dtype,
                         name=f"disc_dense_{i}")(h)
            # the MLP critics use tf.nn.leaky_relu (alpha=0.2), NOT the
            # keras LeakyReLU layer (0.3) of the conv backbones —
            # `models/adversarial_autoencoder.py:4,46-47`
            h = nn.leaky_relu(h, negative_slope=0.2)
        d = nn.Dense(1, kernel_init=dense_init, dtype=self.dtype,
                     name="disc_out")(h)
        return d.astype(jnp.float32)
