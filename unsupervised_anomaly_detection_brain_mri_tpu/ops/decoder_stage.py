"""The decoder's last stage as one fusable function.

The parity decoder ends with ConvT(5x5, s=2, ->32ch) -> BatchNorm ->
LeakyReLU(0.3) -> 1x1 Conv head (`models/customlayers.py:27-38`;
`models/layers.py::UnifiedDecoder`).  At 128x128 and batch 128 the stage
materialises a 134 MB bf16 feature map that the round-2 profiler blamed
for ~60% of the AE train epoch: XLA writes the ConvT output, re-reads it
for the BatchNorm statistics, re-reads it again for normalize/LeakyReLU/
head, and repeats the pattern backward.

This module provides the stage as ONE function with a phase-decomposed
ConvT (stride-2 k=5 transposed convolution == 4 interleaved stride-1
convolutions, one per output parity phase — exact, not an architecture
change) so the Pallas kernels in `ops/pallas_decoder.py` can compute it
with two HBM passes over the big map forward and two backward.

Everything here is pure JAX (runs on any backend) and serves as the
numerical reference for the Pallas path.

Phase decomposition (verified against `flax.linen.ConvTranspose`):
with the flipped kernel ``Wf = W[::-1, ::-1]`` and SAME padding the
output at (2i+p, 2j+q) sums taps ``kh in {1, 3}`` for p=0 (input offsets
{0, -1}) and ``kh in {0, 2, 4}`` for p=1 (offsets {+1, 0, -1}); same for
kw/q.  Each (kh, kw) tap is a shifted (H*W, Cin) @ (Cin, Cout) matmul —
MXU-friendly, no conv primitive needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# (kh, input_row_offset) per output phase; identical for columns
PHASE_TAPS = {0: ((1, 0), (3, -1)), 1: ((0, 1), (2, 0), (4, -1))}
LEAKY_SLOPE = 0.3
BN_EPS = 1e-3


def convt5s2_phases(x: Array, W: Array) -> Array:
    """Transposed conv (k=5, s=2, SAME) in phase-packed layout.

    x: (B, H, W, Cin); W: (5, 5, Cin, Cout) in flax ConvTranspose layout.
    Returns (B, H, W, 2, 2, Cout) where [..., p, q, :] is the output at
    pixel (2i+p, 2j+q).  ``phases_to_image`` assembles the (B, 2H, 2W,
    Cout) image; exactness vs flax is pinned by tests.
    """
    B, H, Wd, Cin = x.shape
    Cout = W.shape[-1]
    Wf = W[::-1, ::-1]  # flax ConvTranspose applies the flipped kernel
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, Wd, 2, 2, Cout), x.dtype)
    for p, taps_h in PHASE_TAPS.items():
        for q, taps_w in PHASE_TAPS.items():
            acc = jnp.zeros((B, H, Wd, Cout), jnp.float32)
            for kh, oh in taps_h:
                for kw, ow in taps_w:
                    win = jax.lax.dynamic_slice(
                        xp, (0, 1 + oh, 1 + ow, 0), (B, H, Wd, Cin))
                    acc = acc + jnp.einsum(
                        "bhwc,cd->bhwd", win, Wf[kh, kw],
                        preferred_element_type=jnp.float32)
            out = out.at[:, :, :, p, q, :].set(acc.astype(x.dtype))
    return out


def phases_to_image(phases: Array) -> Array:
    """(B, H, W, 2, 2, C) -> (B, 2H, 2W, C)."""
    B, H, W, _, _, C = phases.shape
    return phases.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)


def image_to_phases(y: Array) -> Array:
    """(B, 2H, 2W, C) -> (B, H, W, 2, 2, C): inverse of phases_to_image."""
    B, H2, W2, C = y.shape
    return y.reshape(B, H2 // 2, 2, W2 // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5)


def decoder_stage_reference(
    x: Array, Wt: Array, bt: Array, gamma: Array, beta: Array,
    Wh: Array, bh: Array, eps: float = BN_EPS,
) -> Tuple[Array, Array, Array]:
    """The full stage, train mode, via the phase decomposition.

    Returns (out, batch_mean, batch_var) — the stats feed the BatchNorm
    running-average update exactly like `flax.linen.BatchNorm` (biased
    variance over (B, H, W), float32 statistics).
    """
    y = convt5s2_phases(x, Wt) + bt.astype(x.dtype)
    yf = y.astype(jnp.float32)
    mean = yf.mean(axis=(0, 1, 2, 3, 4))
    var = (yf * yf).mean(axis=(0, 1, 2, 3, 4)) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = (yf - mean) * inv
    act = xhat * gamma + beta
    act = jnp.where(act >= 0, act, LEAKY_SLOPE * act)
    out = (jnp.einsum("bhwpqc,cd->bhwpqd", act.astype(x.dtype), Wh,
                      preferred_element_type=jnp.float32)
           + bh.astype(jnp.float32))
    return phases_to_image(out.astype(jnp.float32)), mean, var


def decoder_stage_eval(
    x: Array, Wt: Array, bt: Array, gamma: Array, beta: Array,
    Wh: Array, bh: Array, ra_mean: Array, ra_var: Array,
    eps: float = BN_EPS,
) -> Array:
    """Eval-mode stage (running statistics, no stats pass)."""
    y = convt5s2_phases(x, Wt) + bt.astype(x.dtype)
    yf = y.astype(jnp.float32)
    inv = jax.lax.rsqrt(ra_var + eps)
    act = (yf - ra_mean) * inv * gamma + beta
    act = jnp.where(act >= 0, act, LEAKY_SLOPE * act)
    out = (jnp.einsum("bhwpqc,cd->bhwpqd", act.astype(x.dtype), Wh,
                      preferred_element_type=jnp.float32)
           + bh.astype(jnp.float32))
    return phases_to_image(out.astype(jnp.float32))
