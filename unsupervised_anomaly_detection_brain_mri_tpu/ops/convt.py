"""Strided 'SAME' transposed conv with a reverse-free kernel gradient.

The decoder pyramid's ConvT(5x5, s=2) stages dominate the AE train step
(STATUS.md roofline).  JAX's built-in kernel-gradient for a transposed
conv is a conv whose FILTER is the output cotangent — on the last stage
that filter is the full-resolution 128x128x128x32 feature map (134 MB
bf16), and XLA's conv canonicalizer materialises a spatial ``reverse`` of
it before the gradient conv (~7.6% of the step measured as pure waste,
docs/STATUS.md "round-3 measurement campaign" item 2).

Here the kernel gradient is reformulated as a direct correlation with the
cotangent as the conv IMAGE and the (rhs-dilated) input as the filter:

    dW[kh, kw, ci, co] = sum_{b,ih,iw} x[b,ih,iw,ci] * g[b, S*ih + pad_a
                                                          - kh, ..., co]

which is the same contraction indexed as a convolution over g — so the
only flip left is of the 5x5 OUTPUT (a few hundred KB), not the map.  The
forward is the identical ``lax.conv_transpose`` call (bit-equal), and the
input gradient reuses JAX's native transpose rule (its only reverse is
the 5x5 kernel).  Gradients agree with the built-in path to float
reassociation.

Default-ON via ``Config.fastConvTGrad`` for decoder families where the
hardware A/B measured a win (UnifiedDecoder 5x5 pyramid: 1.08x end-to-end
on TPU v5e); families where the correlation formulation lowered no better
than XLA's reverse+conv keep jax's built-in rule (see
``models/registry._FAST_CONVT_GRAD_OFF``).  ``--no-fast-convt-grad``
restores the built-in rule everywhere; parity is exact either way.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

_DN = ("NHWC", "HWIO", "NHWC")


def _same_pad_a(k: int, s: int) -> int:
    """Low-side padding of the underlying dilated conv for
    ``lax.conv_transpose(padding='SAME')`` (mirrors jax's
    `_conv_transpose_padding`; validated against the emitted jaxpr in
    tests).  k=5, s=2 -> 3."""
    pad_len = k + s - 2
    return k - 1 if s > k - 1 else int(math.ceil(pad_len / 2))


def _kernel_grad(x: Array, g: Array, k: int, s: int) -> Array:
    """dW of conv_transpose(x, W, stride s, 'SAME') as a correlation with
    g as the image — no full-map reverse."""
    pad_a = _same_pad_a(k, s)
    cl = k - 1 - pad_a
    # output spatial extent must be k: OH + cl + ch - (s*(IH-1)+1) + 1 = k
    # with OH = s*IH  ->  cl + ch = k - s
    ch = k - s - cl
    lhsg = jnp.transpose(g, (3, 1, 2, 0))   # (Cout, OH, OW, B)
    rhsx = jnp.transpose(x, (1, 2, 0, 3))   # (IH, IW, B, Cin)
    corr = lax.conv_general_dilated(
        lhsg, rhsx, window_strides=(1, 1),
        padding=((cl, ch), (cl, ch)), rhs_dilation=(s, s),
        dimension_numbers=_DN, preferred_element_type=jnp.float32)
    # (Cout, kh, kw, Cin) -> (kh, kw, Cin, Cout), then flip the 5x5 output
    return jnp.transpose(corr, (1, 2, 3, 0))[::-1, ::-1]


def _raw_conv_transpose(x: Array, w: Array, s: int) -> Array:
    return lax.conv_transpose(x, w, strides=(s, s), padding="SAME",
                              dimension_numbers=_DN)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_transpose_nrev(x: Array, w: Array, stride: int) -> Array:
    """``lax.conv_transpose(..., 'SAME')`` with the reverse-free dW."""
    return _raw_conv_transpose(x, w, stride)


def _fwd(x, w, stride):
    return _raw_conv_transpose(x, w, stride), (x, w)


def _bwd(stride, res, g):
    x, w = res
    # input gradient: jax's native transpose (reverses only the kxk kernel)
    _, vjp_x = jax.vjp(lambda xx: _raw_conv_transpose(xx, w, stride), x)
    (dx,) = vjp_x(g)
    dw = _kernel_grad(x, g, w.shape[0], stride).astype(w.dtype)
    return dx, dw


conv_transpose_nrev.defvjp(_fwd, _bwd)
