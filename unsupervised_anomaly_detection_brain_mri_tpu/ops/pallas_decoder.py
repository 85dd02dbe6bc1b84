"""Fused decoder-last-stage Pallas kernels (VERDICT r2 item 1).

The parity decoder's last stage — ConvT(5x5, s=2) -> BatchNorm ->
LeakyReLU(0.3) -> 1x1 conv head (`models/customlayers.py:27-38`) — is the
AE train step's HBM bottleneck: XLA materialises the full-resolution
feature map (B x 2H x 2W x Cout, 134 MB bf16 at batch 128) and crosses it
~3x forward and ~5x backward.  These kernels compute the SAME math (via
the exact phase decomposition in `ops/decoder_stage.py`) with:

  forward:  ONE pass writing the phase-packed map + accumulating the
            BatchNorm statistics in VMEM (XLA needed a separate stats
            read), then one fused XLA read for normalize/LeakyReLU/head;
  backward: pass 1 reads the map once, accumulating ALL small-parameter
            gradients (head, BN scale/bias) and the two BN-backward
            reductions; pass 2 reads it once more, reconstructs dy in
            VMEM (never materialised in HBM) and directly produces both
            the ConvT weight gradient and the input gradient.

Layout note: phases are packed into channels — (B, H, W, 2, 2, C) stored
as (B, H, W, 4C).  For the parity stage (C=32) that makes the lane
dimension exactly 128.  Per grid step one batch image lives in VMEM
(~1 MB packed map + ~0.5 MB input window); cross-step accumulators are
f32 VMEM scratch, written to outputs at the final grid step (the TPU
grid is sequential).

Numerical contract: identical math to `decoder_stage_reference` — conv
matmuls accumulate in f32 (``preferred_element_type``), statistics and
all reductions in f32.  Exactness is pinned by tests in interpret mode
and (on hardware) against the XLA composition at bf16 tolerance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unsupervised_anomaly_detection_brain_mri_tpu.ops.decoder_stage import (
    BN_EPS,
    LEAKY_SLOPE,
    PHASE_TAPS,
    decoder_stage_reference,
    phases_to_image,
)

Array = jnp.ndarray

# flattened (p, q) phase order used for channel packing
_PHASES = [(0, 0), (0, 1), (1, 0), (1, 1)]

# the 9 input-window offsets the taps draw from (im2col-9 layout order)
OFF9 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
        (1, -1), (1, 0), (1, 1)]


def _idx9(oh: int, ow: int) -> int:
    return OFF9.index((oh, ow))


def _tap_map():
    """Bijection (kh, kw) <-> (window index, packed phase): each kernel
    tap contributes to exactly one output phase from exactly one shifted
    input window."""
    out = []
    for p, taps_h in PHASE_TAPS.items():
        for q, taps_w in PHASE_TAPS.items():
            ph = 2 * p + q
            for kh, oh in taps_h:
                for kw, ow in taps_w:
                    out.append((kh, kw, oh, ow, ph))
    return out


def _w_all(Wf: Array, dtype) -> Array:
    """(9*Cin, 4*Cout) combined forward weight: y_packed = X9 @ W_all.

    X9 is the im2col-9 of the padded input (9 shifted windows along
    lanes); unused (window, phase) blocks are zero.  One well-shaped MXU
    matmul replaces the 25 tiny per-tap matmuls."""
    Cin, Cout = Wf.shape[2], Wf.shape[3]
    W = jnp.zeros((9 * Cin, 4 * Cout), jnp.float32)
    for kh, kw, oh, ow, ph in _tap_map():
        r = _idx9(oh, ow) * Cin
        c = ph * Cout
        W = W.at[r:r + Cin, c:c + Cout].add(Wf[kh, kw].astype(jnp.float32))
    return W.astype(dtype)


def _w_dx(Wf: Array, dtype) -> Array:
    """(9*4*Cout, Cin) combined input-gradient weight: dx = DY9 @ W_dx,
    where DY9 is the im2col-9 of the zero-padded packed dy (window offset
    (-oh, -ow) for tap offset (oh, ow))."""
    Cin, Cout = Wf.shape[2], Wf.shape[3]
    C4 = 4 * Cout
    W = jnp.zeros((9 * C4, Cin), jnp.float32)
    for kh, kw, oh, ow, ph in _tap_map():
        r = _idx9(-oh, -ow) * C4 + ph * Cout
        W = W.at[r:r + Cout, :].add(
            Wf[kh, kw].astype(jnp.float32).T)
    return W.astype(dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward: ConvT phases + stats in one pass


def _fwd_kernel(xp_ref, wf_ref, bt_ref, y_ref, s1_ref, s2_ref, acc1, acc2):
    i = pl.program_id(0)
    H = y_ref.shape[1]
    W = y_ref.shape[2]
    Cin = xp_ref.shape[3]
    C4 = y_ref.shape[3]
    Cout = C4 // 4

    @pl.when(i == 0)
    def _():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    xp = xp_ref[0]  # (H+2, W+2, Cin)
    # im2col-9: the 9 shifted windows along lanes -> ONE MXU matmul
    x9 = jnp.concatenate(
        [xp[1 + oh:1 + oh + H, 1 + ow:1 + ow + W, :].reshape(H * W, Cin)
         for (oh, ow) in OFF9], axis=1)  # (HW, 9*Cin)
    yf = jnp.dot(x9, wf_ref[:], preferred_element_type=jnp.float32)
    yf = yf + bt_ref[0].astype(jnp.float32)  # bias pre-packed to (1, C4)
    y_ref[0] = yf.reshape(H, W, C4).astype(y_ref.dtype)
    acc1[:] = acc1[:] + jnp.sum(yf, axis=0, keepdims=True)
    acc2[:] = acc2[:] + jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        s1_ref[:] = acc1[:]
        s2_ref[:] = acc2[:]


def _fwd_call(xp: Array, Wf: Array, bt: Array, out_dtype
              ) -> Tuple[Array, Array, Array]:
    B, Hp, Wp, Cin = xp.shape
    H, W = Hp - 2, Wp - 2
    Cout = Wf.shape[-1]
    C4 = 4 * Cout
    w_all = _w_all(Wf, xp.dtype)
    y, s1, s2 = pl.pallas_call(
        _fwd_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C4), out_dtype),
            jax.ShapeDtypeStruct((1, C4), jnp.float32),
            jax.ShapeDtypeStruct((1, C4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, C4), jnp.float32),
            pltpu.VMEM((1, C4), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, w_all, jnp.tile(bt, 4).reshape(1, -1))
    return y, s1, s2


# ---------------------------------------------------------------------------
# backward pass 1: all small reductions in one read of the packed map


def _bwd1_kernel(y_ref, g_ref, mv_ref, par_ref, out_ref, acc):
    """Accumulates, per PACKED channel: [dWh, dbeta, dgamma, s_dxhat,
    s_dxhat_xhat] (5 rows) plus dbh in acc[5, 0].

    Processes one phase block (Cout lanes) at a time so live f32
    temporaries stay ~4x smaller than the packed map (VMEM headroom at
    the parity shapes: (4096, 32) f32 per temporary, not (4096, 128))."""
    i = pl.program_id(0)
    H, W, C4 = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
    Cout = C4 // 4

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    g = g_ref[0].reshape(H * W, 4).astype(jnp.float32)  # phase-packed head
    for ph in range(4):
        sl = slice(ph * Cout, (ph + 1) * Cout)
        yf = y_ref[0, :, :, sl].reshape(H * W, Cout).astype(jnp.float32)
        mean, inv = mv_ref[0, sl], mv_ref[1, sl]
        gamma, beta, wh = par_ref[0, sl], par_ref[1, sl], par_ref[2, sl]
        g_ph = g[:, ph:ph + 1]
        xhat = (yf - mean) * inv
        pre = xhat * gamma + beta
        act = jnp.where(pre >= 0, pre, LEAKY_SLOPE * pre)
        # head out channel = 1: dact[., c] = g[., phase] * wh[c]
        dact = g_ph * wh
        dpre = jnp.where(pre >= 0, dact, LEAKY_SLOPE * dact)

        acc[0, sl] = acc[0, sl] + jnp.sum(act * g_ph, axis=0)   # dWh
        acc[1, sl] = acc[1, sl] + jnp.sum(dpre, axis=0)         # dbeta
        acc[2, sl] = acc[2, sl] + jnp.sum(dpre * xhat, axis=0)  # dgamma
        acc[3, sl] = acc[3, sl] + jnp.sum(dpre * gamma, axis=0)
        acc[4, sl] = acc[4, sl] + jnp.sum(dpre * gamma * xhat, axis=0)
    acc[5] = acc[5] + jnp.full((acc.shape[1],), jnp.sum(g) / acc.shape[1])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _bwd1_call(y: Array, g_ph: Array, mean_p: Array, inv_p: Array,
               gamma_p: Array, beta_p: Array, wh_p: Array) -> Array:
    B, H, W, C4 = y.shape
    mv = jnp.stack([mean_p, inv_p])
    par = jnp.stack([gamma_p, beta_p, wh_p])
    return pl.pallas_call(
        _bwd1_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, 4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, C4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, C4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, C4), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y, g_ph, mv, par)


# ---------------------------------------------------------------------------
# backward pass 2: dy in VMEM -> dx + dWt without materialising dy


def _bwd2_kernel(y_ref, g_ref, xp_ref, mv_ref, par_ref, wdx_ref, red_ref,
                 dx_ref, dm_ref, dbt_ref, accm, accb, dyb):
    """Pass 2: rebuild the packed dy in VMEM (never in HBM), then TWO
    well-shaped MXU matmuls per image — X9^T @ dy for the combined ConvT
    weight-gradient matrix, DY9 @ W_dx for the input gradient (im2col-9
    on both sides, mirroring the forward's single-matmul formulation)."""
    i = pl.program_id(0)
    H, W, C4 = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
    Cin = xp_ref.shape[3]
    Cout = C4 // 4

    @pl.when(i == 0)
    def _():
        accm[:] = jnp.zeros_like(accm)
        accb[:] = jnp.zeros_like(accb)

    g = g_ref[0].reshape(H * W, 4).astype(jnp.float32)
    # per-phase dy into the VMEM scratch (bounded f32 temporaries)
    for ph in range(4):
        sl = slice(ph * Cout, (ph + 1) * Cout)
        yf = y_ref[0, :, :, sl].reshape(H * W, Cout).astype(jnp.float32)
        mean, inv = mv_ref[0, sl], mv_ref[1, sl]
        gamma, beta, wh = (par_ref[0, sl], par_ref[1, sl],
                           par_ref[2, sl])
        xhat = (yf - mean) * inv
        pre = xhat * gamma + beta
        dact = g[:, ph:ph + 1] * wh
        dpre = jnp.where(pre >= 0, dact, LEAKY_SLOPE * dact)
        dy_ph = inv * (dpre * gamma - red_ref[0, sl]
                       - xhat * red_ref[1, sl])
        accb[0, sl] = accb[0, sl] + jnp.sum(dy_ph, axis=0)  # dbt
        dyb[:, sl] = dy_ph

    dt = xp_ref.dtype
    dy16 = dyb[:].astype(dt)  # matmul operands in the model dtype
    # combined weight-gradient matrix: X9^T @ dy  (9*Cin, C4)
    xp = xp_ref[0]
    x9 = jnp.concatenate(
        [xp[1 + oh:1 + oh + H, 1 + ow:1 + ow + W, :].reshape(H * W, Cin)
         for (oh, ow) in OFF9], axis=1)  # (HW, 9*Cin)
    accm[:] = accm[:] + jax.lax.dot_general(
        x9, dy16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # input gradient: im2col-9 of the zero-padded packed dy
    dy_img = dy16.reshape(H, W, C4)
    zrow = jnp.zeros((1, W, C4), dt)
    zcol = jnp.zeros((H + 2, 1, C4), dt)
    dy_pad = jnp.concatenate([zrow, dy_img, zrow], axis=0)
    dy_pad = jnp.concatenate([zcol, dy_pad, zcol], axis=1)
    dy9 = jnp.concatenate(
        [dy_pad[1 + oh:1 + oh + H, 1 + ow:1 + ow + W, :].reshape(
            H * W, C4) for (oh, ow) in OFF9], axis=1)  # (HW, 9*C4)
    dx = jnp.dot(dy9, wdx_ref[:], preferred_element_type=jnp.float32)
    dx_ref[0] = dx.reshape(H, W, Cin).astype(dx_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dm_ref[:] = accm[:]
        dbt_ref[:] = accb[:]


def _bwd2_call(y: Array, g_ph: Array, xp: Array, mean_p, inv_p, gamma_p,
               beta_p, wh_p, m_dxhat, m_dxhat_xhat, Wf: Array,
               x_dtype) -> Tuple[Array, Array, Array]:
    B, H, W, C4 = y.shape
    Cin = xp.shape[3]
    Cout = C4 // 4
    mv = jnp.stack([mean_p, inv_p])
    red = jnp.stack([m_dxhat, m_dxhat_xhat])
    par = jnp.stack([gamma_p, beta_p, wh_p])
    w_dx = _w_dx(Wf, xp.dtype)
    dx, dm, dbt = pl.pallas_call(
        _bwd2_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, 4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 2, W + 2, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C4, Cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, Cin), x_dtype),
            jax.ShapeDtypeStruct((9 * Cin, C4), jnp.float32),
            jax.ShapeDtypeStruct((1, C4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9 * Cin, C4), jnp.float32),
            pltpu.VMEM((1, C4), jnp.float32),
            pltpu.VMEM((H * W, C4), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(y, g_ph, xp, mv, par, w_dx, red)
    return dx, dm, dbt


# ---------------------------------------------------------------------------
# packing helpers (per ORIGINAL channel <-> packed phase-channel layout)


def _pack(v: Array) -> Array:
    """(C,) per-channel -> (4C,) packed (phase-major, matching _PHASES)."""
    return jnp.tile(v, 4)


def _unpack_sum(v: Array, Cout: int) -> Array:
    """(4C,) packed sums -> (C,) summed over the 4 phases."""
    return v.reshape(4, Cout).sum(axis=0)


# ---------------------------------------------------------------------------
# the public op


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_decoder_stage(x, Wt, bt, gamma, beta, Wh, bh):
    """ConvT(5x5,s2) + BatchNorm(train) + LeakyReLU + 1x1 head, fused.

    Same signature/semantics as `decoder_stage_reference` (which is also
    its numerical oracle): returns (out, batch_mean, batch_var).  The
    mean/var outputs feed running-average updates and are treated as
    non-differentiable.
    """
    out, mean, var, *_ = _fwd_impl(x, Wt, bt, gamma, beta, Wh, bh)
    return out, mean, var


def _fwd_impl(x, Wt, bt, gamma, beta, Wh, bh):
    B, H, W, Cin = x.shape
    Cout = Wt.shape[-1]
    N = B * H * W * 4
    Wf = Wt[::-1, ::-1].astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y, s1, s2 = _fwd_call(xp, Wf, bt.astype(x.dtype), x.dtype)
    mean = _unpack_sum(s1[0], Cout) / N
    var = _unpack_sum(s2[0], Cout) / N - mean * mean
    inv = jax.lax.rsqrt(var + BN_EPS)
    # normalize + LeakyReLU + head: ONE fused XLA read of the packed map
    mean_p, inv_p = _pack(mean), _pack(inv)
    gamma_p, beta_p = _pack(gamma), _pack(beta)
    yf = y.astype(jnp.float32)
    act = (yf - mean_p) * inv_p * gamma_p + beta_p
    act = jnp.where(act >= 0, act, LEAKY_SLOPE * act)
    acts = act.reshape(B, H, W, 4, Cout)
    out_ph = jnp.einsum("bhwpc,cd->bhwpd", acts.astype(x.dtype), Wh,
                        preferred_element_type=jnp.float32) + bh
    out = phases_to_image(
        out_ph.reshape(B, H, W, 2, 2, -1)).astype(jnp.float32)
    return out, mean, var, y, xp, inv

def _stage_fwd(x, Wt, bt, gamma, beta, Wh, bh):
    out, mean, var, y, xp, inv = _fwd_impl(x, Wt, bt, gamma, beta, Wh, bh)
    res = (y, xp, mean, var, inv, Wt, gamma, beta, Wh)
    return (out, mean, var), res


def _stage_bwd(res, cts):
    g_out, _g_mean, _g_var = cts  # stats feed running averages: no grad
    y, xp, mean, var, inv, Wt, gamma, beta, Wh = res
    x_dtype = xp.dtype
    B, H, W, C4 = y.shape
    Cout = C4 // 4
    Cin = xp.shape[3]
    N = B * H * W * 4
    Wf = Wt[::-1, ::-1]

    # head cotangent in phase-packed layout: (B, H, W, 4)
    g_ph = jnp.asarray(g_out, jnp.float32).reshape(
        B, H, 2, W, 2, -1).transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, 4)

    mean_p, inv_p = _pack(mean), _pack(inv)
    gamma_p, beta_p = _pack(gamma), _pack(beta)
    wh_p = _pack(Wh.reshape(-1))

    red = _bwd1_call(y, g_ph, mean_p, inv_p, gamma_p, beta_p, wh_p)
    dWh = _unpack_sum(red[0], Cout).reshape(Wh.shape)
    dbeta = _unpack_sum(red[1], Cout)
    dgamma = _unpack_sum(red[2], Cout)
    dbh = (red[5, 0] * C4).reshape(1)  # acc[5] stored sum(g)/C4 per lane
    s_dxhat = _unpack_sum(red[3], Cout) / N
    s_dxhat_xhat = _unpack_sum(red[4], Cout) / N

    dx, dm, dbt_p = _bwd2_call(
        y, g_ph, xp, mean_p, inv_p, gamma_p, beta_p, wh_p,
        _pack(s_dxhat), _pack(s_dxhat_xhat), Wf, x_dtype)
    dbt = _unpack_sum(dbt_p[0], Cout)

    # extract each tap's weight gradient from the combined (9*Cin, C4)
    # matrix: (kh, kw) <-> one (window, phase) block (the _tap_map
    # bijection)
    dWf = jnp.zeros((5, 5, Cin, Cout), jnp.float32)
    for kh, kw, oh, ow, ph in _tap_map():
        r = _idx9(oh, ow) * Cin
        c = ph * Cout
        dWf = dWf.at[kh, kw].add(dm[r:r + Cin, c:c + Cout])
    dWt = dWf[::-1, ::-1].astype(Wt.dtype)

    return (dx, dWt, dbt.astype(jnp.float32),
            dgamma.astype(jnp.float32), dbeta.astype(jnp.float32),
            dWh.astype(jnp.float32), dbh.astype(jnp.float32))


fused_decoder_stage.defvjp(_stage_fwd, _stage_bwd)
