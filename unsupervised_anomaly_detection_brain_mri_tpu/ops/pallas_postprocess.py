"""Pallas TPU kernel: fused residual post-processing.

Fuses the whole per-voxel eval recipe of `utils/Evaluation.py` —
positive/abs residual (:283-287), eroded-brainmask multiply (:84-89),
hyperintensity-prior zeroing (:288-289), and the 5^3 median filter
(:108-110) — into ONE kernel: one HBM read of (x, rec, mask) and one HBM
write of the filtered residual.  The unfused pipeline costs ~5 reads +
3 writes per voxel (residual pass, host-side symmetric pad copy, median
slab read/write); the fused kernel costs 3 reads + 1 write and never
materialises the intermediate residual volume.

Median semantics match scipy's 'reflect' border EXACTLY under the gate
below, via two observations:
  * slice axis (S): the host gathers the input slabs with symmetric
    padding, and every fused op is pointwise per-voxel, so the in-kernel
    residual of the padded slab IS the padded residual;
  * H/W axes: zero-border binary erosion with n iterations always zeroes
    an n-pixel shell at the image border (the out-of-image zeros propagate
    inward one pixel per iteration), so for n >= kernel//2 the masked
    residual is zero everywhere the median window reaches past the image —
    reflect padding and zero padding are then identical.
Callers must therefore only use this kernel when the residual was masked
by a brainmask eroded with >= kernel//2 zero-border iterations
(`fused_gate_ok`); `eval/evaluate.py` falls back to the XLA composition
otherwise.

The erosion itself stays OUTSIDE the kernel (the eroded mask is an input):
the eval driver also needs it on the host for MC-dropout masking, so
fusing it would recompute a mask that is already resident.

The median itself reuses the value-bisection selection of
`ops/pallas_median.py` (count-below-threshold per round; ~32 VPU rounds to
float32 resolution on [0,1] data) rather than a 125-way sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_gate_ok(erode_brainmask: bool, erosion_iters: int,
                  median_filtering: bool, kernel: int = 5) -> bool:
    """True when the fused kernel's zero-shell precondition holds (see
    module docstring): mask eroded with at least kernel//2 zero-border
    iterations, and the median is actually requested."""
    return bool(median_filtering and erode_brainmask
                and erosion_iters >= kernel // 2)


def _fused_kernel(kernel: int, cs: int, H: int, W: int, iters: int,
                  keep_only_positive: bool):
    r = kernel // 2

    def body(q_ref, x_hbm, rec_hbm, mask_hbm, out_ref,
             xs, rs, ms, sems):
        i = pl.program_id(0)
        sl = pl.ds(i * cs, cs + 2 * r)
        copies = [
            pltpu.make_async_copy(x_hbm.at[sl], xs, sems.at[0]),
            pltpu.make_async_copy(rec_hbm.at[sl], rs, sems.at[1]),
            pltpu.make_async_copy(mask_hbm.at[sl], ms, sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        x = xs[:]
        if keep_only_positive:
            diff = jnp.maximum(x - rs[:], 0.0)
        else:
            diff = jnp.abs(x - rs[:])
        # eroded-brainmask multiply + hyperintensity prior; q = -inf
        # disables the prior without a recompile
        diff = jnp.where(x < q_ref[0, 0], 0.0, diff * ms[:])

        def shifted(b, c):
            """Window origin (b, c) in [0, kernel): value at (y, x) is
            diff[y + b - r, x + c - r].  pltpu.roll only takes
            non-negative shifts; wrap-around rows/cols land in the >= H+r
            (>= W+r) zero region, which the gate guarantees is dead."""
            v = diff
            ob, oc = b - r, c - r
            if ob:
                v = pltpu.roll(v, (v.shape[1] - ob) % v.shape[1], 1)
            if oc:
                v = pltpu.roll(v, (v.shape[2] - oc) % v.shape[2], 2)
            return v[:, :H, :W]

        planes = [shifted(b, c) for b in range(kernel)
                  for c in range(kernel)]

        lo = planes[0][0:cs]
        hi = planes[0][0:cs]
        for p in planes:
            for a in range(kernel):
                v = p[a: a + cs]
                lo = jnp.minimum(lo, v)
                hi = jnp.maximum(hi, v)

        need = float((kernel ** 3) // 2 + 1)

        def bisect(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            cnt = jnp.zeros_like(mid)
            for p in planes:
                for a in range(kernel):
                    cnt = cnt + (p[a: a + cs] <= mid).astype(jnp.float32)
            below = cnt >= need
            return jnp.where(below, lo, mid), jnp.where(below, mid, hi)

        lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
        out_ref[:] = hi

    return body


@functools.partial(jax.jit, static_argnames=(
    "keep_only_positive", "kernel", "cs", "iters", "interpret"))
def fused_residual_median_pallas(
    x: Array, rec: Array, eroded_mask: Array, prior_q: Array,
    *, keep_only_positive: bool = True, kernel: int = 5, cs: int = 2,
    iters: int = 32, interpret: bool = False,
) -> Array:
    """Fused [residual -> mask -> prior -> k^3 median] on TPU via Pallas.

    x, rec, eroded_mask: (S, H, W) float32; prior_q: scalar (pass -inf to
    disable the hyperintensity prior).  Requires `fused_gate_ok` (mask is
    zero within kernel//2 pixels of the H/W image border).
    """
    assert kernel % 2 == 1
    r = kernel // 2
    S, H, W = x.shape
    n_chunks = -(-S // cs)
    S_pad = n_chunks * cs

    # slice-axis symmetric halo (scipy 'reflect'), then edge-pad up to a
    # chunk multiple (extra output slices are dropped); H/W zero-padded to
    # sublane/lane multiples with >= r dead rows/cols for the roll wrap
    HP = _round_up(H + r, 8)
    WP = _round_up(W + r, 128)

    def prep(v: Array) -> Array:
        v = jnp.pad(v.astype(jnp.float32), ((r, r), (0, 0), (0, 0)),
                    mode="symmetric")
        return jnp.pad(v, ((0, S_pad - S), (0, HP - H), (0, WP - W)),
                       mode="constant")

    out = pl.pallas_call(
        _fused_kernel(kernel, cs, H, W, iters, keep_only_positive),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((cs, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cs + 2 * r, HP, WP), jnp.float32),
            pltpu.VMEM((cs + 2 * r, HP, WP), jnp.float32),
            pltpu.VMEM((cs + 2 * r, HP, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(jnp.asarray(prior_q, jnp.float32).reshape(1, 1),
      prep(x), prep(rec), prep(eroded_mask))
    return out[:S]


def fused_residual_median_xla(
    x: Array, rec: Array, eroded_mask: Array, prior_q: Array,
    *, keep_only_positive: bool = True, kernel: int = 5,
) -> Array:
    """XLA oracle with identical semantics (reference composition:
    `Evaluation.py:283-289` then `:108-110`)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.ops.postprocess import (
        median_filter_3d,
    )

    if keep_only_positive:
        diff = jnp.maximum(x - rec, 0.0)
    else:
        diff = jnp.abs(x - rec)
    diff = jnp.where(x < prior_q, 0.0, diff * eroded_mask.astype(diff.dtype))
    return median_filter_3d(diff, kernel)


def fused_residual_median_auto(
    x: Array, rec: Array, eroded_mask: Array, prior_q: Array,
    *, erosion_iterations: int, keep_only_positive: bool = True,
    kernel: int = 5,
) -> Array:
    """Pallas on TPU when the zero-shell precondition provably holds
    (``erosion_iterations`` = the zero-border erosion count that produced
    ``eroded_mask``), XLA composition otherwise."""
    if (jax.default_backend() == "tpu"
            and fused_gate_ok(True, erosion_iterations, True, kernel)):
        return fused_residual_median_pallas(
            x, rec, eroded_mask, prior_q,
            keep_only_positive=keep_only_positive, kernel=kernel)
    return fused_residual_median_xla(
        x, rec, eroded_mask, prior_q,
        keep_only_positive=keep_only_positive, kernel=kernel)
