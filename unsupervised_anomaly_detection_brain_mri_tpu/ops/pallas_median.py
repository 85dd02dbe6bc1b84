"""Pallas TPU kernel: 3-D median filter (5^3) via bisection selection.

The XLA path (`ops.postprocess.median_filter_3d`) materialises a 125-way
stacked tensor and sorts it — O(k^3 log k^3) compare-exchanges per voxel
plus k^3x the memory traffic.  This kernel instead finds the median by
VALUE BISECTION: ~`iters` rounds of counting how many of the 125
neighbourhood values lie below a threshold (pure VPU compare+add, no sort
primitive needed), converging to float32 precision in ~32 rounds.  Memory
traffic is one slab read + one block write per output block, staged
HBM->VMEM with an async copy.

TPU layout notes: the H (sublane) and W (lane) window shifts are realised
with `pltpu.roll` + offset-0 slices — Mosaic cannot slice the tiled minor
dims at arbitrary offsets.  H and W are padded to sublane/lane multiples on
the host; the S (leading, untiled) axis is sliced directly.

Accuracy: result is within (hi-lo)*2^-iters of the exact neighbourhood
median; with iters=32 on [0,1] data this is exact at float32 resolution
(validated against scipy in interpreter mode and on hardware).
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


def _median_kernel(kernel: int, cs: int, H: int, W: int, iters: int):
    r = kernel // 2

    def body(in_hbm, out_ref, slab, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            in_hbm.at[pl.ds(i * cs, cs + 2 * r)], slab, sem)
        dma.start()
        dma.wait()

        full = slab[:]

        def shifted(b, c):
            """Window origin (b, c): roll sublane/lane axes then read the
            offset-0 (H, W) tile.  pltpu.roll needs non-negative shifts, so
            a left-shift by b is a circular shift by (size - b)."""
            v = full
            if b:
                v = pltpu.roll(v, v.shape[1] - b, 1)
            if c:
                v = pltpu.roll(v, v.shape[2] - c, 2)
            return v[:, :H, :W]

        planes = [shifted(b, c) for b in range(kernel)
                  for c in range(kernel)]  # each (cs + 2r, H, W)

        lo = planes[0][0:cs]
        hi = planes[0][0:cs]
        for p in planes:
            for a in range(kernel):
                v = p[a: a + cs]
                lo = jnp.minimum(lo, v)
                hi = jnp.maximum(hi, v)

        need = float((kernel ** 3) // 2 + 1)  # 63 of 125 <= median

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


@functools.partial(jax.jit, static_argnames=("kernel", "cs", "iters",
                                             "interpret"))
def median_filter_3d_pallas(vol: Array, kernel: int = 5, cs: int = 2,
                            iters: int = 32, interpret: bool = False
                            ) -> Array:
    """Median-filter a (S, H, W) float32 volume on TPU via Pallas.

    Border mode matches scipy's 'reflect' (numpy 'symmetric'), like the XLA
    path.  ``cs`` output slices are produced per grid step.
    """
    assert kernel % 2 == 1
    r = kernel // 2
    S, H, W = vol.shape
    n_chunks = -(-S // cs)
    S_pad = n_chunks * cs
    padded = jnp.pad(vol.astype(jnp.float32), r, mode="symmetric")
    # pad H/W up to sublane/lane multiples; extra values sit beyond the
    # window reach and are never read
    HP = _round_up(H + 2 * r, 8)
    WP = _round_up(W + 2 * r, 128)
    padded = jnp.pad(padded, (
        (0, S_pad - S), (0, HP - (H + 2 * r)), (0, WP - (W + 2 * r))),
        mode="edge")

    out = pl.pallas_call(
        _median_kernel(kernel, cs, H, W, iters),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((cs, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cs + 2 * r, HP, WP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:S]


def median_filter_3d_auto(vol: Array, kernel: int = 5) -> Array:
    """Pallas on TPU, XLA fallback elsewhere."""
    from unsupervised_anomaly_detection_brain_mri_tpu.ops.postprocess import (
        median_filter_3d,
    )

    if jax.default_backend() == "tpu":
        return median_filter_3d_pallas(vol, kernel)
    return median_filter_3d(vol, kernel)
