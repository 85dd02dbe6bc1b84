"""Sharded volume post-processing: halo-exchange median filtering.

The reference processed eval volumes serially on one device
(`utils/Evaluation.py:223`); here the slice axis of a volume is sharded
over the mesh's 'data' axis — the framework's sequence/context-parallel
equivalent (SURVEY.md section 2.8).  The 5^3 median needs a 2-slice halo,
exchanged between neighbouring shards with `jax.lax.ppermute` inside
`shard_map`; the volume boundaries use the same 'symmetric' padding as the
single-device path, so the sharded result is bit-identical to
`ops.postprocess.median_filter_3d`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from unsupervised_anomaly_detection_brain_mri_tpu.ops.postprocess import (
    median_from_slab,
)
from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
    DATA_AXIS,
    MeshContext,
)

Array = jnp.ndarray


def sharded_median_filter_3d(ctx: MeshContext, vol: Array,
                             kernel: int = 5) -> Array:
    """Median-filter a (S, H, W) volume with S sharded over 'data'.

    S must be divisible by the data-axis size and each shard must hold at
    least ``kernel // 2`` slices.
    """
    r = kernel // 2
    n = ctx.n_data
    S = vol.shape[0]
    if S % n:
        raise ValueError(f"slice axis {S} not divisible by data axis {n}")
    if S // n < r:
        raise ValueError(f"shard of {S // n} slices < halo {r}")
    mesh = ctx.mesh

    @partial(shard_map, mesh=mesh, in_specs=P(DATA_AXIS, None, None),
             out_specs=P(DATA_AXIS, None, None))
    def f(local: Array) -> Array:
        idx = jax.lax.axis_index(DATA_AXIS)
        perm_from_left = [(i, (i + 1) % n) for i in range(n)]
        perm_from_right = [(i, (i - 1) % n) for i in range(n)]
        # receive the left neighbour's last r slices / right's first r
        from_left = jax.lax.ppermute(local[-r:], DATA_AXIS, perm_from_left)
        from_right = jax.lax.ppermute(local[:r], DATA_AXIS, perm_from_right)
        # volume boundaries: numpy-'symmetric' padding (reversed edge
        # slices), matching the single-device reflect mode
        sym_left = local[:r][::-1]
        sym_right = local[-r:][::-1]
        left = jnp.where(idx == 0, sym_left, from_left)
        right = jnp.where(idx == n - 1, sym_right, from_right)
        slab = jnp.concatenate([left, local, right], axis=0)
        slab = jnp.pad(slab, ((0, 0), (r, r), (r, r)), mode="symmetric")
        return median_from_slab(slab, local.shape[0], kernel)

    sharding = NamedSharding(mesh, P(DATA_AXIS, None, None))
    return f(jax.device_put(vol, sharding))
