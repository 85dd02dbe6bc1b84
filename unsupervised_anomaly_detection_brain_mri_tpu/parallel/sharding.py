"""Parameter sharding rules: tensor parallelism as a config knob.

The models here are small convnets, so TP defaults to 1 (SURVEY.md 2.8);
but the sharding layer is real: with ``MeshConfig.model > 1`` the widest
parameters are partitioned over the 'model' axis via NamedSharding and XLA
GSPMD inserts the collectives.  Rules:

  * Dense kernels (in, out): shard the OUT axis (column parallel) when
    divisible by the model-axis size;
  * Conv kernels (kh, kw, in, out): shard the OUT channel axis;
  * biases/scales and anything indivisible: replicated.

Batch-stats and optimizer states follow their parameters automatically
(optimizer state mirrors the param tree structure).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
    MODEL_AXIS,
    MeshContext,
)


def _spec_for(path, leaf, n_model: int) -> P:
    if n_model <= 1:
        return P()
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape = leaf.shape
    if name == "kernel" and len(shape) >= 2 and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def param_shardings(ctx: MeshContext, params: Any) -> Any:
    """NamedSharding tree for a parameter pytree."""
    n_model = ctx.n_model

    def fn(path, leaf):
        return NamedSharding(ctx.mesh, _spec_for(path, leaf, n_model))

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_params(ctx: MeshContext, params: Any) -> Any:
    """Device-put parameters with TP shardings (replicates when model=1)."""
    shardings = param_shardings(ctx, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_like_params(ctx: MeshContext, params: Any, tree: Any) -> Any:
    """Shard a pytree with the same structure as params (optimizer moments):
    leaves whose shape matches the corresponding param get its sharding,
    everything else is replicated."""
    shardings = param_shardings(ctx, params)
    flat_sh = {tuple(str(k) for k in path): s
               for path, s in jax.tree_util.tree_flatten_with_path(
                   shardings)[0]}
    flat_shape = {tuple(str(k) for k in path): np.shape(p)
                  for path, p in jax.tree_util.tree_flatten_with_path(
                      params)[0]}

    def fn(path, leaf):
        key = tuple(str(k) for k in path)
        # optimizer states often nest the param tree under extra levels;
        # match on the suffix — AND require the shape to actually equal the
        # param's (factored/reduced moments like adafactor's v_row share
        # the path but not the shape; mis-sharding them fails device_put)
        for pk, s in flat_sh.items():
            if (key[-len(pk):] == pk and hasattr(leaf, "shape")
                    and tuple(leaf.shape) == tuple(flat_shape[pk])):
                return jax.device_put(leaf, s)
        return jax.device_put(leaf, ctx.replicated())

    return jax.tree_util.tree_map_with_path(fn, tree)
