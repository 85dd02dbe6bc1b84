"""Device mesh construction and sharding rules.

TPU-native scaling layer (no reference equivalent — the reference ran a
single `tf.Session()` on one device, `run.py:50`).  Design follows the
standard JAX recipe: build a `jax.sharding.Mesh` with ``(data, model)``
axes, annotate batch arrays with ``P('data', ...)`` and parameters as
replicated (or sharded over 'model' for tensor parallelism), and let XLA
insert the collectives over ICI.

All entry points accept an explicit device list so tests can run on a
virtual 8-device CPU mesh (``--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unsupervised_anomaly_detection_brain_mri_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass
class MeshContext:
    """A mesh plus the standard shardings derived from it."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    def batch_sharding(self) -> NamedSharding:
        """Shard the leading (batch) axis over the data axis."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch: Any) -> Any:
        """Device-put a host batch with the batch axis sharded over 'data'."""
        s = self.batch_sharding()
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), batch)

    def replicate(self, tree: Any) -> Any:
        s = self.replicated()
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence[Any]] = None) -> MeshContext:
    """Build a ``(data, model)`` mesh from all (or the given) devices.

    ``config.data is None`` means "all remaining devices after the model
    axis".  A single-device mesh is valid and produces no collectives.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n_model = max(1, int(config.model))
    if len(devices) % n_model:
        raise ValueError(
            f"{len(devices)} devices not divisible by model={n_model}")
    n_data = config.data or len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return MeshContext(mesh=Mesh(devs, (DATA_AXIS, MODEL_AXIS)))


def global_batch_from_local(ctx: MeshContext, local_batch: Any) -> Any:
    """Assemble a globally-sharded batch from per-process (per-host) local
    data — the multi-host input path: each host loads its own slice shard
    and the global array is stitched along the batch axis
    (`jax.make_array_from_process_local_data`).  On a single process this
    is equivalent to ``shard_batch``."""
    sharding = ctx.batch_sharding()
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)),
        local_batch)


def pad_batch_to(batch: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the batch axis up to a multiple (for even sharding).

    The pad can exceed the batch size (e.g. 3 rows on an 8-way data mesh
    needs 5 pad rows), so the source is tiled as many times as needed."""
    b = batch.shape[0]
    rem = b % multiple
    if rem == 0:
        return batch
    pad = multiple - rem
    reps = -(-pad // b)  # ceil: enough copies to cover the pad
    filler = np.concatenate([batch] * reps, axis=0)[:pad]
    return np.concatenate([batch, filler], axis=0)
