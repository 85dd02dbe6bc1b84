"""Epoch engine: whole-epoch `lax.scan` training, compiled once per shape.

The reference's hot loop crossed the host<->device boundary twice per batch
(`sess.run(fetches, feed_dict)`, `trainers/AE.py:83`).  Here the entire
epoch — batch gather, forward, backward, optimizer update, metric
accumulation — is ONE jitted XLA program: the slice pool lives in HBM, a
per-epoch permutation of batch indices is scanned over, and only the final
per-epoch metric means come back to the host.

Parallelism: the pool is replicated, the gathered batch axis is sharded over
the mesh's 'data' axis, and parameters stay replicated; XLA inserts the
gradient all-reduces (see `parallel/mesh.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import MeshContext
from unsupervised_anomaly_detection_brain_mri_tpu.train.state import TrainState

Array = jnp.ndarray
Batch = Dict[str, Array]
StepFn = Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, Array]]]


def gather_batch(pool: Batch, idx: Array) -> Batch:
    """Gather a batch from the device-resident slice pool."""
    return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), pool)


@dataclasses.dataclass
class EpochCompiler:
    """Caches jitted epoch functions keyed by static step arguments.

    ``step_builder(**static)`` must return a pure ``step(state, batch)``.

    ``log_every_n`` > 0 streams every n-th batch's metrics to the console
    from INSIDE the jitted scan via an async ``jax.debug.callback`` —
    opt-in parity with the reference's per-batch prints
    (`trainers/AE.py:86`); the default epoch program stays callback-free.

    ``tb_every`` > 0 additionally emits mid-epoch TensorBoard summaries —
    scalars plus an input|reconstruction|L1 image grid — every n-th batch,
    parity with the reference's ``tfSummaryAfter``-gated
    ``log_to_tensorboard`` (`trainers/AEMODEL.py:37-42`,
    `trainers/DLMODEL.py:24`).  The grid's reconstruction comes from
    ``visual_fn(state, batch)`` (an eval-mode forward on a few slices),
    computed under a ``lax.cond`` so non-logging batches pay nothing; the
    host write happens in the async ``tb_hook`` callback.
    """

    step_builder: Callable[..., StepFn]
    mesh: Optional[MeshContext] = None
    log_every_n: int = 0
    tb_every: int = 0
    tb_hook: Optional[Callable] = None
    visual_fn: Optional[Callable] = None

    def __post_init__(self) -> None:
        self._cache: Dict[Any, Callable] = {}

    def _build(self, static_key: Tuple) -> Callable:
        step = self.step_builder(**dict(static_key))
        every = int(self.log_every_n)
        tb_every = int(self.tb_every) if self.tb_hook is not None else 0

        def _host_log(step_no, metrics):  # pragma: no cover - host print
            if int(step_no) % every == 0:
                msg = " ".join(f"{k}: {float(v):.6f}"
                               for k, v in sorted(metrics.items()))
                print(f"  batch [{int(step_no):6d}] {msg}", flush=True)

        def epoch(state: TrainState, pool: Batch, idxs: Array):
            def body(state, batch_idx):
                batch = gather_batch(pool, batch_idx)
                if self.mesh is not None:
                    sh = self.mesh.batch_sharding()
                    batch = jax.tree_util.tree_map(
                        lambda a: jax.lax.with_sharding_constraint(a, sh),
                        batch)
                state, metrics = step(state, batch)
                if every > 0:
                    jax.debug.callback(_host_log, state.step, metrics)
                if tb_every > 0:
                    def _emit(_):
                        x = batch["x"][:8]
                        rec = (self.visual_fn(state, batch)
                               if self.visual_fn is not None else x)
                        jax.debug.callback(self.tb_hook, state.step,
                                           metrics, x, rec[:8])
                        return 0
                    # lax.cond executes only the taken branch: non-logging
                    # batches run neither the visual forward nor the
                    # device->host image transfer
                    jax.lax.cond(state.step % tb_every == 0,
                                 _emit, lambda _: 0, 0)
                return state, metrics

            state, metrics = jax.lax.scan(body, state, idxs)
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        return jax.jit(epoch, donate_argnums=(0,))

    def __call__(self, state: TrainState, pool: Batch, idxs: Array,
                 **static: Any):
        key = tuple(sorted(static.items()))
        if key not in self._cache:
            self._cache[key] = self._build(key)
        return self._cache[key](state, pool, idxs)


def epoch_indices(rng: np.random.Generator, n: int, batchsize: int,
                  shuffle: bool = True) -> np.ndarray:
    """Per-epoch (num_batches, batchsize) index matrix.

    Parity with the reference batching: ``num_batches = n // batchsize``
    (`dataloaders/BRAINWEB.py:406-409`), in-place shuffle each epoch
    (`:411-478`); the remainder slices are dropped for static shapes (the
    reference wrapped them into the next epoch instead — a documented
    deviation that keeps every XLA buffer static).
    """
    num_batches = n // batchsize
    idx = rng.permutation(n) if shuffle else np.arange(n)
    idx = idx[: num_batches * batchsize]
    return idx.reshape(num_batches, batchsize).astype(np.int32)


def early_stopping_update(val_loss: float, best_cost: float,
                          last_improvement: int, patience: int = 5
                          ) -> Tuple[float, int, bool]:
    """Parity with `trainers/AEMODEL.py:70-79` (patience 5 on val loss)."""
    if val_loss < best_cost:
        return val_loss, 0, False
    last_improvement += 1
    return best_cost, last_improvement, last_improvement >= patience
