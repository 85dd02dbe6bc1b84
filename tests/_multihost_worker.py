"""Multi-process worker for the multi-host input-path test.

Run as: python tests/_multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices and loads a DISTINCT local shard of
the global batch; `global_batch_from_local` must stitch them into the same
global array a single process would produce with `shard_batch`.  Verified
via a jitted global reduction (psum over the sharded batch axis) and via
per-shard value checks on the addressable shards.
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from unsupervised_anomaly_detection_brain_mri_tpu.config import MeshConfig  # noqa: E402
from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (  # noqa: E402
    global_batch_from_local,
    make_mesh,
)

n_local = jax.local_device_count()
n_total = jax.device_count()
assert n_total == nprocs * n_local, (n_total, nprocs, n_local)

ctx = make_mesh(MeshConfig(data=n_total, model=1))

# the global batch is row i = [i, i, ...]; this process loads its own rows
global_batch = 2 * n_total
rows_per_proc = global_batch // nprocs
lo = pid * rows_per_proc
local = np.arange(lo, lo + rows_per_proc, dtype=np.float32)[:, None] * np.ones(
    (1, 8), np.float32)

batch = global_batch_from_local(ctx, {"x": local})
x = batch["x"]
assert x.shape == (global_batch, 8), x.shape

# global reduction across all shards must see every row exactly once
total = float(jax.jit(lambda a: jnp.sum(a))(x))
expected = 8 * sum(range(global_batch))
assert total == expected, (total, expected)

# each addressable shard holds exactly the rows its device owns
for shard in x.addressable_shards:
    r = shard.index[0]
    vals = np.asarray(shard.data)
    rows = np.arange(r.start if r.start else 0, r.stop)
    np.testing.assert_array_equal(vals, rows[:, None] * np.ones((1, 8)))

print(f"worker {pid}: OK ({n_local} local / {n_total} global devices)")
