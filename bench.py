#!/usr/bin/env python
"""Benchmark: AE training throughput (slices/sec/chip) on BrainWeb-shaped data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured configuration mirrors the reference's flagship experiment
(`mains/main_AE.py`: dense AE, 128x128 slices, batch 128, Adam 1e-4).

``vs_baseline`` compares the TPU-native path (whole-epoch `lax.scan`,
device-resident pool, bf16 convs) against a faithfully TF1-shaped execution
of the SAME model on the SAME chip: per-batch dispatch with host->device
feed and per-batch metric fetch (`trainers/AE.py:63-90` crossed the
host boundary twice per step) in f32.  This isolates the framework design
delta from hardware differences.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer
    from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
        epoch_indices,
    )

    B, H = 128, 128
    n_slices = 1024
    host_rng = np.random.default_rng(0)
    pool_np = host_rng.uniform(0, 1, (n_slices, H, H, 1)).astype(np.float32)

    # ---- TPU-native path: jitted epoch scan over a device-resident pool
    cfg = Config(trainer="AE", model="autoencoder", batchsize=B,
                 outputWidth=H, outputHeight=H, zDim=128, numEpochs=1)
    tr = get_trainer("AE")(cfg)
    state = tr.init_state()
    pool = {"x": jnp.asarray(pool_np)}

    def run_epoch(state):
        idxs = jnp.asarray(epoch_indices(host_rng, n_slices, B))
        return tr._train_compiler(state, pool, idxs), idxs.size

    (state, m), _ = run_epoch(state)  # compile + warmup
    _ = float(m["loss"])  # full sync (block_until_ready is a no-op through
    # the remote-TPU tunnel; a value fetch forces completion)
    t0 = time.perf_counter()
    n_epochs = 4
    total = 0
    for _ in range(n_epochs):
        (state, m), n = run_epoch(state)
        total += n
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    native_sps = total / dt

    # ---- TF1-shaped baseline: same chip, per-batch host feed + fetch, f32
    cfg_b = cfg.replace(compute_dtype="float32")
    tr_b = get_trainer("AE")(cfg_b)
    state_b = tr_b.init_state()
    step = jax.jit(tr_b._build_train_step())

    def run_baseline_steps(state_b, n_steps):
        idxs = epoch_indices(host_rng, n_slices, B)
        n = 0
        for row in idxs[:n_steps]:
            batch_np = pool_np[row]  # host-side batch assembly (feed_dict)
            batch = {"x": jnp.asarray(batch_np)}  # host->device
            state_b, metrics = step(state_b, batch)
            _ = float(metrics["loss"])  # device->host fetch per step
            n += row.size
        return state_b, n

    state_b, _ = run_baseline_steps(state_b, 2)  # compile + warmup
    t0 = time.perf_counter()
    state_b, nb = run_baseline_steps(state_b, 8)
    dt_b = time.perf_counter() - t0
    baseline_sps = nb / dt_b

    print(json.dumps({
        "metric": "brainweb_ae_train_throughput",
        "value": round(native_sps, 1),
        "unit": "slices/sec/chip",
        "vs_baseline": round(native_sps / baseline_sps, 2),
        "detail": {
            "native_slices_per_sec": round(native_sps, 1),
            "tf1_shaped_baseline_slices_per_sec": round(baseline_sps, 1),
            "batch": B, "image": H, "model": "autoencoder",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
