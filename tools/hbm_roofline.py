#!/usr/bin/env python
"""HBM roofline measurement for the parity AE train step (VERDICT r2 #1).

Answers: is the parity-architecture train step already at the achievable
HBM-bandwidth floor?  (Round-3 answer: no — 12% of achievable; the waste
was XLA's ConvT-gradient reverse, since removed by ops/convt.py.)

Method:
  1. Measure ACHIEVABLE HBM bandwidth with streaming microbenchmarks
     (copy / triad at several sizes, best-of-N) — the practical peak,
     not the datasheet number.
  2. Measure the AE train epoch's device-side time (marginal slope
     between 4- and 16-epoch runs, cancelling tunnel dispatch latency)
     and take its bytes-accessed from XLA cost analysis.
  3. Report utilization = (bytes/epoch / epoch_time) / achievable_BW.

Prints one JSON line; also usable as `python tools/hbm_roofline.py`.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TRIALS = 3


def _time_best(fn, n_calls: int) -> float:
    """Best wall-clock of TRIALS runs of n_calls dispatches (forced)."""
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        fn(n_calls)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_peak_bw() -> dict:
    """Streaming bandwidth: copy (R+W) and triad (2R+W) on large arrays.

    Passes are CHAINED inside one jitted fori_loop (one tunnel dispatch
    covers k device passes) and the 4- vs 16-pass marginal slope cancels
    the dispatch latency — per-call timing under-reported the achievable
    bandwidth ~3x through the tunnel."""
    from functools import partial

    out = {}

    @partial(jax.jit, static_argnums=1)
    def copy_k(a, k):
        return jax.lax.fori_loop(0, k, lambda i, v: v * 1.000001, a)

    @partial(jax.jit, static_argnums=2)
    def triad_k(a, b, k):
        return jax.lax.fori_loop(0, k, lambda i, v: b + 0.5 * v, a)

    for mb in (256, 512):
        n = mb * 1024 * 1024 // 4
        x = jnp.arange(n, dtype=jnp.float32) * 1e-9
        y = jnp.ones((n,), jnp.float32)

        for name, passes, fn in (
                ("copy", 2, lambda k: copy_k(x, k)),
                ("triad", 3, lambda k: triad_k(x, y, k))):
            _ = float(fn(4)[0]); _ = float(fn(16)[0])  # compile both
            t4 = _time_best(lambda _=None: float(fn(4)[0]), 1)
            t16 = _time_best(lambda _=None: float(fn(16)[0]), 1)
            per_pass = max((t16 - t4) / 12.0, 1e-9)
            out[f"{name}_{mb}MB_GBps"] = round(
                passes * x.nbytes / per_pass / 1e9, 1)
    out["achievable_GBps"] = max(out.values())
    return out


def measure_ae_step(B=128, H=128, n_slices=1024) -> dict:
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer
    from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
        epoch_indices,
    )

    host_rng = np.random.default_rng(0)
    pool = {"x": jnp.asarray(host_rng.uniform(
        0, 1, (n_slices, H, H, 1)).astype(np.float32))}
    cfg = Config(trainer="AE", model="autoencoder", batchsize=B,
                 outputWidth=H, outputHeight=H, zDim=128, numEpochs=1)
    tr = get_trainer("AE")(cfg)
    holder = [tr.init_state()]

    def run(n_epochs: int):
        state = holder[0]
        for _ in range(n_epochs):
            idxs = jnp.asarray(epoch_indices(host_rng, n_slices, B))
            state, m = tr._train_compiler(state, pool, idxs)
        _ = float(m["loss"])
        holder[0] = state

    run(1)  # compile + warmup
    t4 = _time_best(run, 4)
    t16 = _time_best(run, 16)
    epoch_sec = (t16 - t4) / 12.0  # marginal device-side epoch time

    idxs0 = jnp.asarray(epoch_indices(host_rng, n_slices, B))
    jitted = next(iter(tr._train_compiler._cache.values()))
    compiled = jitted.lower(holder[0], pool, idxs0).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    bytes_epoch = float(ca.get("bytes accessed", 0.0))
    out = {
        "epoch_sec_marginal": round(epoch_sec, 4),
        "bytes_accessed_per_epoch_GB": round(bytes_epoch / 1e9, 3),
        "flops_per_epoch_G": round(float(ca.get("flops", 0.0)) / 1e9, 1),
        "slices_per_sec": round(n_slices / epoch_sec, 1),
    }
    # bytes-accessed breakdown sanity: the analytic big-map traffic.
    # Last decoder stage map: B x H x H x 32 bf16
    out["last_stage_map_MB"] = round(B * H * H * 32 * 2 / 1e6, 1)
    if bytes_epoch > 0 and epoch_sec > 0:
        out["achieved_GBps"] = round(bytes_epoch / epoch_sec / 1e9, 1)
    return out


def main():
    dev = jax.devices()[0]
    res = {"device": str(dev)}
    res["peak"] = measure_peak_bw()
    res["ae"] = measure_ae_step()
    if "achieved_GBps" in res["ae"]:
        res["hbm_utilization_pct"] = round(
            100.0 * res["ae"]["achieved_GBps"]
            / res["peak"]["achievable_GBps"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
