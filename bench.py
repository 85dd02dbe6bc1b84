#!/usr/bin/env python
"""Benchmark: AE training throughput (slices/sec/chip) on BrainWeb-shaped data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured configuration mirrors the reference's flagship experiment
(`mains/main_AE.py`: dense AE, 128x128 slices, batch 128, Adam 1e-4).

``vs_baseline`` compares the TPU-native path (whole-epoch `lax.scan`,
device-resident pool, bf16 convs) against a faithfully TF1-shaped execution
of the SAME model on the SAME chip: per-batch dispatch with host->device
feed and per-batch metric fetch (`trainers/AE.py:63-90` crossed the host
boundary twice per step) in f32.  This isolates the framework design delta
from hardware differences.

Section ordering is part of the contract: sections run in RECORD-
CRITICALITY order (headline AE + TF1 baseline, parity MFU, the default
fast-profile trio incl. marginal + MFU, batched GMVAE/VAE_You
restoration, Pallas median, eval pipeline + metric sweep, ConvT
ablation, AAE + per-update — every key README quotes — then the
family rows the record does not quote: VAE, fAnoGAN, AnoVAEGAN).
Every completed row is already flushed into the watchdog's
partial dict, so a tunnel hang or budget overrun only ever costs
trailing sections — never the rows the published record depends on.

The remote-TPU tunnel adds large, variable latency and
``block_until_ready`` does not wait through it — every timing forces a
value fetch, and each measurement takes the best of ``TRIALS`` runs.
"""

import json
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

TRIALS = 2  # best-of-2: bounded runtime under the driver's bench timeout

# watchdog: the remote-TPU tunnel can hang mid-call for minutes; if that
# happens late in the run, emit the headline JSON from what was already
# measured instead of timing out with nothing.  SIGALRM handles hangs
# between Python bytecodes; a daemon-thread timer backstops hangs inside
# C-level waits (e.g. a blocking transport call), where CPython cannot
# deliver the signal to the main thread.  Normal warm runtime is ~350 s
# (persistent compilation cache).
WATCHDOG_SECS = int(os.environ.get("UADMRI_BENCH_WATCHDOG_SECS", "540"))
_partial = {"value": None, "vs_baseline": None, "detail": None,
            "section": "startup"}
_reported = threading.Event()
# per-section wall seconds, recorded into the detail dict (shared by
# reference, so watchdog partials carry it too): makes a truncated
# capture say exactly how far the budget reached, and tells the next
# tuning pass where the runtime actually goes
_SECTION_SECS = {}
_section_t0 = [time.perf_counter()]


def _section(name: str) -> None:
    """Mark the bench section now in flight, so a watchdog-emitted partial
    record says WHERE the tunnel hang happened (and that the in-flight
    section's own rows may be noise-poisoned by the degrading tunnel).
    Also closes the wall-clock bucket of the section just finished."""
    now = time.perf_counter()
    _SECTION_SECS[_partial["section"]] = round(now - _section_t0[0], 1)
    _section_t0[0] = now
    _partial["section"] = name


def _emit_headline(note: str) -> None:
    if _reported.is_set():
        return
    _reported.set()
    print(json.dumps({
        "metric": "brainweb_ae_train_throughput",
        "value": _partial["value"] or 0.0,
        "unit": "slices/sec/chip",
        "vs_baseline": _partial["vs_baseline"] or 0.0,
        "detail": {**(_partial["detail"] or {}), "watchdog": note},
    }), flush=True)


def _hang_note() -> str:
    if _partial["value"] is not None:
        return (f"tunnel hang during [{_partial['section']}] - partial "
                f"results; rows from that section may be noise-poisoned")
    return ("device unreachable - no measurement completed "
            "(remote-TPU tunnel down?)")


def _watchdog(signum, frame):  # pragma: no cover - only fires on hangs
    _emit_headline(_hang_note())
    raise SystemExit(0 if _partial["value"] is not None else 1)


def _thread_watchdog():  # pragma: no cover - only fires on C-level hangs
    _emit_headline(_hang_note())
    os._exit(0 if _partial["value"] is not None else 1)


def _best_throughput(fn, units_per_call: int, n_calls: int) -> float:
    best = 0.0
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        fn(n_calls)
        dt = time.perf_counter() - t0
        best = max(best, units_per_call * n_calls / dt)
    return best


def main() -> None:
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SECS)
    timer = threading.Timer(WATCHDOG_SECS + 20, _thread_watchdog)
    timer.daemon = True
    timer.start()
    from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
        device_peaks,
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    from unsupervised_anomaly_detection_brain_mri_tpu.config import (
        Config,
        preset,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer
    from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
        epoch_indices,
    )

    B, H = 128, 128
    n_slices = 1024
    host_rng = np.random.default_rng(0)
    pool_np = host_rng.uniform(0, 1, (n_slices, H, H, 1)).astype(np.float32)
    pool = {"x": jnp.asarray(pool_np)}
    detail = {"batch": B, "image": H, "device": str(jax.devices()[0]),
              "section_secs": _SECTION_SECS}

    def epoch_runner(trainer, state_holder, **static):
        def run(n_epochs: int):
            state = state_holder[0]
            for _ in range(n_epochs):
                idxs = jnp.asarray(epoch_indices(host_rng, n_slices, B))
                state, m = trainer._train_compiler(state, pool, idxs,
                                                   **static)
            _ = float(m["loss"])  # force completion through the tunnel
            state_holder[0] = state
        return run

    # ================= sections ordered by RECORD-CRITICALITY: the
    # watchdog emits partials on a tunnel hang / budget overrun, so the
    # rows the published record depends on most (headline + baseline,
    # MFU, the fast-profile trio, the batched restoration paths, then
    # the remaining README-quoted rows: median, eval pipeline + sweep,
    # ConvT ablation, AAE per-update) run first; the family rows the
    # record does not quote (VAE, fAnoGAN, AnoVAEGAN) run last.
    # Every completed row is visible to the watchdog via the shared
    # detail dict, so truncation only ever costs trailing sections.

    _section("ae_headline")
    # ---- TPU-native AE path (headline)
    cfg = Config(trainer="AE", model="autoencoder", batchsize=B,
                 outputWidth=H, outputHeight=H, zDim=128, numEpochs=1)
    tr = get_trainer("AE")(cfg)
    holder = [tr.init_state()]
    run = epoch_runner(tr, holder)
    run(1)  # compile + warmup
    # 12 back-to-back epochs per timing call: sustained throughput, with
    # the tunnel's fixed dispatch/fetch latency amortized over ~0.5 s of
    # device work (the marginal-slope row below isolates pure device rate)
    native_sps = _best_throughput(run, n_slices, 12)
    detail["native_ae_slices_per_sec"] = round(native_sps, 1)
    _partial.update(value=round(native_sps, 1), detail=detail)
    # marginal slope between 4- and 16-epoch runs: device-side rate with the
    # remote-tunnel's fixed dispatch latency cancelled out
    t4 = time.perf_counter(); run(4); t4 = time.perf_counter() - t4
    t16 = time.perf_counter(); run(16); t16 = time.perf_counter() - t16
    if t16 > t4:
        detail["native_ae_slices_per_sec_marginal"] = round(
            12 * n_slices / (t16 - t4), 1)

    _section("tf1_baseline")
    # ---- TF1-shaped baseline: per-batch host feed + fetch, f32
    cfg_b = cfg.replace(compute_dtype="float32")
    tr_b = get_trainer("AE")(cfg_b)
    state_b = tr_b.init_state()
    step = jax.jit(tr_b._build_train_step())

    def run_baseline(n_steps: int):
        nonlocal state_b
        idxs = epoch_indices(host_rng, n_slices, B)
        for row in idxs[:n_steps]:
            batch = {"x": jnp.asarray(pool_np[row])}  # host->device feed
            state_b, metrics = step(state_b, batch)
            _ = float(metrics["loss"])  # device->host fetch per step
    run_baseline(2)  # compile + warmup
    baseline_sps = _best_throughput(run_baseline, B, 8)
    detail["tf1_shaped_baseline_slices_per_sec"] = round(baseline_sps, 1)
    _partial["vs_baseline"] = round(native_sps / baseline_sps, 2)
    # the baseline crosses the remote tunnel twice per step BY DESIGN
    # (that's the reference execution model), so vs_baseline tracks
    # current tunnel latency — it has ranged 30-90x across captures
    detail["baseline_note"] = (
        "TF1-shaped baseline is tunnel-latency dominated (per-step "
        "host feed + fetch); vs_baseline varies with tunnel conditions")

    def mfu_of(trainer, holder, sps, prefix):
        """MFU from XLA cost analysis of the cached whole-epoch program.

        XLA's cost_analysis counts a ``lax.scan`` body ONCE, independent of
        trip count (pinned by tests/test_round5_fixes.py::
        test_cost_analysis_counts_scan_body_once), so the reported flops are
        PER-BATCH: MFU = step_flops * steps_per_sec / peak
                       = step_flops * (sps / B) / peak.
        (Rounds <=4 divided by n_slices instead of B, understating MFU by
        the epoch's batch count, 8x: the r4 "3.33%" is really ~27%.)
        """
        idxs0 = jnp.asarray(epoch_indices(host_rng, n_slices, B))
        jitted_epoch = next(iter(trainer._train_compiler._cache.values()))
        compiled = jitted_epoch.lower(holder[0], pool, idxs0).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0))
        dev_kind = jax.devices()[0].device_kind.lower()
        peak, _ = device_peaks(dev_kind)  # shared table (utils/misc.py)
        if step_flops > 0:
            detail[f"{prefix}_train_step_gflops"] = round(step_flops / 1e9, 1)
            detail[f"{prefix}_mfu_pct"] = round(
                100.0 * step_flops * sps / B / peak, 2)
        return peak, dev_kind

    _section("mfu")
    # ---- MFU of the parity AE train step (FLOP count from XLA cost
    # analysis; the fast-mode MFU is captured in the fast-mode section)
    try:
        peak, dev_kind = mfu_of(tr, holder, native_sps, "ae")
        detail["mfu_flop_model"] = (
            "XLA cost_analysis flops of the epoch scan BODY (= one batch; "
            "cost_analysis counts scan bodies once, trip-count-invariant) "
            "* measured steps/sec; "
            f"peak={peak / 1e12:.0f}e12 ({dev_kind})")
    except Exception as e:  # pragma: no cover
        detail["mfu_error"] = str(e)[:120]


    _section("fastmode")
    # ---- NON-PARITY fast profile (the TPU default; --parity opts out):
    # s2d stem + d2s head.
    # The parity decoder materialises a 128x128x128x32 bf16 feature map
    # (134 MB) each step — the profiled HBM bottleneck; the packed head
    # computes at half resolution.  Quality validated against the
    # 18-preset scoreboard (examples/scoreboard_expected.json tolerances).
    try:
        scfg = cfg.replace(spaceToDepthStem=True, depthToSpaceHead=True)
        stem_tr = get_trainer("AE")(scfg)
        sholder = [stem_tr.init_state()]
        srun = epoch_runner(stem_tr, sholder)
        srun(1)
        stem_sps = _best_throughput(srun, n_slices, 4)
        detail["fastmode_ae_slices_per_sec"] = round(stem_sps, 1)
        detail["fastmode_speedup"] = round(stem_sps / native_sps, 3)
        # marginal slope (4- vs 16-epoch runs): device-side rate with the
        # tunnel's fixed dispatch latency cancelled — the README's fast-mode
        # device-side claim must come from THIS machine-captured row
        st4 = time.perf_counter(); srun(4); st4 = time.perf_counter() - st4
        st16 = time.perf_counter(); srun(16); st16 = time.perf_counter() - st16
        if st16 > st4:
            fast_marginal = 12 * n_slices / (st16 - st4)
            detail["fastmode_ae_slices_per_sec_marginal"] = round(
                fast_marginal, 1)
            nm = detail.get("native_ae_slices_per_sec_marginal")
            if nm:
                detail["fastmode_speedup_marginal"] = round(
                    fast_marginal / nm, 3)
        mfu_of(stem_tr, sholder, stem_sps, "fastmode_ae")
    except Exception as e:  # pragma: no cover
        detail["s2d_bench_error"] = str(e)[:120]

    _section("gmvae_restoration")
    # ---- GMVAE_spatial 150-step restoration eval (the reference's other
    # restoration hot loop, `trainers/GMVAE.py:166-197`; preset restore
    # steps 150 for the spatial variant)
    try:
        gmcfg = preset("GMVAE_spatial", numEpochs=1)
        gmtr = get_trainer("GMVAE_spatial")(gmcfg)
        gmstate = gmtr.init_state()
        gvol = jnp.asarray(host_rng.uniform(
            0, 1, (112, H, H, 1)).astype(np.float32))
        rr = gmtr.reconstruct(gmstate, gvol)  # compile
        _ = float(np.asarray(rr["reconstruction"]).sum())

        def run_gm(n: int):
            for _ in range(n):
                rr = gmtr.reconstruct(gmstate, gvol)
            _ = float(np.asarray(rr["reconstruction"]).sum())

        gm_single_vps = _best_throughput(run_gm, 1, 2)
        detail["gmvae_restoration_volumes_per_sec"] = round(gm_single_vps, 3)

        # the BATCHED path is what the eval driver actually ships
        # (eval/evaluate.py routes GMVAE through reconstruct_volumes_device
        # with Options.restorationVolumeBatch=4) — measure it, not just the
        # single-volume dispatch (VERDICT r4 weak #5)
        KG = 4
        gvols = jnp.asarray(host_rng.uniform(
            0, 1, (KG, 112, H, H, 1)).astype(np.float32))
        grb = gmtr.reconstruct_volumes_device(gmstate, gvols)  # compile
        _ = float(jnp.sum(grb["reconstruction"][:, :2, :2, :2]))

        def run_gm_batched(n: int):
            for _ in range(n):
                grb = gmtr.reconstruct_volumes_device(gmstate, gvols)
            _ = float(jnp.sum(grb["reconstruction"][:, :2, :2, :2]))

        gm_batched_vps = _best_throughput(run_gm_batched, KG, 2)
        detail["gmvae_restoration_batched_volumes_per_sec"] = round(
            gm_batched_vps, 3)
        detail["gmvae_restoration_batched_speedup"] = round(
            gm_batched_vps / gm_single_vps, 2)
    except Exception as e:  # pragma: no cover
        detail["gmvae_bench_error"] = str(e)[:120]

    _section("vae_you_restoration")
    # ---- VAE_You 150-step input-gradient restoration: single volume AND
    # the cross-volume batched path the eval driver uses
    # (Options.restorationVolumeBatch, vmapped restoration loop)
    try:
        ycfg = Config(trainer="VAE_You", model="variational_autoencoder",
                      batchsize=B, outputWidth=H, outputHeight=H, zDim=128,
                      restore_steps=150, tv_lambda=1.0)
        ytr = get_trainer("VAE_You")(ycfg)
        ystate = ytr.init_state()
        yvol = jnp.asarray(host_rng.uniform(
            0, 1, (112, H, H, 1)).astype(np.float32))
        r = ytr.reconstruct(ystate, yvol)  # compile
        _ = float(np.asarray(r["reconstruction"]).sum())

        def run_restore(n: int):
            for _ in range(n):
                rr = ytr.reconstruct(ystate, yvol)
            _ = float(np.asarray(rr["reconstruction"]).sum())

        single_vps = _best_throughput(run_restore, 1, 2)
        detail["vae_you_restoration_volumes_per_sec"] = round(single_vps, 3)

        KV = 4
        yvols = jnp.asarray(host_rng.uniform(
            0, 1, (KV, 112, H, H, 1)).astype(np.float32))
        rb = ytr.reconstruct_volumes_device(ystate, yvols)  # compile
        _ = float(jnp.sum(rb["reconstruction"][:, :2, :2, :2]))

        def run_restore_batched(n: int):
            for _ in range(n):
                rb = ytr.reconstruct_volumes_device(ystate, yvols)
            _ = float(jnp.sum(rb["reconstruction"][:, :2, :2, :2]))

        batched_vps = _best_throughput(run_restore_batched, KV, 2)
        detail["vae_you_restoration_batched_volumes_per_sec"] = round(
            batched_vps, 3)
        detail["restoration_batched_speedup"] = round(
            batched_vps / single_vps, 2)
    except Exception as e:  # pragma: no cover
        detail["restoration_bench_error"] = str(e)[:120]

    _section("pallas_median")
    # ---- Pallas vs XLA 5^3 median filter on a 112-slice volume
    from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_median import (
        median_filter_3d_auto,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.ops.postprocess import (
        filter_small_components,
        median_filter_3d,
    )

    try:
        vol = jnp.asarray(host_rng.uniform(
            0, 1, (112, H, H)).astype(np.float32))
        f_auto = jax.jit(lambda v: median_filter_3d_auto(v))
        f_xla = jax.jit(lambda v: median_filter_3d(v))
        _ = float(jnp.sum(f_auto(vol)))
        _ = float(jnp.sum(f_xla(vol)))

        def run_f(f):
            def run(n: int):
                for _ in range(n):
                    r = f(vol)
                _ = float(jnp.sum(r))
            return run

        vps_auto = _best_throughput(run_f(f_auto), 1, 5)
        vps_xla = _best_throughput(run_f(f_xla), 1, 5)
        detail["median5_volumes_per_sec"] = round(vps_auto, 2)
        detail["median5_xla_volumes_per_sec"] = round(vps_xla, 2)
        detail["pallas_vs_xla_median_speedup"] = round(vps_auto / vps_xla, 2)
    except Exception as e:  # pragma: no cover - keep the headline metric
        detail["median_bench_error"] = str(e)[:120]

    # (A fully-fused residual->mask->prior->median Pallas kernel and a
    # fused Pallas decoder last stage were each built, proven bit-exact,
    # benched on hardware, and DELETED per those measurements: the
    # bisection median dominates the postprocess cost, and the production
    # ConvT path beats the fused decoder end-to-end.  See docs/STATUS.md.)

    _section("eval_pipeline")
    # ---- full on-device eval post-processing wall-clock (warm):
    # residual -> erosion-masked -> prior -> median -> curve summary -> CC
    # filter -> detection counts on a 4-patient x 112-slice cohort
    try:
        from unsupervised_anomaly_detection_brain_mri_tpu.ops import (
            metrics as M,
        )
        from unsupervised_anomaly_detection_brain_mri_tpu.ops import (
            postprocess as P,
        )

        S = 4 * 112
        xs = jnp.asarray(host_rng.uniform(0, 1, (S, H, H)).astype(np.float32))
        recs = xs * 0.9
        yy, xx = np.mgrid[:H, :H]
        skm = (((yy - H / 2) ** 2 + (xx - H / 2) ** 2)
               < (0.4 * H) ** 2).astype(np.float32)
        skm = jnp.asarray(np.broadcast_to(skm, (S, H, H)))
        labels = xs > 0.97

        @jax.jit
        def eval_pipeline(x, rec, skullmap, lab):
            eroded = P.binary_erosion_2d(skullmap, 12)
            diff = jnp.maximum(x - rec, 0.0) * eroded.astype(x.dtype)
            diff = median_filter_3d_auto(diff, 5)
            summary = M.anomaly_curve_summary(diff.ravel(), lab.ravel())
            thr = filter_small_components(diff > summary["best_threshold"], 7)
            return summary["auc"], summary["best_dice"], jnp.sum(thr)

        _ = float(eval_pipeline(xs, recs, skm, labels)[0])  # compile

        def run_eval(n: int):
            for _ in range(n):
                r = eval_pipeline(xs, recs, skm, labels)
            _ = float(r[0])

        t0 = time.perf_counter()
        run_eval(1)
        detail["eval_pipeline_sec_4x112"] = round(
            time.perf_counter() - t0, 2)

        # standalone metric sweep (AUROC/AP/best-dice in ONE sorted pass,
        # ops/metrics.py) over the same 4x112x128^2 = 7.3M voxels; marginal
        # slope between 2- and 12-call runs cancels tunnel latency
        sweep = jax.jit(
            lambda d, lab: M.anomaly_curve_summary(d, lab)["auc"])
        dflat = jnp.abs(xs - recs).ravel()
        lflat = labels.ravel()
        _ = float(sweep(dflat, lflat))  # compile

        def run_sweep(n: int):
            for _ in range(n):
                r = sweep(dflat, lflat)
            _ = float(r)

        t2 = time.perf_counter(); run_sweep(2); t2 = time.perf_counter() - t2
        t12 = time.perf_counter(); run_sweep(12); t12 = time.perf_counter() - t12
        if t12 > t2:
            detail["metrics_sweep_ms_7m3voxels"] = round(
                1e3 * (t12 - t2) / 10, 1)
    except Exception as e:  # pragma: no cover
        detail["eval_bench_error"] = str(e)[:120]

    _section("convt_ablation")
    # ---- reverse-free ConvT kernel-gradient ablation (ops/convt.py,
    # default ON; the headline row above includes it): the same epoch
    # through jax's built-in transpose rule, whose XLA lowering
    # materialises the 134 MB cotangent reverse
    try:
        ncfg = cfg.replace(fastConvTGrad=False)
        ntr = get_trainer("AE")(ncfg)
        nholder = [ntr.init_state()]
        nrun = epoch_runner(ntr, nholder)
        nrun(1)
        builtin_sps = _best_throughput(nrun, n_slices, 4)
        detail["ae_builtin_convt_grad_slices_per_sec"] = round(
            builtin_sps, 1)
        detail["fastconvtgrad_speedup"] = round(native_sps / builtin_sps, 3)
    except Exception as e:  # pragma: no cover
        detail["convtgrad_bench_error"] = str(e)[:120]

    _section("aae")
    # ---- AAE (WGAN-GP latent critic), plus the per-model-update
    # comparison against AE: the parity schedule runs 41 updates/batch at
    # epoch<=5 (AE x20 + critic x20 + generator x1, `trainers/AAE.py:
    # 85-131`) vs AE's single update, so aggregate slices/s alone can't
    # show whether the GAN step is efficient per update.
    try:
        gcfg = Config(trainer="AAE", model="adversarial_autoencoder",
                      batchsize=B, outputWidth=H, outputHeight=H, zDim=128,
                      intermediateResolutions=(16, 16))
        gtr = get_trainer("AAE")(gcfg)
        # Epoch<=5 parity program (ae_iters=20 -> 41 updates/batch,
        # `epoch_static(0, "TRAIN")`) is the headline; the steady-state
        # program (ae_iters=1 -> 22 updates/batch) is measured too, and the
        # DIFFERENCE isolates the marginal cost of one AE substep inside
        # the adversarial step — the honest per-update comparison vs AE.
        gholder = [gtr.init_state()]
        grun = epoch_runner(gtr, gholder, **gtr.epoch_static(0, "TRAIN"))
        grun(1)
        aae_sps = _best_throughput(grun, n_slices, 2)
        detail["aae_train_slices_per_sec"] = round(aae_sps, 1)
        gholder[0] = gtr.init_state()
        grun1 = epoch_runner(gtr, gholder, **gtr.epoch_static(9, "TRAIN"))
        grun1(1)
        aae_sps1 = _best_throughput(grun1, n_slices, 2)
        detail["aae_train_slices_per_sec_steady"] = round(aae_sps1, 1)
        # derive update counts from the programs actually run (ADVICE r4:
        # do not hard-code the trainer's schedule rule into the bench)
        ai0 = gtr.epoch_static(0, "TRAIN")["ae_iters"]
        ai1 = gtr.epoch_static(9, "TRAIN")["ae_iters"]
        aae_updates_per_batch = ai0 + gtr.d_iters + 1  # AE xN + critic + gen
        detail["ae_ms_per_update"] = round(1e3 * B / native_sps, 3)
        detail["aae_ms_per_update"] = round(
            1e3 * B / aae_sps / aae_updates_per_batch, 3)
        # marginal AE-substep cost: (batch time at ae_iters=ai0 minus at
        # ae_iters=ai1) / extra substeps.  Best-of-2 throughputs are
        # independently noisy through the tunnel — a non-positive time
        # difference means noise dominated; record null + a flag rather
        # than a negative/inflated substep cost (ADVICE r4).
        dt_batch = 1 / aae_sps - 1 / aae_sps1
        if ai0 > ai1 and dt_batch > 0:
            substep_ms = 1e3 * B * dt_batch / (ai0 - ai1)
            detail["aae_ae_substep_ms"] = round(substep_ms, 3)
            detail["aae_ae_substep_vs_ae"] = round(
                substep_ms / (1e3 * B / native_sps), 3)
        else:
            detail["aae_ae_substep_ms"] = None
            detail["aae_ae_substep_note"] = (
                "noise-dominated: schedule A/B time difference <= 0")
    except Exception as e:  # pragma: no cover
        detail["gan_bench_error"] = str(e)[:120]

    _section("vae")
    # ---- VAE path (BASELINE.md names AE & VAE).  Runs after the
    # README-quoted sections: not quoted in the published record, so a
    # budget truncation should cost this row before any quoted one.
    try:
        vcfg = Config(trainer="VAE", model="variational_autoencoder",
                      batchsize=B, outputWidth=H, outputHeight=H, zDim=128)
        vtr = get_trainer("VAE")(vcfg)
        vholder = [vtr.init_state()]
        vrun = epoch_runner(vtr, vholder)
        vrun(1)
        detail["native_vae_slices_per_sec"] = round(
            _best_throughput(vrun, n_slices, 4), 1)
    except Exception as e:  # pragma: no cover
        detail["vae_bench_error"] = str(e)[:120]

    _section("fanogan")
    # ---- fAnoGAN two-phase training (the most schedule-complex trainer:
    # phase 1 WGAN-GP with 5 critic iters/batch incl. grad-of-grad GP,
    # phase 2 izif encoder; `trainers/fAnoGAN.py:87-210`) and AnoVAEGAN
    # (VAE + image WGAN-GP critic; `trainers/AnoVAEGAN.py:95-160`).
    # Parity batch size 8 (mains presets); smaller pool bounds runtime.
    try:
        n_gan = 256
        gan_pool = {"x": jnp.asarray(pool_np[:n_gan])}

        def gan_epoch_runner(trainer, state_holder, **static):
            def run(n_epochs: int):
                state = state_holder[0]
                for _ in range(n_epochs):
                    idxs = jnp.asarray(epoch_indices(
                        host_rng, n_gan, trainer.config.batchsize))
                    state, m = trainer._train_compiler(
                        state, gan_pool, idxs, **static)
                _ = float(jax.tree_util.tree_leaves(m)[0])
                state_holder[0] = state
            return run

        fcfg = preset("fAnoGAN", numEpochs=1)
        ftr = get_trainer("fAnoGAN")(fcfg)
        fholder = [ftr.init_state()]
        frun1 = gan_epoch_runner(ftr, fholder, phase2=False)
        frun1(1)
        detail["fanogan_wgan_slices_per_sec"] = round(
            _best_throughput(frun1, n_gan, 1), 1)
        frun2 = gan_epoch_runner(ftr, fholder, phase2=True)
        frun2(1)
        detail["fanogan_encoder_slices_per_sec"] = round(
            _best_throughput(frun2, n_gan, 1), 1)

        acfg = preset("AnoVAEGAN", numEpochs=1)
        atr = get_trainer("AnoVAEGAN")(acfg)
        aholder = [atr.init_state()]
        arun = gan_epoch_runner(atr, aholder)
        arun(1)
        detail["anovaegan_slices_per_sec"] = round(
            _best_throughput(arun, n_gan, 1), 1)
    except Exception as e:  # pragma: no cover
        detail["fanogan_bench_error"] = str(e)[:120]

    signal.alarm(0)
    _section("done")  # close the last section's wall-clock bucket
    if not _reported.is_set():
        _reported.set()  # disarm the thread watchdog
        print(json.dumps({
            "metric": "brainweb_ae_train_throughput",
            "value": round(native_sps, 1),
            "unit": "slices/sec/chip",
            "vs_baseline": round(native_sps / baseline_sps, 2),
            "detail": detail,
        }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # pragma: no cover - fast-failure path
        # the watchdogs cover HANGS; a fast failure (backend init raising,
        # an unguarded measurement section throwing) must also leave the
        # driver a headline line rather than a bare traceback
        _emit_headline(f"exception: {type(e).__name__}: {str(e)[:160]}")
        raise
