"""Round-5 regression tests (VERDICT r4 + ADVICE r4 items)."""

import jax
import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _tiny(trainer="AE", model="autoencoder", **kw):
    cfg = Config(trainer=trainer, model=model, batchsize=2, outputWidth=32,
                 outputHeight=32, zDim=8, numEpochs=1, **kw)
    return get_trainer(trainer)(cfg)


class TestMidEpochTensorboard:
    """Opt-in per-batch TB summaries (VERDICT r4 missing #1): scalars +
    input|rec|L1 grid every Nth batch from inside the jitted scan, parity
    with the reference's tfSummaryAfter (`trainers/AEMODEL.py:37-42`)."""

    def test_event_files_contain_mid_epoch_steps(self, tmp_path):
        from unsupervised_anomaly_detection_brain_mri_tpu.config import Options
        from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
            SYNTH,
            SyntheticOptions,
        )

        ds = SYNTH(SyntheticOptions(numPatients=4, imageSize=32, numSlices=8,
                                    targetSize=32))
        cfg = Config(trainer="AE", model="autoencoder", batchsize=2,
                     outputWidth=32, outputHeight=32, zDim=8, numEpochs=1,
                     compute_dtype="float32")
        opts = Options(tensorboard=True, tbEveryNBatches=3)
        tr = get_trainer("AE")(cfg, opts, workdir=str(tmp_path))
        tr.fit(ds, resume=False)

        from tensorboard.backend.event_processing import event_accumulator

        acc = event_accumulator.EventAccumulator(
            str(tmp_path / "logs" / "train"),
            size_guidance={"scalars": 0, "images": 0})
        acc.Reload()
        scalar_tags = set(acc.Tags()["scalars"])
        assert "batch/loss" in scalar_tags, scalar_tags
        steps = [e.step for e in acc.Scalars("batch/loss")]
        # batchsize 2 over the TRAIN split -> several batches; every 3rd
        # global step logs.  Mid-epoch means steps beyond the epoch index.
        assert steps and all(s % 3 == 0 for s in steps), steps
        assert max(steps) > 1, steps
        # the image grid is written at the same mid-epoch steps (plus the
        # per-epoch visual at step==epoch)
        img_steps = [e.step for e in acc.Images("reconstruction")]
        assert any(s in steps for s in img_steps), (img_steps, steps)

    def test_default_epoch_program_has_no_tb_callbacks(self):
        """tbEveryNBatches=0 (default) must keep the epoch program free of
        host callbacks (the perf-critical default path)."""
        import jax.numpy as jnp

        from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
            epoch_indices,
        )

        tr = _tiny()
        state = tr.init_state()
        pool = {"x": jnp.zeros((4, 32, 32, 1), jnp.float32)}
        idxs = jnp.asarray(epoch_indices(
            np.random.default_rng(0), 4, 2))
        jitted = tr._train_compiler._cache.get(()) or tr._train_compiler._build(())
        text = jax.make_jaxpr(lambda s, p, i: jitted(s, p, i))(
            state, pool, idxs).pretty_print()
        assert "callback" not in text.lower(), "default path gained a callback"


class TestStreamPool:
    """Chunked/streaming epoch path (VERDICT r4 weak #3): no HBM-pool
    cliff, bit-identical updates vs the resident pool."""

    def _fit(self, opts, num_epochs=2, trainer="AE", model="autoencoder"):
        from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
            SYNTH,
            SyntheticOptions,
        )

        ds = SYNTH(SyntheticOptions(numPatients=6, imageSize=32, numSlices=8,
                                    targetSize=32))
        cfg = Config(trainer=trainer, model=model, batchsize=4,
                     outputWidth=32, outputHeight=32, zDim=8,
                     numEpochs=num_epochs, compute_dtype="float32",
                     intermediateResolutions=(8, 8))
        tr = get_trainer(trainer)(cfg, opts)
        state = tr.fit(ds, resume=False)
        return tr, state

    def test_streaming_identical_to_resident(self):
        from unsupervised_anomaly_detection_brain_mri_tpu.config import Options

        tr_res, st_res = self._fit(Options())
        assert tr_res.streamed_last_epoch is False
        tr_str, st_str = self._fit(
            Options(streamPool=True, streamPoolChunkBatches=2))
        assert tr_str.streamed_last_epoch is True
        for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                        jax.tree_util.tree_leaves(st_str.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # rng stream threads identically through the chained chunk scans
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(st_res.rng)),
            np.asarray(jax.random.key_data(st_str.rng)))
        assert int(st_res.step) == int(st_str.step)
        # reported epoch means agree (weighted chunk means == whole-scan mean)
        for h_res, h_str in zip(tr_res.history, tr_str.history):
            assert h_res.keys() == h_str.keys()
            for k, v in h_res.items():
                if isinstance(v, float):
                    assert abs(v - h_str[k]) < 1e-4 * max(1.0, abs(v)), (
                        k, v, h_str[k])

    def test_size_threshold_triggers_streaming(self):
        from unsupervised_anomaly_detection_brain_mri_tpu.config import Options

        tr, _ = self._fit(
            Options(streamPoolThresholdMB=1e-4), num_epochs=1)
        assert tr.streamed_last_epoch is True

    def test_streaming_gan_trainer(self):
        """The shared fit() drives GAN trainers through the same path —
        streaming must preserve their multi-optimizer updates too."""
        from unsupervised_anomaly_detection_brain_mri_tpu.config import Options

        _, st_res = self._fit(Options(), num_epochs=1, trainer="AAE",
                              model="adversarial_autoencoder")
        _, st_str = self._fit(
            Options(streamPool=True, streamPoolChunkBatches=2),
            num_epochs=1, trainer="AAE", model="adversarial_autoencoder")
        for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                        jax.tree_util.tree_leaves(st_str.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDefaultProfile:
    """The fast profile is the DEFAULT TPU execution profile (VERDICT r4
    weak #2): hardware-validated on all 18 presets, so TPU backends get
    it automatically; --parity opts out; non-TPU backends stay parity."""

    def test_cpu_backend_defaults_to_parity(self):
        from unsupervised_anomaly_detection_brain_mri_tpu.cli import (
            resolve_tpu_fast,
        )

        assert jax.default_backend() == "cpu"  # conftest forces cpu
        assert resolve_tpu_fast(None, False) is False

    def test_tpu_backend_defaults_to_fast(self, monkeypatch):
        from unsupervised_anomaly_detection_brain_mri_tpu.cli import (
            resolve_tpu_fast,
        )

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert resolve_tpu_fast(None, False) is True
        # --parity opts out even on TPU
        assert resolve_tpu_fast(None, True) is False

    def test_explicit_flags_and_mutual_exclusion(self):
        from unsupervised_anomaly_detection_brain_mri_tpu.cli import (
            resolve_tpu_fast,
        )

        assert resolve_tpu_fast(True, False) is True
        with pytest.raises(SystemExit):
            resolve_tpu_fast(True, True)

    def test_scoreboard_profile_mismatch_detected(self):
        import importlib.util
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "run_all", os.path.join(root, "examples", "run_all.py"))
        run_all = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(run_all)

        expected = {"backend": "cpu", "profile": "tpu-fast",
                    "presets": {"AE": {"AUROC": 0.9}}}
        got = {"_backend": "cpu", "_profile": "parity",
               "AE": [{"AUROC": 0.9}]}
        problems = run_all.compare_scoreboard(got, expected)
        assert problems and "profile mismatch" in problems[0]
        # matching profile passes; profile flags are canonicalized OUT of
        # the settings comparison (flag presence is backend-defaulted)
        expected2 = {"backend": "cpu", "profile": "parity",
                     "settings": ["--parity", "-E", "1"],
                     "presets": {"AE": {"AUROC": 0.9}}}
        got2 = {"_backend": "cpu", "_profile": "parity",
                "_settings": ["-E", "1"], "AE": [{"AUROC": 0.9}]}
        assert run_all.compare_scoreboard(got2, expected2) == []


class TestPhaseGuard:
    """`epoch_static` must reject unknown phase strings (VERDICT r4 weak #4:
    a lowercase "train" silently selected the wrong compiled program)."""

    def test_base_trainer_rejects_lowercase(self):
        tr = _tiny()
        with pytest.raises(ValueError, match="unknown phase"):
            tr.epoch_static(0, "train")

    def test_base_trainer_accepts_valid(self):
        tr = _tiny()
        assert tr.epoch_static(0, "TRAIN") == {}
        assert tr.epoch_static(0, "VAL") == {}

    def test_gan_trainer_rejects_unknown(self):
        tr = _tiny("AAE", "adversarial_autoencoder",
                   intermediateResolutions=(16, 16))
        with pytest.raises(ValueError, match="unknown phase"):
            tr.epoch_static(0, "train")
        assert tr.epoch_static(0, "TRAIN")["ae_iters"] == tr.d_iters
        assert tr.epoch_static(9, "TRAIN")["ae_iters"] == 1
        assert tr.epoch_static(0, "VAL") == {}

    def test_fanogan_rejects_unknown(self):
        tr = _tiny("fAnoGAN", "fanogan",
                   intermediateResolutions=(16, 16))
        with pytest.raises(ValueError, match="unknown phase"):
            tr.epoch_static(0, "Train")
        assert tr.epoch_static(0, "TRAIN") == {"phase2": False}


class TestMfuFlopModel:
    """bench.py's MFU formula assumes XLA cost_analysis counts a lax.scan
    body ONCE, independent of trip count (so the epoch program's reported
    flops are per-batch).  Rounds <=4 assumed the opposite and understated
    MFU by the epoch's batch count (8x).  Pin the semantics so a JAX/XLA
    change flips this test, not the published numbers."""

    def test_cost_analysis_counts_scan_body_once(self):
        import jax.numpy as jnp

        def flops_of(length):
            def body(c, _):
                return c @ c, None

            f = jax.jit(
                lambda x: jax.lax.scan(body, x, None, length=length)[0])
            c = f.lower(jnp.ones((64, 64), jnp.float32)).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0))

        f2, f8 = flops_of(2), flops_of(8)
        assert f2 > 0
        assert f2 == f8, (
            "XLA cost_analysis now scales scan flops with trip count; "
            "bench.py::mfu_of must divide by n_slices, not batch")


@pytest.mark.slow
class TestStageRooflineTool:
    """tools/parity_stage_roofline.py must run on any backend and emit a
    well-formed JSON record for both profiles (the DESIGN.md tables are
    generated from its TPU output)."""

    def _run(self, *extra):
        import json
        import os
        import subprocess
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        out = subprocess.run(
            [sys.executable,
             os.path.join(root, "tools", "parity_stage_roofline.py"),
             "--batch", "2", "--image", "32", *extra],
            capture_output=True, text=True, env=env, timeout=600)
        assert out.returncode == 0, out.stderr[-800:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    def test_parity_profile(self):
        rec = self._run()
        assert rec["profile"] == "parity"
        assert len(rec["stages"]) == 4
        for r in rec["stages"]:
            assert "error" in r or (
                r["measured_ms"] > 0 and r["bound"] in
                ("compute", "bandwidth"))

    def test_fast_profile(self):
        rec = self._run("--fast")
        assert rec["profile"] == "fast"
        names = " ".join(s["stage"] for s in rec["stages"])
        assert "s2d stem" in names and "d2s head" in names
