"""Per-preset quality scoreboard (VERDICT r2 item 4).

`examples/run_all.py --scoreboard` records {AUROC, AUPRC, bestDice,
finalTrainLoss} per preset at fixed seeds; `--check` compares a run
against the committed `examples/scoreboard_expected.json` and fails on
regression beyond tolerance — so a change that silently degrades a
preset's quality turns the sweep red even when every preset still
"completes" (the round-2 sweep only counted failures).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECTED = os.path.join(ROOT, "examples", "scoreboard_expected.json")
SETTINGS = ["-E", "1", "-w", "32", "-g", "32", "-s", "0", "-e", "8",
            "-z", "16", "-b", "8", "-O", "0.5", "--precision", "float32"]


def _run_all(args, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    cfg = {k: str(tmp_path / k.lower()) for k in
           ("BRAINWEBDIR", "MSKRIDIR", "MSSEG2008DIR", "MSISBI2015DIR",
            "MSLUBDIR", "CHECKPOINTDIR", "SAMPLEDIR")}
    cfg_path = tmp_path / "paths.json"
    cfg_path.write_text(json.dumps(cfg))
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "run_all.py"),
         "--synthetic", "-c", str(cfg_path)] + args + SETTINGS,
        capture_output=True, text=True, env=env, timeout=3000)


def test_compare_scoreboard_flags_regressions():
    """Pure comparison logic: regression beyond tolerance, missing
    preset, NaN metric."""
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    from run_all import compare_scoreboard

    expected = {
        "tolerances": {"AUROC": 0.05, "finalTrainLoss": 0.35},
        "presets": {"AE": {"AUROC": 0.90, "finalTrainLoss": 100.0},
                    "VAE": {"AUROC": 0.95}},
    }
    good = {"AE": [{"AUROC": 0.93, "finalTrainLoss": 120.0}],
            "VAE": [{"AUROC": 0.92}]}
    assert compare_scoreboard(good, expected) == []

    regressed = {"AE": [{"AUROC": 0.80, "finalTrainLoss": 100.0}],
                 "VAE": [{"AUROC": float("nan")}]}
    problems = compare_scoreboard(regressed, expected)
    assert len(problems) == 2
    assert any("AE: AUROC" in p for p in problems)
    assert any("NaN" in p for p in problems)

    missing = {"AE": [{"AUROC": 0.9, "finalTrainLoss": 100.0}]}
    problems = compare_scoreboard(missing, expected)
    assert any("VAE" in p and "no scoreboard rows" in p for p in problems)

    # loss uses a RELATIVE tolerance
    loss_off = {"AE": [{"AUROC": 0.9, "finalTrainLoss": 200.0}],
                "VAE": [{"AUROC": 0.95}]}
    assert any("finalTrainLoss" in p
               for p in compare_scoreboard(loss_off, expected))

    # cross-backend comparison is refused outright (metric values are
    # backend-dependent), superseding any per-metric noise
    exp_cpu = dict(expected, backend="cpu")
    tpu_board = dict(good, _backend="tpu")
    problems = compare_scoreboard(tpu_board, exp_cpu)
    assert len(problems) == 1 and "backend mismatch" in problems[0]
    assert compare_scoreboard(dict(good, _backend="cpu"), exp_cpu) == []

    # a run with different recipe flags is refused too — the table's
    # metrics measure a different configuration entirely
    exp_set = dict(expected, settings=["--synthetic", "-E", "1", "-w", "32"])
    wrong = dict(good, _settings=["--synthetic", "-E", "4", "-w", "32"])
    problems = compare_scoreboard(wrong, exp_set)
    assert len(problems) == 1 and "settings mismatch" in problems[0]
    # flag→value PAIRING matters: swapped values are a different recipe
    swapped = dict(good, _settings=["--synthetic", "-E", "32", "-w", "1"])
    assert any("settings mismatch" in p
               for p in compare_scoreboard(swapped, exp_set))
    # a flag-less run ([] is stamped whenever metrics are collected) does
    # not silently pass against a non-empty recipe
    bare = dict(good, _settings=[])
    assert any("settings mismatch" in p
               for p in compare_scoreboard(bare, exp_set))
    # ...but machine-local -c/--config paths (any argparse spelling) and
    # flag ORDER are ignored
    for cfg_spelling in (["-c", "/tmp/x/paths.json"],
                         ["--config", "/tmp/x/paths.json"],
                         ["--config=/tmp/x/paths.json"],
                         ["-c/tmp/x/paths.json"]):
        same = dict(good, _settings=["-w", "32", *cfg_spelling,
                                     "--synthetic", "-E", "1"])
        assert compare_scoreboard(same, exp_set) == [], cfg_spelling
    # negative numeric values bind to their flag, not parsed as flags
    from run_all import _comparable_settings
    assert (_comparable_settings(["--tv-lambda", "-1", "-E", "1"])
            == {"--tv-lambda": ["-1"], "-E": ["1"]})
    # short/long spellings of the same CLI flag compare equal
    assert (_comparable_settings(["--numEpochs", "1", "-w", "32"])
            == _comparable_settings(["-E", "1", "--outputWidth", "32"]))


def test_expected_table_is_complete():
    from unsupervised_anomaly_detection_brain_mri_tpu.config import (
        EXPERIMENT_PRESETS,
    )

    expected = json.load(open(EXPECTED))
    assert set(expected["presets"]) == set(EXPERIMENT_PRESETS)
    for name, row in expected["presets"].items():
        assert 0.5 <= row["AUROC"] <= 1.0, name  # sanity on the table itself
        assert "bestDice" in row and "AUPRC" in row


@pytest.mark.slow
def test_scoreboard_subset_matches_expected(tmp_path):
    """Two cheap presets re-run end-to-end and checked against the
    committed table — the fast regression signal."""
    res = _run_all(["--presets", "AE,CE",
                    "--scoreboard", str(tmp_path / "sb.json")], tmp_path)
    assert res.returncode == 0, res.stderr[-2000:]
    sb = json.load(open(tmp_path / "sb.json"))
    expected = json.load(open(EXPECTED))
    sys.path.insert(0, os.path.join(ROOT, "examples"))
    from run_all import compare_scoreboard

    sub = {"tolerances": expected["tolerances"],
           "backend": expected.get("backend"),
           "presets": {k: expected["presets"][k] for k in ("AE", "CE")}}
    problems = compare_scoreboard(sb, sub)
    assert problems == [], problems
