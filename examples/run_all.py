#!/usr/bin/env python
"""Train and evaluate EVERY model variant — the Colab-notebook workflow.

Parity with the reference notebook ("Running all cells will download the
brainweb dataset, train all models and evaluate them",
`Unsupervised Anomaly Detection Brain-MRI.ipynb`): downloads BrainWeb if a
data directory is configured, then runs every experiment preset in
sequence.  With ``--synthetic`` the whole sweep runs hermetically on the
procedural phantom dataset (useful as an integration test).

Usage:
  python examples/run_all.py --synthetic -E 1 -w 32 -g 32 -s 0 -e 8 -z 16 -b 8
  # (-b 8: the synthetic phantom's training pool is smaller than the
  #  b=128 presets' batch)
  python examples/run_all.py -c config.default.json --download
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

# runnable from any working directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS in-process: out-of-tree device plugins may prepend
# themselves to the platform list and ignore the environment variable, so
# a caller asking for cpu (the test suite, a CI lane) could silently get —
# or block on — an accelerator backend instead
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main as cli_main
from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    EXPERIMENT_PRESETS,
)


METRIC_KEYS = ("AUROC", "AUPRC", "bestDice", "finalTrainLoss")


def _flag_aliases() -> dict:
    """Map every CLI flag spelling to its canonical form (``--numEpochs``
    -> ``-E``), from the parser's own registrations."""
    from unsupervised_anomaly_detection_brain_mri_tpu.cli import make_parser

    aliases = {}
    for action in make_parser()._actions:
        for s in action.option_strings:
            aliases[s] = action.option_strings[0]
    return aliases


def _comparable_settings(tokens) -> dict:
    """Canonicalize a recipe-flag list to a {flag: values} map.

    Order-independent but pairing-preserving (so ``-E 1 -w 32`` never
    equals ``-E 32 -w 1``); short/long spellings of the same flag compare
    equal (``-E 1`` == ``--numEpochs 1``); machine-local config paths are
    dropped in all argparse spellings (``-c PATH``, ``-cPATH``,
    ``--config PATH``, ``--config=PATH``).
    """
    aliases = _flag_aliases()
    pairs, flag, skip_value = {}, None, False
    for tok in (str(t) for t in tokens):
        if tok.startswith("-") and not tok[1:2].isdigit():
            base = aliases.get(tok.split("=", 1)[0], tok.split("=", 1)[0])
            if base in ("--tpu-fast", "--parity"):
                # the execution profile is compared explicitly (the
                # scoreboard's _profile vs the table's "profile") — it is
                # backend-defaulted, so flag presence alone is meaningless
                flag, skip_value = None, False
                continue
            if base == "--config" or base == "-c" or (
                    tok.startswith("-c") and not tok.startswith("--")
                    and len(tok) > 2):
                flag, skip_value = None, ("=" not in tok and tok in
                                          ("-c", "--config"))
                continue
            flag, skip_value = base, False
            entry = pairs.setdefault(flag, [])
            if "=" in tok:
                entry.append(tok.split("=", 1)[1])
        elif skip_value:
            skip_value = False
        elif flag is not None:
            pairs[flag].append(tok)
        else:  # positional with no preceding flag
            pairs.setdefault("", []).append(tok)
    return pairs


def compare_scoreboard(scoreboard: dict, expected: dict) -> list:
    """Compare a scoreboard run against the committed expected table.

    Returns a list of human-readable regression strings (empty == pass).
    A preset regresses when any metric leaves
    ``expected value ± tolerance`` (absolute for the curve metrics, which
    live in [0, 1]; relative for the loss) — so a trainer/model change
    that silently degrades quality turns the sweep red even though every
    preset still 'completes'.
    """
    exp_backend = expected.get("backend")
    got_backend = scoreboard.get("_backend")
    if exp_backend and got_backend and exp_backend != got_backend:
        # metric values are backend-dependent (accelerator default
        # matmul/conv precision differs from CPU float32), so comparing
        # across backends produces spurious "regressions"
        return [f"backend mismatch: scoreboard ran on {got_backend!r} but "
                f"the expected table was recorded on {exp_backend!r} — "
                f"regenerate the table with --scoreboard on this backend"]
    exp_profile = expected.get("profile")
    got_profile = scoreboard.get("_profile")
    if exp_profile and got_profile and exp_profile != got_profile:
        # the fast profile is a different architecture (s2d stem + d2s
        # head); its metrics have their own expected table
        return [f"profile mismatch: scoreboard ran the {got_profile!r} "
                f"profile but the expected table was recorded with "
                f"{exp_profile!r} — check against the matching "
                f"scoreboard_expected*.json (or pass --parity/--tpu-fast)"]
    exp_settings = expected.get("settings")
    got_settings = scoreboard.get("_settings")
    if exp_settings and got_settings is not None and (
            _comparable_settings(exp_settings)
            != _comparable_settings(got_settings)):
        # metric values depend on the run recipe (epochs, image size,
        # threshold, precision) — a check against a table recorded with
        # different flags measures something else entirely
        return [f"settings mismatch: scoreboard ran with {got_settings} "
                f"but the expected table was recorded with {exp_settings} "
                f"— pass the table's flags (or regenerate it)"]
    tol = expected.get("tolerances", {})
    problems = []
    for name, exp_row in expected.get("presets", {}).items():
        rows = scoreboard.get(name)
        if not rows:
            problems.append(f"{name}: no scoreboard rows (preset failed?)")
            continue
        got = rows[0]
        for key in METRIC_KEYS:
            e, g = exp_row.get(key), got.get(key)
            if e is None:
                continue
            if g is None or not (g == g):  # missing or NaN
                problems.append(f"{name}: {key} missing/NaN (expected {e})")
                continue
            if key == "finalTrainLoss":
                bound = abs(e) * float(tol.get(key, 0.5))
            else:
                bound = float(tol.get(key, 0.1))
            if abs(g - e) > bound:
                problems.append(
                    f"{name}: {key} = {g:.4f}, expected {e:.4f} "
                    f"(±{bound:.4f})")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--download", action="store_true",
                    help="download BrainWeb first")
    ap.add_argument("--presets", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--scoreboard", default=None,
                    help="write per-preset quality metrics (JSON) here")
    ap.add_argument("--check", default=None,
                    help="expected-scoreboard JSON; exit 1 when any "
                         "preset's metrics regress beyond tolerance")
    args, passthrough = ap.parse_known_args()

    if args.download:
        import json

        from unsupervised_anomaly_detection_brain_mri_tpu.data.download import (
            download_brainweb_dataset,
        )

        cfg_path = "config.default.json"
        for i, a in enumerate(passthrough):
            if a in ("-c", "--config"):
                cfg_path = passthrough[i + 1]
        with open(cfg_path) as f:
            target = json.load(f)["BRAINWEBDIR"]
        print(f"Downloading BrainWeb into {target} ...")
        download_brainweb_dataset(target)

    presets = (args.presets.split(",") if args.presets
               else list(EXPERIMENT_PRESETS))
    collect = bool(args.scoreboard or args.check)
    scoreboard: dict = {}
    if collect:
        import jax

        from unsupervised_anomaly_detection_brain_mri_tpu.cli import (
            make_parser,
            resolve_tpu_fast,
        )

        scoreboard["_backend"] = jax.default_backend()
        scoreboard["_settings"] = list(passthrough)
        ns, _ = make_parser().parse_known_args(list(passthrough))
        scoreboard["_profile"] = ("tpu-fast" if resolve_tpu_fast(
            ns.tpu_fast, ns.parity) else "parity")
    failed = []
    for name in presets:
        print(f"\n===== {name} =====")
        extra = []
        metrics_path = None
        if collect:
            import tempfile

            metrics_path = os.path.join(
                tempfile.mkdtemp(prefix="uad_scoreboard_"),
                f"{name}.jsonl")
            extra = ["--metrics-out", metrics_path]
        try:
            rc = cli_main(["--preset", name] + passthrough + extra)
            if rc != 0:
                failed.append(name)
        except Exception:
            traceback.print_exc()
            failed.append(name)
        if metrics_path and os.path.exists(metrics_path):
            import json

            with open(metrics_path) as f:
                scoreboard[name] = [json.loads(line) for line in f
                                    if line.strip()]
        if args.scoreboard:
            import json

            # flush after EVERY preset: a multi-hour sweep that dies
            # mid-run still leaves the completed presets on disk
            with open(args.scoreboard, "w") as f:
                json.dump(scoreboard, f, indent=2)
    if args.scoreboard:
        print(f"\nScoreboard written to {args.scoreboard}")
    if args.check:
        import json

        with open(args.check) as f:
            expected = json.load(f)
        if args.presets:
            # a subset run (--presets) is only checked against the rows it
            # actually ran — unran presets are not "failures"
            expected = dict(expected, presets={
                k: v for k, v in expected.get("presets", {}).items()
                if k in presets})
        problems = compare_scoreboard(scoreboard, expected)
        if problems:
            print("\nQUALITY REGRESSIONS:")
            for p in problems:
                print(f"  {p}")
            return 1
        print(f"\nQuality check passed for "
              f"{len(expected.get('presets', {}))} presets.")
    if failed:
        print(f"\nFAILED presets: {failed}")
        return 1
    print(f"\nAll {len(presets)} presets completed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
