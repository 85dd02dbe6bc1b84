"""Command-line interface — reference `run.py` parity.

Same flags as `run.py:122-150` (short and long forms), same workflow
(`run.py:18-92`): train the selected (trainer, model) pair on healthy
BrainWeb data, then either
  * evaluate at a fixed ``--threshold`` on ``--ds``,
  * best-dice ("upper bound") evaluation per dataset, or
  * the threshold-transfer protocol: fit the threshold on the BrainWeb VAL
    lesion split and re-evaluate every dataset at that operating point.

Additions over the reference: ``--synthetic`` (hermetic procedural phantom
run — no downloads needed), ``--mesh-data`` (data-parallel device count),
``--precision``, and a fixed `run.py:67-90` crash (the reference referenced
the nonexistent ``Dataset.Brainweb`` enum member on its full-eval path).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
    json_sanitize,
)
from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    DATASET_PARTITIONS,
    Dataset,
    Optimizer,
    Options,
    PathConfig,
)


def build_dataset(options: Options, config: Config, dataset: Dataset,
                  split_role: str):
    """get_datasets parity (`utils/default_config_setup.py:60-72`):
    'healthy' -> training cohort; 'pathological' -> lesion eval cohort."""
    res = (config.outputHeight, config.outputWidth)
    common = dict(
        sliceStart=options.sliceStart, sliceEnd=options.sliceEnd,
        sliceResolution=res, cache=options.cache,
        normalizationMethod=options.normalizationMethod)
    if dataset == Dataset.SYNTH:
        from unsupervised_anomaly_detection_brain_mri_tpu.data.synthetic import (
            SYNTH,
            SyntheticOptions,
        )

        if split_role == "healthy":
            return SYNTH(SyntheticOptions(
                numPatients=8, imageSize=config.outputWidth,
                numSlices=max(options.sliceEnd - options.sliceStart, 8),
                targetSize=config.outputWidth,
                partition={"TRAIN": 0.7, "VAL": 0.3, "TEST": 0.0}))
        return SYNTH(SyntheticOptions(
            numPatients=6, imageSize=config.outputWidth,
            numSlices=max(options.sliceEnd - options.sliceStart, 8),
            targetSize=config.outputWidth, withLesions=True, seed=99,
            partition={"TRAIN": 0.0, "VAL": 0.5, "TEST": 0.5}))
    if dataset == Dataset.BRAINWEB:
        from unsupervised_anomaly_detection_brain_mri_tpu.data.brainweb import (
            BRAINWEB,
            BrainwebOptions,
        )

        if split_role == "healthy":
            return BRAINWEB(BrainwebOptions(
                dir=options.paths.brainweb_dir,
                partition={"TRAIN": 0.7, "VAL": 0.3, "TEST": 0.0},
                filterType=("NORMAL",), skullRemoval=True,
                backgroundRemoval=options.backgroundRemoval, **common))
        return BRAINWEB(BrainwebOptions(
            dir=options.paths.brainweb_dir,
            partition={"TRAIN": 0.0, "VAL": 0.3, "TEST": 0.7},
            filterType=("SEVEREMS",), skullRemoval=True, **common))
    if dataset == Dataset.MSLUB:
        from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
            MSLUB,
            MSOptions,
        )

        return MSLUB(MSOptions(
            dir=options.paths.mslub_dir,
            partition=DATASET_PARTITIONS[Dataset.MSLUB],
            filterProtocol=("FLAIR",), **common))
    if dataset == Dataset.MSISBI2015:
        from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
            MSISBI2015,
            MSOptions,
        )

        return MSISBI2015(MSOptions(
            dir=options.paths.msisbi2015_dir,
            partition=DATASET_PARTITIONS[Dataset.MSISBI2015],
            filterProtocol=("FLAIR",), **common))
    if dataset == Dataset.MSSEG2008:
        from unsupervised_anomaly_detection_brain_mri_tpu.data.ms_datasets import (
            MSSEG2008,
            MSSEG2008Options,
        )

        return MSSEG2008(MSSEG2008Options(
            dir=options.paths.msseg2008_dir,
            partition=DATASET_PARTITIONS[Dataset.MSSEG2008],
            filterProtocol=("FLAIR",), **common))
    raise ValueError(f"unknown dataset {dataset}")


# Reference `run.py:122-150` flag defaults.  The parser itself uses None
# sentinels so "explicitly passed (even at the default value)" is
# distinguishable from "not passed" — presets only yield to flags the user
# actually typed.
CLI_DEFAULTS = {
    "batchsize": 8, "lr": 0.0001, "numEpochs": 1000, "zDim": 128,
    "outputWidth": 128, "outputHeight": 128, "optimizer": "ADAM",
    "intermediateResolutions": "8,8", "slices_start": 20,
    "slices_end": 130, "trainer": "AE", "model": "autoencoder",
    "numMonteCarloSamples": 0, "use_gradient_based_restoration": 0.0,
    "kappa": 1.0, "scale": 10.0, "rho": 1.0, "dim_c": 9, "dim_z": 128,
    "dim_w": 1, "c_lambda": 1.0, "restore_lr": 1e-3,
    "restore_steps": 150, "tv_lambda": -1.0,
}


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Framework",
        epilog="subcommands (run as the first argument): "
               "'validate-data' dry-runs dataset-layout discovery; "
               "'infer' serves a calibrated workdir on new scans — "
               "see 'run.py validate-data --help' / 'run.py infer --help'")
    p.add_argument("-c", "--config", default=None, type=str,
                   help="config-path (JSON path roots)")
    p.add_argument("-b", "--batchsize", default=None, type=int)
    p.add_argument("-l", "--lr", default=None, type=float)
    p.add_argument("-E", "--numEpochs", default=None, type=int)
    p.add_argument("-z", "--zDim", default=None, type=int)
    p.add_argument("-w", "--outputWidth", default=None, type=int)
    p.add_argument("-g", "--outputHeight", default=None, type=int)
    p.add_argument("-o", "--optimizer", default=None, type=str)
    p.add_argument("-i", "--intermediateResolutions", default=None,
                   type=str, help="Spatial bottleneck resolution, e.g. 8,8")
    p.add_argument("-s", "--slices_start", default=None, type=int)
    p.add_argument("-e", "--slices_end", default=None, type=int)
    p.add_argument("-t", "--trainer", default=None, type=str)
    p.add_argument("-m", "--model", default=None, type=str)
    p.add_argument("-O", "--threshold", default=None, type=float)
    p.add_argument("-d", "--ds", default=None, type=str,
                   help="Only evaluate on the given dataset")
    # per-architecture extras
    p.add_argument("-n", "--numMonteCarloSamples", default=None, type=int)
    p.add_argument("-G", "--use_gradient_based_restoration", default=None,
                   type=float)
    p.add_argument("-K", "--kappa", default=None, type=float)
    p.add_argument("-M", "--scale", default=None, type=float)
    p.add_argument("-R", "--rho", default=None, type=float)
    p.add_argument("-C", "--dim_c", default=None, type=int)
    p.add_argument("-Z", "--dim_z", default=None, type=int)
    p.add_argument("-W", "--dim_w", default=None, type=int)
    p.add_argument("-A", "--c_lambda", default=None, type=float)
    p.add_argument("-L", "--restore_lr", default=None, type=float)
    p.add_argument("-S", "--restore_steps", default=None, type=int)
    p.add_argument("-T", "--tv_lambda", default=None, type=float)
    # TPU-native additions
    p.add_argument("--synthetic", action="store_true",
                   help="hermetic run on the procedural phantom dataset")
    p.add_argument("--mesh-data", default=None, type=int,
                   help="data-parallel device count (default: all)")
    p.add_argument("--precision", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--s2d-stem", action="store_true",
                   help="opt-in NON-PARITY space-to-depth input stem "
                        "(Config.spaceToDepthStem)")
    p.add_argument("--d2s-head", action="store_true",
                   help="opt-in NON-PARITY depth-to-space decoder head "
                        "(Config.depthToSpaceHead)")
    p.add_argument("--fast-convt-grad", dest="fast_convt_grad",
                   action="store_true", default=True,
                   help="PARITY-PRESERVING perf (default ON): reverse-"
                        "free ConvT kernel gradient (Config.fastConvTGrad"
                        "; same math and checkpoints, 1.08x on TPU v5e)")
    p.add_argument("--no-fast-convt-grad", dest="fast_convt_grad",
                   action="store_false",
                   help="disable the reverse-free ConvT kernel gradient "
                        "(use jax's built-in transpose rule)")
    p.add_argument("--tpu-fast", dest="tpu_fast", action="store_true",
                   default=None,
                   help="validated TPU perf profile: enables the "
                        "space-to-depth stem AND the depth-to-space head "
                        "(equivalent to --s2d-stem --d2s-head; NON-PARITY "
                        "architecture, quality validated against the "
                        "18-preset scoreboard — see README).  DEFAULT when "
                        "the backend is a TPU; --parity opts out")
    p.add_argument("--parity", action="store_true",
                   help="force the reference-parity architecture (opt out "
                        "of the TPU-default fast profile).  Non-TPU "
                        "backends are parity by default")
    p.add_argument("--log-every-n", default=0, type=int,
                   help="print every n-th batch's metrics from inside the "
                        "jitted epoch (async callback; parity with the "
                        "reference's per-batch console logs, "
                        "trainers/AE.py:86).  0 = per-epoch means only")
    p.add_argument("--tb-every-n", default=0, type=int,
                   help="emit mid-epoch TensorBoard summaries (scalars + "
                        "input|rec|L1 image grid) every n-th batch, parity "
                        "with the reference's tfSummaryAfter "
                        "(trainers/DLMODEL.py:24).  Implies TensorBoard "
                        "logging; 0 = per-epoch TB only")
    p.add_argument("--stream-pool", action="store_true",
                   help="stream the training pool in host-prefetched "
                        "device chunks instead of keeping it whole in HBM "
                        "(automatic above "
                        "Options.streamPoolThresholdMB; identical updates)")
    p.add_argument("--preset", default=None, type=str,
                   help="experiment preset name (mains/ parity)")
    p.add_argument("--workdir", default=None, type=str)
    p.add_argument("--metrics-out", default=None, type=str,
                   help="write one JSON row per evaluation (AUROC/AUPRC/"
                        "bestDice/threshold + final train loss) — feeds "
                        "the run_all quality scoreboard")
    return p


def resolve_tpu_fast(tpu_fast: Optional[bool], parity: bool) -> bool:
    """Resolve the execution profile (fast vs reference-parity).

    The fast profile (space-to-depth stem + depth-to-space head) was
    hardware-validated on all 18 presets against the quality scoreboard
    (``examples/scoreboard_expected_tpu_fast.json``), so it is the
    DEFAULT whenever the backend is a TPU — 1.7-2.5x training throughput
    at scoreboard-equal quality.  ``--parity`` forces the reference-parity
    architecture anywhere.  Non-TPU backends default to parity: the fast
    profile's layout is a TPU-HBM optimization, and parity keeps CPU runs
    directly comparable to the reference (`models/autoencoder.py:14-40`).
    Result artifacts stay unambiguous either way — the profile is baked
    into ``Config.model_dir`` and each scoreboard records its profile.
    """
    if parity and tpu_fast:
        raise SystemExit("--parity and --tpu-fast are mutually exclusive")
    if parity:
        return False
    if tpu_fast is not None:
        return bool(tpu_fast)
    import jax

    return jax.default_backend() == "tpu"


def validate_data_main(argv: Optional[List[str]] = None) -> int:
    """``validate-data`` subcommand: dry-run patient discovery with
    actionable errors (no cache build, no training)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.data.validate import (
        format_report,
        validate_dataset_dir,
    )

    p = argparse.ArgumentParser(
        prog="validate-data",
        description="Check dataset directory layouts before a real run")
    p.add_argument("-c", "--config", default=None, type=str,
                   help="config-path (JSON path roots); validates every "
                        "dataset root it names")
    p.add_argument("-d", "--ds", default=None, type=str,
                   help="dataset to validate (BRAINWEB, MSLUB, "
                        "MSISBI2015, MSSEG2008)")
    p.add_argument("--dir", default=None, type=str,
                   help="dataset directory (overrides the config root)")
    p.add_argument("--protocol", action="append", default=None,
                   help="protocol filter (repeatable), e.g. FLAIR")
    p.add_argument("--format", default="raw", choices=("raw", "aligned"))
    p.add_argument("--deep", action="store_true",
                   help="additionally load the first patient's volumes")
    args = p.parse_args(argv)

    paths = (PathConfig.from_json(args.config) if args.config
             else PathConfig())
    roots = {
        "BRAINWEB": paths.brainweb_dir,
        "MSLUB": paths.mslub_dir,
        "MSISBI2015": paths.msisbi2015_dir,
        "MSSEG2008": paths.msseg2008_dir,
    }
    if args.ds:
        name = args.ds.upper()
        if name not in roots:
            p.error(f"unknown dataset {args.ds!r} "
                    f"(choose from {', '.join(sorted(roots))})")
        targets = {name: args.dir or roots[name]}
    elif args.dir:
        p.error("--dir requires --ds to name the dataset")
    else:
        targets = roots
    rc = 0
    for kind, directory in targets.items():
        report = validate_dataset_dir(
            kind, str(directory), protocols=args.protocol, fmt=args.format,
            deep=args.deep)
        print(format_report(report))
        if not report["ok"]:
            rc = 1
    return rc


def infer_main(argv: Optional[List[str]] = None) -> int:
    """``infer`` subcommand: serve a trained workdir on new scans.

    Deployment counterpart of the training CLI (no reference equivalent —
    the reference stopped at offline evaluation, `utils/Evaluation.py`):
    restores the model + calibrated operating point written by the
    threshold-transfer workflow (``calibration.json``), runs the exact
    eval-pipeline post-processing on each input scan, and writes the
    anomaly map back into the SOURCE scan's geometry (same de-zoom +
    affine semantics as the residual export, `utils/Evaluation.py:323-334`)
    plus a machine-readable ``report.json``.
    """
    import json

    p = argparse.ArgumentParser(
        prog="infer",
        description="Detect anomalies in new scans with a trained workdir")
    p.add_argument("--workdir", required=True, type=str,
                   help="training workdir (config.json + checkpoint; a "
                        "calibration.json written by threshold transfer is "
                        "auto-loaded)")
    p.add_argument("-i", "--input", action="append", required=True,
                   type=str, help="scan path (.nii[.gz], .mnc[.gz], "
                                  ".nrrd/.nhdr); repeatable")
    p.add_argument("--brainmask", action="append", default=None, type=str,
                   help="brainmask volume per input (repeatable, matched "
                        "by position); default: intensity > 0.05 mask")
    p.add_argument("-O", "--threshold", default=None, type=float,
                   help="override the calibrated threshold")
    p.add_argument("-n", "--numMonteCarloSamples", default=None, type=int,
                   help="override the calibrated MC sample count")
    p.add_argument("-o", "--output-dir", default=None, type=str,
                   help="output directory (default: "
                        "<workdir>/inference/<scan-stem>)")
    p.add_argument("--no-export", action="store_true",
                   help="skip NIfTI export; write report.json only")
    args = p.parse_args(argv)

    if args.brainmask and len(args.brainmask) != len(args.input):
        p.error(f"{len(args.brainmask)} --brainmask for "
                f"{len(args.input)} --input (must match by position)")

    # heavy (JAX-initializing) imports only AFTER flag validation: --help
    # and usage errors must not wait on device-backend startup
    import numpy as np

    from unsupervised_anomaly_detection_brain_mri_tpu.data.volume import (
        open_volume,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        export_residual_volume,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
        AnomalyDetector,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    det = AnomalyDetector.from_workdir(args.workdir,
                                       threshold=args.threshold)
    if args.numMonteCarloSamples is not None:
        det.options = det.options.replace(
            numMonteCarloSamples=args.numMonteCarloSamples)
    if det.threshold is None:
        print("NOTE: no threshold (no calibration.json in the workdir and "
              "no -O/--threshold) — anomaly maps only, no binary masks.")

    def scan_stem(path: str) -> str:
        name = os.path.basename(path)
        for ext in (".nii.gz", ".mnc.gz", ".nii", ".mnc", ".nrrd", ".nhdr"):
            if name.endswith(ext):
                return name[: -len(ext)]
        return os.path.splitext(name)[0]

    # de-duplicate output stems: two inputs with the same basename
    # (e.g. /siteA/scan.nii.gz and /siteB/scan.nii.gz) must not silently
    # overwrite each other's reports/exports
    all_stems = [scan_stem(p) for p in args.input]
    stems, taken = [], set(all_stems)
    used = set()
    for s in all_stems:
        out = s
        n = 2
        # bump until unused among BOTH already-assigned names and every
        # literal input stem (so a generated "scan_2" cannot collide with
        # an actual scan_2.nii.gz later in the list)
        while out in used or (out != s and out in taken):
            out = f"{s}_{n}"
            n += 1
        used.add(out)
        stems.append(out)

    rc = 0
    for idx, path in enumerate(args.input):
        nii = open_volume(path)
        axis = nii.view_mapping["axial"]
        vol = np.moveaxis(np.asarray(nii.data, np.float32), axis, 2)
        bm = None
        if args.brainmask:
            bnii = open_volume(args.brainmask[idx])
            bm = np.moveaxis(np.asarray(bnii.data, np.float32),
                             bnii.view_mapping["axial"], 2)
        res = det.detect(vol, brainmask=bm)

        stem = stems[idx]
        outdir = args.output_dir or os.path.join(
            args.workdir, "inference", stem)
        os.makedirs(outdir, exist_ok=True)

        files = {}
        if not args.no_export:
            geo = nii.geometry()
            geo["axis_index"] = axis
            geo["slice_range"] = (0, vol.shape[2])
            map_path = os.path.join(outdir, f"{stem}.anomaly.nii.gz")
            export_residual_volume(map_path, res["anomaly_map"], geo,
                                   threshold=det.threshold)
            files["anomaly_map"] = map_path
            if det.threshold is not None:
                files["binary_mask"] = map_path[:-7] + ".binary.nii.gz"

        report = {
            "input": os.path.abspath(path),
            "workdir": os.path.abspath(args.workdir),
            "threshold": det.threshold,
            "calibration": det.calibration,
            "model_resolution": [int(v) for v in
                                 res["anomaly_map"].shape[1:]],
            "num_slices": int(vol.shape[2]),
            "slice_scores": [float(v) for v in res["scores"]],
            "files": files,
        }
        for key in ("anomalous_voxels", "cc_converged"):
            if key in res:
                report[key] = res[key]
        if "epistemic_variance" in res:
            report["max_epistemic_variance"] = float(
                res["epistemic_variance"].max())
        report_path = os.path.join(outdir, f"{stem}.report.json")
        with open(report_path, "w") as f:
            json.dump(json_sanitize(report), f, indent=2)

        summary = f"{path}: peak slice score {max(report['slice_scores']):.4f}"
        if "anomalous_voxels" in report:
            summary += f", {report['anomalous_voxels']} anomalous voxels"
        print(summary)
        print(f"  report: {report_path}")
        for k, v in files.items():
            print(f"  {k}: {v}")
    return rc


def main(argv: Optional[List[str]] = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "validate-data":
        return validate_data_main(argv[1:])
    if argv and argv[0] == "infer":
        return infer_main(argv[1:])
    # parse BEFORE importing anything that initializes JAX: --help and
    # flag errors must not wait on (or fail with) device-backend startup
    args = make_parser().parse_args(argv)
    from unsupervised_anomaly_detection_brain_mri_tpu.config import (
        MeshConfig,
        preset,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import (
        determine_threshold_on_labeled_patients,
        evaluate,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
        make_mesh,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    passed = {k for k, v in vars(args).items()
              if v is not None and k in CLI_DEFAULTS}
    for k, v in CLI_DEFAULTS.items():
        if getattr(args, k, None) is None:
            setattr(args, k, v)

    auto_profile = args.tpu_fast is None and not args.parity
    args.tpu_fast = resolve_tpu_fast(args.tpu_fast, args.parity)
    if auto_profile and args.tpu_fast:
        print("[profile] TPU backend detected -> fast profile enabled "
              "(scoreboard-validated, 1.7-2.5x; pass --parity for the "
              "reference-parity architecture)")

    paths = (PathConfig.from_json(args.config) if args.config
             else PathConfig())
    inter = tuple(int(v) for v in str(
        args.intermediateResolutions).split(","))

    overrides = dict(
        trainer=args.trainer, model=args.model,
        batchsize=args.batchsize, learningrate=args.lr,
        numEpochs=args.numEpochs, zDim=args.zDim,
        outputWidth=args.outputWidth, outputHeight=args.outputHeight,
        optimizer=Optimizer(args.optimizer),
        intermediateResolutions=inter,
        compute_dtype=args.precision,
        kappa=args.kappa, scale=args.scale, rho=args.rho,
        dim_c=args.dim_c, dim_z=args.dim_z, dim_w=args.dim_w,
        c_lambda=args.c_lambda, restore_lr=args.restore_lr,
        restore_steps=args.restore_steps, tv_lambda=args.tv_lambda,
        use_gradient_based_restoration=args.use_gradient_based_restoration,
        spaceToDepthStem=args.s2d_stem or args.tpu_fast,
        depthToSpaceHead=args.d2s_head or args.tpu_fast,
        fastConvTGrad=args.fast_convt_grad,
        mesh=MeshConfig(data=args.mesh_data),
    )
    if args.preset:
        # preset values win over UNSPECIFIED CLI flags (the reference mains
        # hardcoded their hyperparameters); explicitly-passed flags win
        flag_to_field = {"lr": "learningrate",
                         "intermediateResolutions": "intermediateResolutions",
                         "precision": "compute_dtype",
                         "mesh_data": "mesh"}
        keep = set()
        for flag in passed:
            keep.add(flag_to_field.get(flag, flag))
        config = preset(args.preset)
        config = config.replace(
            **{k: v for k, v in overrides.items() if k in keep})
        # non-architecture flags always apply
        config = config.replace(
            compute_dtype=args.precision,
            spaceToDepthStem=args.s2d_stem or args.tpu_fast,
            depthToSpaceHead=args.d2s_head or args.tpu_fast,
            fastConvTGrad=args.fast_convt_grad,
            mesh=MeshConfig(data=args.mesh_data))
    else:
        config = Config().replace(**overrides)
    options = Options(paths=paths, sliceStart=args.slices_start,
                      sliceEnd=args.slices_end,
                      numMonteCarloSamples=args.numMonteCarloSamples,
                      threshold=args.threshold,
                      # reference used 12 erosion iterations at 128x128
                      # (`utils/Evaluation.py:87`); scale with resolution so
                      # small smoke-run images keep a usable brain area
                      erosionIterations=max(
                          1, (12 * args.outputWidth) // 128),
                      logEveryNBatches=args.log_every_n,
                      tbEveryNBatches=args.tb_every_n,
                      tensorboard=args.tb_every_n > 0,
                      streamPool=args.stream_pool)

    train_ds_kind = Dataset.SYNTH if args.synthetic else Dataset.BRAINWEB
    dataset_hc = build_dataset(options, config, train_ds_kind, "healthy")

    mesh = make_mesh(config.mesh) if args.mesh_data else None
    workdir = args.workdir or os.path.join(
        paths.checkpoint_dir, config.model,
        config.model_dir(train_ds_kind.value))
    os.makedirs(workdir, exist_ok=True)
    trainer = get_trainer(config.trainer)(
        config, options, mesh=mesh, workdir=workdir)
    state = trainer.fit(dataset_hc)

    def eval_ds(kind: Dataset):
        return build_dataset(options, config, kind, "pathological")

    metric_rows: List[dict] = []

    def record_metrics(res: dict, kind: Dataset, description: str) -> None:
        if not args.metrics_out:
            return
        final_train_loss = None
        train_rows = [h for h in getattr(trainer, "history", [])
                      if "train" in str(h.get("phase", "")).lower()]
        if train_rows:
            final_train_loss = float(train_rows[-1].get("loss", float("nan")))
        metric_rows.append({
            "preset": args.preset, "trainer": config.trainer,
            "model": config.model, "dataset": kind.value,
            "description": description,
            "AUROC": res.get("diff_AUC"), "AUPRC": res.get("diff_AUPRC"),
            "bestDice": res.get("bestDiceScore"),
            "bestThreshold": res.get("bestThreshold"),
            "DiceScore": res.get("DiceScore"),
            "finalTrainLoss": final_train_loss,
        })

    def flush_metrics() -> None:
        if args.metrics_out and metric_rows:
            import json as _json

            with open(args.metrics_out, "w") as f:
                for row in metric_rows:
                    f.write(_json.dumps(json_sanitize(row)) + "\n")

    eval_kinds: List[Dataset]
    if args.synthetic:
        eval_kinds = [Dataset.SYNTH]
    elif args.ds:
        eval_kinds = [Dataset(args.ds)]
    else:
        eval_kinds = [Dataset.BRAINWEB, Dataset.MSLUB, Dataset.MSISBI2015]

    if args.threshold is not None:
        for kind in eval_kinds:
            desc = f"{kind.value}-thresh_{args.threshold}"
            res = evaluate(eval_ds(kind), trainer, state,
                           options.replace(threshold=args.threshold,
                                           applyHyperIntensityPrior=False),
                           config, epoch=config.numEpochs, description=desc)
            record_metrics(res, kind, desc)
        flush_metrics()
        return 0

    if args.ds and not args.synthetic:
        # reference `run.py:60-63`: `-d` without a threshold runs ONE
        # best-dice eval on that dataset at the options' prior setting
        # (default True, `default_config_setup.py:54`) and returns —
        # no prior sweep, no threshold transfer
        kind = eval_kinds[0]
        desc = f"{kind.value}_upperbound_bestdice_wPrior"
        res = evaluate(eval_ds(kind), trainer, state,
                       options.replace(threshold=None,
                                       applyHyperIntensityPrior=True),
                       config, epoch=config.numEpochs, description=desc)
        record_metrics(res, kind, desc)
        flush_metrics()
        return 0

    # best-dice upper bound, with and without the hyperintensity prior
    for prior in (False, True):
        for kind in eval_kinds:
            desc = (f"{kind.value}_upperbound"
                    + ("_wPrior" if prior else ""))
            res = evaluate(eval_ds(kind), trainer, state,
                           options.replace(threshold=None,
                                           applyHyperIntensityPrior=prior),
                           config, epoch=config.numEpochs, description=desc)
            record_metrics(res, kind, desc)

    # threshold transfer from the first eval cohort's VAL split
    val_ds = eval_ds(eval_kinds[0])
    transfer_options = options.replace(applyHyperIntensityPrior=False,
                                       threshold=None)
    best_dice, thresh = determine_threshold_on_labeled_patients(
        [val_ds], trainer, state, transfer_options, config)
    print(f"Optimal threshold on MS Lesion Validation Set without optimal "
          f"postprocessing: {thresh} (Dice-Score {best_dice})")
    # persist the calibrated operating point so serving can auto-load it
    # (AnomalyDetector.from_workdir) — the reference printed and dropped it
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.inference import (
        save_calibration,
    )

    calib_path = save_calibration(
        workdir, thresh, best_dice, transfer_options,
        dataset=eval_kinds[0].value, epoch=config.numEpochs)
    print(f"Calibration written to {calib_path}")
    for kind in eval_kinds:
        desc = f"{kind.value}-VALthresh_{thresh:.5f}"
        res = evaluate(eval_ds(kind), trainer, state,
                       options.replace(threshold=thresh,
                                       applyHyperIntensityPrior=False),
                       config, epoch=config.numEpochs, description=desc)
        record_metrics(res, kind, desc)
    flush_metrics()
    return 0


if __name__ == "__main__":
    sys.exit(main())
