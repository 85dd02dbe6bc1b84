"""validate-data: dry-run dataset-layout checks (VERDICT r2 item 10).

Discovery-only validation against the format-faithful fixture trees and
against empty / mislaid directories, plus the CLI subcommand exit codes.
"""

import os

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.cli import main
from unsupervised_anomaly_detection_brain_mri_tpu.data.validate import (
    format_report,
    validate_dataset_dir,
)

from test_data import _make_brainweb_tree, _make_msisbi_tree


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_brainweb_valid_tree(tmp_path, rng):
    root = str(tmp_path / "bw")
    os.makedirs(root)
    _make_brainweb_tree(root, rng)
    report = validate_dataset_dir("BRAINWEB", root, deep=True)
    assert report["ok"], format_report(report)
    assert report["patients"] == 4  # 2 normal + 2 severe
    assert report["by_type"] == {"NORMAL": 2, "SEVEREMS": 2}
    assert not report["missing"]
    text = format_report(report)
    assert "[OK]" in text and "patients discovered: 4" in text


def test_missing_directory_actionable(tmp_path):
    report = validate_dataset_dir("BRAINWEB", str(tmp_path / "nope"))
    assert not report["ok"]
    assert any("does not exist" in e for e in report["errors"])


def test_empty_directory_shows_layout_hint(tmp_path):
    root = str(tmp_path / "empty")
    os.makedirs(root)
    report = validate_dataset_dir("MSLUB", root)
    assert not report["ok"]
    assert any("expected layout" in e for e in report["errors"])
    assert "_consensus_gt" in report["errors"][0]


def test_msisbi_missing_mask_reported(tmp_path, rng):
    root = str(tmp_path / "isbi")
    os.makedirs(root)
    _make_msisbi_tree(root, rng)
    ok = validate_dataset_dir("MSISBI2015", root, protocols=("FLAIR",))
    assert ok["ok"] and ok["patients"] == 2
    # without a protocol filter, absent MPRAGE/PD/T2 volumes are reported
    full = validate_dataset_dir("MSISBI2015", root)
    assert not full["ok"]
    assert any("MPRAGE" in m["role"] for m in full["missing"])

    mask = os.path.join(root, "training01", "masks",
                        "training01_01_mask1.nii")
    os.remove(mask)
    report = validate_dataset_dir("MSISBI2015", root, protocols=("FLAIR",))
    assert not report["ok"]
    roles = {(m["role"], m["patient"]) for m in report["missing"]}
    assert ("groundtruth", "training01_01") in roles
    assert mask in {m["path"] for m in report["missing"]}
    assert "MISSING groundtruth" in format_report(report)


def test_unknown_dataset_kind(tmp_path):
    with pytest.raises(ValueError, match="unknown dataset"):
        validate_dataset_dir("NOPE", str(tmp_path))


def test_cli_subcommand_exit_codes(tmp_path, rng, capsys):
    root = str(tmp_path / "isbi")
    os.makedirs(root)
    _make_msisbi_tree(root, rng)
    rc = main(["validate-data", "-d", "MSISBI2015", "--dir", root,
               "--protocol", "FLAIR"])
    assert rc == 0
    assert "[OK] MSISBI2015" in capsys.readouterr().out

    os.remove(os.path.join(root, "training02", "preprocessed",
                           "training02_01_skullmap.nii.gz"))
    rc = main(["validate-data", "-d", "MSISBI2015", "--dir", root,
               "--protocol", "FLAIR"])
    assert rc == 1
    out = capsys.readouterr().out
    assert "MISSING" in out and "training02_01" in out
