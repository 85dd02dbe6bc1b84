"""Opt-in real-data smoke: BrainWeb download -> train -> evaluate.

Network-gated: in a zero-egress environment this test SKIPS at the socket
probe; on a networked machine it exercises the exact first-user flow
end-to-end — `data/download.py` form-POST fetch (parity:
`utils/brainweb_download.py:135-143`), gzipped-MINC ingest through the
BRAINWEB loader, one AE training epoch on the normal phantom, and a
best-dice evaluation on the moderate-lesion phantom — so the first real
user is not the first integration test.
"""

import os
import socket
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_HOST = "brainweb.bic.mni.mcgill.ca"


def _reachable(host: str, port: int = 80, timeout: float = 5.0) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except Exception:
        return False


def test_brainweb_download_train_evaluate(tmp_path):
    if not _reachable(_HOST):
        pytest.skip(f"{_HOST} unreachable (zero-egress environment)")

    from unsupervised_anomaly_detection_brain_mri_tpu.config import (
        Config,
        Options,
        PathConfig,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.data.brainweb import (
        BRAINWEB,
        BrainwebOptions,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.data.download import (
        download_brainweb_dataset,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.eval import evaluate
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    root = str(tmp_path / "brainweb")
    # ONE subject per cohort at one acquisition setting bounds the download
    # (~20 MB): the normal phantom to train on, the moderate-MS phantom +
    # tissue-label groundtruths to evaluate against.
    download_brainweb_dataset(root, phantoms=["normal", "msles2"],
                              noise_levels=("pn3",), inu_levels=("rf20",))
    assert os.path.isfile(os.path.join(
        root, "normal", "t2_normal_pn3_rf20.mnc.gz"))

    size = 32
    healthy = BRAINWEB(BrainwebOptions(
        dir=root, sliceStart=20, sliceEnd=130, sliceResolution=(size, size),
        partition={"TRAIN": 0.7, "VAL": 0.3, "TEST": 0.0},
        filterType=("NORMAL",), filterProtocol=("T2",), cache=False))
    lesions = BRAINWEB(BrainwebOptions(
        dir=root, sliceStart=20, sliceEnd=130, sliceResolution=(size, size),
        partition={"TRAIN": 0.0, "VAL": 0.0, "TEST": 1.0},
        filterType=("MODERATEMS",), filterProtocol=("T2",), cache=False))

    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=size, outputHeight=size, zDim=16, numEpochs=1,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg)
    state = tr.fit(healthy)

    opts = Options(paths=PathConfig(sample_dir=tempfile.mkdtemp()),
                   erosionIterations=3, minLesionSize=2)
    res = evaluate(lesions, tr, state, opts, cfg)
    assert np.isfinite(res["diff_AUC"]) and 0.0 <= res["diff_AUC"] <= 1.0
    assert np.isfinite(res["bestDiceScore"])
