"""Opt-in space-to-depth input stem (NON-PARITY perf flag,
`Config.spaceToDepthStem`; round-1 VERDICT item #9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.models import get_model
from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    space_to_depth,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def test_space_to_depth_packing():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 2, 2, 12)
    # block (0,0) of batch 0: pixels (0,0),(0,1),(1,0),(1,1), channels fastest
    expect = jnp.concatenate([x[0, 0, 0], x[0, 0, 1], x[0, 1, 0], x[0, 1, 1]])
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0]), np.asarray(expect))


@pytest.mark.parametrize("name", ["autoencoder", "autoencoder_spatial",
                                  "variational_autoencoder"])
def test_stem_flag_swaps_first_conv(name):
    cfg = Config(model=name, outputWidth=32, outputHeight=32, zDim=16,
                 spaceToDepthStem=True, compute_dtype="float32")
    m, spec = get_model(cfg, jnp.float32)
    x = jnp.zeros((2, 32, 32, 1))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    if "sample" in spec.rngs:
        rngs["sample"] = jax.random.key(2)
    v = m.init(rngs, x, train=False, dropout=False)
    flat = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("enc_conv_0_s2d" in k for k in flat)
    assert not any("'enc_conv_0'" in k for k in flat)
    out = m.apply(v, x, train=False, dropout=False,
                  rngs={k: r for k, r in rngs.items() if k != "params"})
    assert out["x_hat"].shape == (2, 32, 32, 1)


def test_stem_off_by_default_keeps_parity_arch():
    cfg = Config(model="autoencoder", outputWidth=32, outputHeight=32,
                 zDim=16, compute_dtype="float32")
    m, _ = get_model(cfg, jnp.float32)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               jnp.zeros((1, 32, 32, 1)), train=False, dropout=False)
    flat = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert not any("s2d" in k for k in flat)


@pytest.mark.slow
def test_stem_trains(synth_dataset):
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=3,
                 spaceToDepthStem=True, compute_dtype="float32")
    tr = get_trainer("AE")(cfg)
    state = tr.fit(synth_dataset)
    res = tr.reconstruct(state, synth_dataset.slices("VAL")[:4])
    assert np.all(np.isfinite(np.asarray(res["reconstruction"])))


def test_depth_to_space_inverse():
    from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
        depth_to_space,
    )

    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 2), 2)), np.asarray(x))


def test_d2s_head_swaps_decoder_tail():
    cfg = Config(model="autoencoder", outputWidth=32, outputHeight=32,
                 zDim=16, depthToSpaceHead=True, compute_dtype="float32")
    m, _ = get_model(cfg, jnp.float32)
    x = jnp.zeros((2, 32, 32, 1))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               x, train=False, dropout=False)
    keys = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("dec_conv_d2s_head" in k for k in keys)
    assert not any("dec_conv_final" in k for k in keys)
    # the last parity ConvT stage is gone too
    assert not any("dec_convT_2" in k for k in keys)  # 32->8 has 2 stages
    out = m.apply(v, x, train=False, dropout=False)
    assert out["x_hat"].shape == (2, 32, 32, 1)
    assert out["x_hat"].dtype == jnp.float32


def test_d2s_head_trains(synth_dataset):
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=3,
                 depthToSpaceHead=True, spaceToDepthStem=True,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg)
    state = tr.fit(synth_dataset)
    res = tr.reconstruct(state, synth_dataset.slices("VAL")[:4])
    assert np.all(np.isfinite(np.asarray(res["reconstruction"])))


def test_perf_flags_tag_model_dir():
    base = Config(model="autoencoder")
    assert "_s2d" not in base.model_dir("x")
    assert "_d2s" not in base.model_dir("x")
    both = base.replace(spaceToDepthStem=True, depthToSpaceHead=True)
    assert "_s2d" in both.model_dir("x") and "_d2s" in both.model_dir("x")


@pytest.mark.parametrize("name", ["adversarial_autoencoder", "fanogan",
                                  "anovaegan", "constrained_autoencoder"])
def test_perf_flags_reach_adversarial_family(name):
    cfg = Config(model=name, outputWidth=32, outputHeight=32, zDim=16,
                 intermediateResolutions=(16, 16), compute_dtype="float32",
                 spaceToDepthStem=True, depthToSpaceHead=True)
    m, spec = get_model(cfg, jnp.float32)
    x = jnp.zeros((2, 32, 32, 1))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sample": jax.random.key(2), "gp": jax.random.key(3)}
    args = (x, jnp.zeros((2, 16))) if spec.takes_prior_z else (x,)
    v = m.init(rngs, *args, train=False, dropout=False)
    keys = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("s2d" in k for k in keys)
    assert any("d2s" in k for k in keys)
    out = m.apply(v, *args, train=False, dropout=False,
                  rngs={k: r for k, r in rngs.items() if k != "params"})
    assert out[spec.reconstruction_key].shape == (2, 32, 32, 1)


@pytest.mark.slow
def test_aae_trains_with_perf_flags(synth_dataset):
    cfg = Config(trainer="AAE", model="adversarial_autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=2,
                 intermediateResolutions=(16, 16), compute_dtype="float32",
                 spaceToDepthStem=True, depthToSpaceHead=True)
    tr = get_trainer("AAE")(cfg)
    state = tr.fit(synth_dataset)
    res = tr.reconstruct(state, synth_dataset.slices("VAL")[:4])
    assert np.all(np.isfinite(np.asarray(res["reconstruction"])))
