"""Shape/dtype/key tests for all 16 model-zoo networks.

Mirrors SURVEY.md section 4(c): every network function must return the same
named outputs as its reference counterpart (see models/registry.py) with
correct shapes.
"""

import jax
import jax.numpy as jnp
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.models import (
    MODEL_REGISTRY,
    get_model,
)

# reference output keys per model (SURVEY.md section 2.4 table)
EXPECTED_KEYS = {
    "autoencoder": {"z", "x_hat"},
    "autoencoder_spatial": {"z", "x_hat"},
    "variational_autoencoder": {"z_mu", "z_log_sigma", "z_sigma", "x_hat"},
    "variational_autoencoder_Zimmerer": {
        "z_mu", "z_log_sigma", "z_sigma", "x_hat"},
    "context_encoder_variational_autoencoder": {
        "z_mu", "z_mu_ce", "z_log_sigma", "z_sigma", "x_hat", "x_hat_ce"},
    "context_encoder_variational_autoencoder_Zimmerer": {
        "z_mu", "z_mu_ce", "z_log_sigma", "z_sigma", "x_hat", "x_hat_ce"},
    "gaussian_mixture_variational_autoencoder": {
        "w_mu", "w_log_sigma", "w_sampled", "z_mu", "z_log_sigma",
        "z_sampled", "z_wc_mus", "z_wc_log_sigma_invs", "z_wc_sampled",
        "xz_mu", "pc_logit", "pc"},
    "gaussian_mixture_variational_autoencoder_spatial": {
        "w_mu", "w_log_sigma", "w_sampled", "z_mu", "z_log_sigma",
        "z_sampled", "z_wc_mus", "z_wc_log_sigma_invs", "z_wc_sampled",
        "xz_mu", "pc_logit", "pc"},
    "gaussian_mixture_variational_autoencoder_You": {
        "w_mu", "w_log_sigma", "w_sampled", "z_mu", "z_log_sigma",
        "z_sampled", "z_wc_mus", "z_wc_log_sigma_invs", "z_wc_sampled",
        "xz_mu", "pc_logit", "pc"},
    "adversarial_autoencoder": {"z_", "x_hat", "d", "d_", "z_hat", "d_hat"},
    "constrained_autoencoder": {"z", "x_hat", "z_rec"},
    "constrained_adversarial_autoencoder": {
        "z_", "x_hat", "z_rec", "d", "d_", "z_hat", "d_hat"},
    "constrained_adversarial_autoencoder_Chen": {
        "z_", "x_hat", "z_rec", "d", "d_", "z_hat", "d_hat"},
    "fanogan": {"z_enc", "x_enc", "x_", "d_fake_features", "d_",
                "d_features", "d", "x_hat", "d_hat_features", "d_hat",
                "d_enc_features", "d_enc"},
    "fanogan_schlegl": {"z_enc", "x_enc", "x_", "d_fake_features", "d_",
                        "d_features", "d", "x_hat", "d_hat_features",
                        "d_hat", "d_enc_features", "d_enc"},
    "anovaegan": {"z_mu", "z_log_sigma", "z_sigma", "out",
                  "d_fake_features", "d_", "d_features", "d", "x_hat",
                  "d_hat_features", "d_hat"},
}

SIZE = 32
ZDIM = 16
BATCH = 2


@pytest.mark.parametrize("name", [
    # the two slowest-to-compile archs run nightly; both are still
    # exercised in the fast tier through their trainer/GAN tests
    pytest.param(n, marks=pytest.mark.slow)
    if n in ("constrained_adversarial_autoencoder_Chen",
             "context_encoder_variational_autoencoder_Zimmerer")
    else n
    for n in sorted(MODEL_REGISTRY)
])
def test_model_outputs(name):
    cfg = Config(model=name, outputWidth=SIZE, outputHeight=SIZE, zDim=ZDIM,
                 intermediateResolutions=(8, 8), batchsize=BATCH,
                 dim_c=3, dim_z=4, dim_w=2)
    model, spec = get_model(cfg, None)
    x = jax.random.uniform(jax.random.key(0), (BATCH, SIZE, SIZE, 1))
    rngs = {k: jax.random.key(i + 1)
            for i, k in enumerate(("params",) + spec.rngs + ("sample",))}
    args = (x,)
    if spec.takes_prior_z:
        args = (x, jax.random.normal(jax.random.key(7), (BATCH, ZDIM)))
    variables = model.init(rngs, *args, train=True, dropout=True)
    out, _ = model.apply(
        variables, *args, train=True, dropout=True,
        rngs={k: v for k, v in rngs.items() if k != "params"},
        mutable=["batch_stats"])

    missing = EXPECTED_KEYS[name] - set(out)
    assert not missing, f"{name} missing outputs: {missing}"
    rec = out[spec.reconstruction_key]
    assert rec.shape == (BATCH, SIZE, SIZE, 1)
    assert rec.dtype == jnp.float32
    assert not bool(jnp.any(jnp.isnan(rec)))


def test_vae_reparameterization_statistics():
    """z = mu + eps*sigma with eps ~ N(0,1): check reconstruction varies
    with the sample rng but z_mu does not."""
    cfg = Config(model="variational_autoencoder", outputWidth=SIZE,
                 outputHeight=SIZE, zDim=ZDIM)
    model, spec = get_model(cfg, None)
    x = jax.random.uniform(jax.random.key(0), (BATCH, SIZE, SIZE, 1))
    variables = model.init(
        {"params": jax.random.key(1), "sample": jax.random.key(2),
         "dropout": jax.random.key(3)}, x)
    o1 = model.apply(variables, x, rngs={"sample": jax.random.key(10)})
    o2 = model.apply(variables, x, rngs={"sample": jax.random.key(11)})
    assert jnp.allclose(o1["z_mu"], o2["z_mu"])
    assert not jnp.allclose(o1["x_hat"], o2["x_hat"])


def test_encoder_stage_count():
    """Unified encoder: log2(W) - log2(inter) stages with filter schedule
    min(128, 32*2^i) (`models/customlayers.py:16-24`)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
        UnifiedEncoder,
    )

    enc = UnifiedEncoder(image_width=64, intermediate_resolution=8)
    x = jnp.zeros((1, 64, 64, 1))
    variables = enc.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    convs = [k for k in params if k.startswith("enc_conv")]
    assert len(convs) == 3  # log2(64) - log2(8)
    assert params["enc_conv_0"]["kernel"].shape == (5, 5, 1, 32)
    assert params["enc_conv_1"]["kernel"].shape == (5, 5, 32, 64)
    assert params["enc_conv_2"]["kernel"].shape == (5, 5, 64, 128)
    out = enc.apply(variables, x, train=False,
                    mutable=["batch_stats"])[0]
    assert out.shape == (1, 8, 8, 128)
