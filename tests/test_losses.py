"""Golden-value tests for loss functions against hand-computed numpy.

SURVEY.md section 4(b): every loss formula is checked against the
reference's exact formulas computed independently in numpy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.train import losses as L


@pytest.fixture()
def data(rng):
    x = rng.uniform(0, 1, (3, 8, 8, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (3, 8, 8, 1)).astype(np.float32)
    return x, y


def test_l1_recon_sum(data):
    x, y = data
    expected = np.mean(np.sum(np.abs(x - y), axis=(1, 2, 3)))
    np.testing.assert_allclose(
        L.l1_recon_sum(jnp.asarray(x), jnp.asarray(y)), expected, rtol=1e-6)


def test_l2_recon_mean(data):
    x, y = data
    expected = np.mean(np.mean((x - y) ** 2, axis=(1, 2, 3)))
    np.testing.assert_allclose(
        L.l2_recon_mean(jnp.asarray(x), jnp.asarray(y)), expected, rtol=1e-6)


def test_vae_kl_sigma_form(rng):
    """KL = 0.5*sum(mu^2 + sigma^2 - log(sigma^2) - 1) (`trainers/VAE.py:38`)."""
    mu = rng.normal(size=(4, 7)).astype(np.float32)
    log_sigma = rng.normal(scale=0.3, size=(4, 7)).astype(np.float32)
    sigma = np.exp(log_sigma)
    expected = 0.5 * np.sum(
        mu ** 2 + sigma ** 2 - np.log(sigma ** 2) - 1.0, axis=1)
    got = L.vae_kl(jnp.asarray(mu), jnp.asarray(sigma))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_vae_loss_total(data, rng):
    x, y = data
    mu = rng.normal(size=(3, 5)).astype(np.float32)
    sigma = np.exp(rng.normal(scale=0.3, size=(3, 5)).astype(np.float32))
    out = L.vae_loss(jnp.asarray(x), {
        "x_hat": jnp.asarray(y), "z_mu": jnp.asarray(mu),
        "z_sigma": jnp.asarray(sigma)})
    rec = np.sum(np.abs(x - y), axis=(1, 2, 3))
    kl = 0.5 * np.sum(mu ** 2 + sigma ** 2 - np.log(sigma ** 2) - 1, axis=1)
    np.testing.assert_allclose(out["loss"], np.mean(rec + kl), rtol=1e-4)
    np.testing.assert_allclose(out["kl"], np.mean(kl), rtol=1e-4)


def test_total_variation_matches_tf_definition(rng):
    """tf.image.total_variation: sum |dx| + sum |dy| per image."""
    img = rng.uniform(size=(2, 6, 5, 1)).astype(np.float32)
    tv = L.total_variation(jnp.asarray(img))
    expected = (
        np.sum(np.abs(img[:, 1:] - img[:, :-1]), axis=(1, 2, 3))
        + np.sum(np.abs(img[:, :, 1:] - img[:, :, :-1]), axis=(1, 2, 3)))
    np.testing.assert_allclose(tv, expected, rtol=1e-6)


def test_wgan_gp_axis1_quirk(rng):
    """For 2-D latent grads: standard per-sample norm.  For 4-D image grads:
    the reference reduces ONLY axis 1 (`trainers/fAnoGAN.py:55-57`)."""
    g2 = rng.normal(size=(4, 9)).astype(np.float32)
    got = L.wgan_gp_penalty_from_grads(jnp.asarray(g2), 10.0)
    slopes = np.sqrt(np.sum(g2 ** 2, axis=1) + 1e-12)
    np.testing.assert_allclose(got, np.mean((slopes - 1) ** 2) * 10.0,
                               rtol=1e-5)

    g4 = rng.normal(size=(2, 6, 5, 1)).astype(np.float32)
    got4 = L.wgan_gp_penalty_from_grads(jnp.asarray(g4), 10.0)
    slopes4 = np.sqrt(np.sum(g4 ** 2, axis=1) + 1e-12)  # shape (2, 5, 1)
    np.testing.assert_allclose(got4, np.mean((slopes4 - 1) ** 2) * 10.0,
                               rtol=1e-5)


def test_gmvae_loss_dense_golden(rng):
    """GMVAE 4-term loss vs straight numpy transcription of
    `trainers/GMVAE.py:60-91`."""
    B, dz, dc, dw = 3, 4, 5, 2
    x = rng.uniform(size=(B, 8, 8, 1)).astype(np.float32)
    xz = rng.uniform(size=(B, 8, 8, 1)).astype(np.float32)
    z_mu = rng.normal(size=(B, dz)).astype(np.float32)
    z_ls = rng.normal(scale=0.2, size=(B, dz)).astype(np.float32)
    w_mu = rng.normal(size=(B, dw)).astype(np.float32)
    w_ls = rng.normal(scale=0.2, size=(B, dw)).astype(np.float32)
    zwc_mu = rng.normal(size=(B, dz, dc)).astype(np.float32)
    zwc_lsi = rng.normal(scale=0.2, size=(B, dz, dc)).astype(np.float32)
    pc_logit = rng.normal(size=(B, dc)).astype(np.float32)
    pc = np.exp(pc_logit) / np.exp(pc_logit).sum(-1, keepdims=True)
    c_lambda = 0.5

    outputs = {k: jnp.asarray(v) for k, v in dict(
        xz_mu=xz, z_mu=z_mu, z_log_sigma=z_ls, w_mu=w_mu, w_log_sigma=w_ls,
        z_wc_mus=zwc_mu, z_wc_log_sigma_invs=zwc_lsi, pc=pc).items()}
    got = L.gmvae_loss(jnp.asarray(x), outputs, dc, c_lambda, spatial=False)

    # numpy transcription
    mean_p = np.mean(np.sum(np.abs(x - xz), axis=(1, 2, 3)))
    zm = np.tile(z_mu[..., None], (1, 1, dc))
    zl = np.tile(z_ls[..., None], (1, 1, dc))
    d_mu2 = (zm - zwc_mu) ** 2
    d_var = (np.exp(zl) + d_mu2) * (np.exp(zwc_lsi) + 1e-6)
    d_logvar = -(zwc_lsi + zl)
    kl = (d_var + d_logvar - 1) * 0.5
    con = np.mean(np.sum(np.squeeze(kl @ pc[..., None], -1), axis=1))
    w_loss = np.mean(0.5 * np.sum(
        w_mu ** 2 + np.exp(w_ls) - w_ls - 1, axis=1))
    closs1 = np.sum(pc * np.log(pc * dc + 1e-8), axis=1)
    c_loss = np.mean(np.maximum(closs1, c_lambda))

    np.testing.assert_allclose(got["reconstructionLoss"], mean_p, rtol=1e-5)
    np.testing.assert_allclose(got["conditional_prior_loss"], con, rtol=1e-4)
    np.testing.assert_allclose(got["w_prior_loss"], w_loss, rtol=1e-4)
    np.testing.assert_allclose(got["c_prior_loss"], c_loss, rtol=1e-4)
    np.testing.assert_allclose(
        got["loss"], mean_p + con + w_loss + c_loss, rtol=1e-4)


def test_constrained_loss(data, rng):
    x, y = data
    z = rng.normal(size=(3, 6)).astype(np.float32)
    z_rec = rng.normal(size=(3, 6)).astype(np.float32)
    got = L.constrained_loss(
        jnp.asarray(x),
        {"x_hat": jnp.asarray(y), "z": jnp.asarray(z),
         "z_rec": jnp.asarray(z_rec)}, rho=2.0)
    l2 = np.mean((x - y) ** 2, axis=(1, 2, 3))
    rec_z = np.mean((z - z_rec) ** 2, axis=1)
    np.testing.assert_allclose(got["loss"], np.mean(l2 + 2.0 * rec_z),
                               rtol=1e-5)
