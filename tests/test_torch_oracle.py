"""Second-opinion oracles in torch for the hardest loss formulas.

The golden-parity harness (test_golden_parity.py) re-implements the
reference recipe in numpy/scipy — but both it and the production losses
were transcribed from the TF1 source by the same process, so a shared
misreading would pass (round-3 VERDICT, "What's weak" #6).  This file is
an independent SECOND transcription: each oracle below follows the TF1
trainer line by line in torch ops (tile/expand/matmul/squeeze, the same
op-for-op structure the reference uses, including its quirks), and the
production jnp losses must agree on randomized inputs.

Oracle parity map (all into /root/reference/):
  * GMVAE dense 4-term loss .......... trainers/GMVAE.py:60-95
  * GMVAE spatial 4-term loss ........ trainers/GMVAE_spatial.py:59-93
  * mixture posterior p(c|z) ......... models/gaussian_mixture_variational_
                                       autoencoder.py:70-73 (spatial :60-63)
  * VAE KL (sigma form) .............. trainers/VAE.py:38
  * ceVAE combi loss ................. trainers/ceVAE.py:38-50
  * total variation .................. tf.image.total_variation (GMVAE.py:94)
  * WGAN-GP axis-1 slope quirk ....... trainers/fAnoGAN.py:55-57
  * constrained-AE objective ......... trainers/ConstrainedAE.py:37-43
"""

import math

import numpy as np
import pytest
import torch

import unsupervised_anomaly_detection_brain_mri_tpu.train.losses as L
from unsupervised_anomaly_detection_brain_mri_tpu.models.gmvae import (
    _mixture_posterior,
)

torch.manual_seed(0)


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _close(jax_val, torch_val, rtol=2e-5, atol=1e-5):
    np.testing.assert_allclose(np.asarray(jax_val),
                               torch_val.detach().numpy(),
                               rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# torch transcriptions (literal, op-for-op from the TF1 source)


def torch_gmvae_dense(x, out, dim_c, c_lambda):
    """`trainers/GMVAE.py:60-95`, torch op for TF op."""
    xz_mu = _t(out["xz_mu"])
    xt = _t(x)
    # 1. reconstruction: abs diff, sum axes [1,2,3], mean
    l1_sum = torch.sum(torch.abs(xt - xz_mu), dim=[1, 2, 3])
    mean_p_loss = torch.mean(l1_sum)
    # 2. E_c_w[KL(q(z|x) || p(z|w,c))]
    z_mu = _t(out["z_mu"]).unsqueeze(-1).expand(-1, -1, dim_c)
    z_logvar = _t(out["z_log_sigma"]).unsqueeze(-1).expand(-1, -1, dim_c)
    z_wc_mu = _t(out["z_wc_mus"])
    z_wc_lsi = _t(out["z_wc_log_sigma_invs"])
    pc = _t(out["pc"])
    d_mu_2 = (z_mu - z_wc_mu) ** 2
    d_var = (torch.exp(z_logvar) + d_mu_2) * (torch.exp(z_wc_lsi) + 1e-6)
    d_logvar = -1 * (z_wc_lsi + z_logvar)
    kl = (d_var + d_logvar - 1) * 0.5
    con = torch.sum(torch.matmul(kl, pc.unsqueeze(-1)).squeeze(-1), dim=1)
    mean_con_loss = torch.mean(con)
    # 3. KL(q(w|x) || N(0, I))
    w_mu, w_ls = _t(out["w_mu"]), _t(out["w_log_sigma"])
    w_loss = 0.5 * torch.sum(w_mu ** 2 + torch.exp(w_ls) - w_ls - 1, dim=1)
    mean_w_loss = torch.mean(w_loss)
    # 4. KL(q(c|z) || p(c)), clamped below at c_lambda
    closs1 = torch.sum(pc * torch.log(pc * dim_c + 1e-8), dim=[1])
    c_loss = torch.maximum(closs1, torch.full_like(closs1, c_lambda))
    mean_c_loss = torch.mean(c_loss)
    return {
        "reconstructionLoss": mean_p_loss,
        "conditional_prior_loss": mean_con_loss,
        "w_prior_loss": mean_w_loss,
        "c_prior_loss": mean_c_loss,
        "loss": mean_p_loss + mean_con_loss + mean_w_loss + mean_c_loss,
    }


def torch_gmvae_spatial(x, out, dim_c, c_lambda):
    """`trainers/GMVAE_spatial.py:59-93` (5-D tensors, reductions differ)."""
    xz_mu = _t(out["xz_mu"])
    xt = _t(x)
    l1_sum = torch.sum(torch.abs(xt - xz_mu), dim=[1, 2, 3])
    mean_p_loss = torch.mean(l1_sum)
    z_mu = _t(out["z_mu"]).unsqueeze(-1).expand(-1, -1, -1, -1, dim_c)
    z_logvar = (_t(out["z_log_sigma"]).unsqueeze(-1)
                .expand(-1, -1, -1, -1, dim_c))
    z_wc_mu = _t(out["z_wc_mus"])
    z_wc_lsi = _t(out["z_wc_log_sigma_invs"])
    pc = _t(out["pc"])
    d_mu_2 = (z_mu - z_wc_mu) ** 2
    d_var = (torch.exp(z_logvar) + d_mu_2) * (torch.exp(z_wc_lsi) + 1e-6)
    d_logvar = -1 * (z_wc_lsi + z_logvar)
    kl = (d_var + d_logvar - 1) * 0.5
    con = torch.sum(torch.matmul(kl, pc.unsqueeze(-1)).squeeze(-1),
                    dim=[1, 2, 3])
    mean_con_loss = torch.mean(con)
    w_mu, w_ls = _t(out["w_mu"]), _t(out["w_log_sigma"])
    w_loss = 0.5 * torch.sum(w_mu ** 2 + torch.exp(w_ls) - w_ls - 1,
                             dim=[1, 2, 3])
    mean_w_loss = torch.mean(w_loss)
    closs1 = torch.sum(pc * torch.log(pc * dim_c + 1e-8), dim=[3])
    c_loss = torch.maximum(closs1, torch.full_like(closs1, c_lambda))
    c_loss = torch.sum(c_loss, dim=[1, 2])
    mean_c_loss = torch.mean(c_loss)
    return {
        "reconstructionLoss": mean_p_loss,
        "conditional_prior_loss": mean_con_loss,
        "w_prior_loss": mean_w_loss,
        "c_prior_loss": mean_c_loss,
        "loss": mean_p_loss + mean_con_loss + mean_w_loss + mean_c_loss,
    }


def torch_mixture_posterior(z_sampled, z_wc_mus, z_wc_lsi):
    """`models/gaussian_mixture_variational_autoencoder.py:70-73` — incl.
    the reference's quirky normalizer (`- lsi + log(pi)`, not the textbook
    `+ lsi/2 - log(2*pi)/2`; softmax absorbs constants but NOT the lsi
    sign, so transcription errors here change pc)."""
    z = _t(z_sampled).unsqueeze(-1)
    mus, lsi = _t(z_wc_mus), _t(z_wc_lsi)
    loglh = (-0.5 * ((z - mus) ** 2) * torch.exp(lsi) - lsi
             + math.log(math.pi))
    loglh_sum = torch.sum(loglh, dim=-2)
    return torch.softmax(loglh_sum, dim=-1)


# ---------------------------------------------------------------------------
# randomized inputs


def _dense_outputs(rng, b=4, dz=3, dc=6, h=16):
    z_mu = rng.normal(size=(b, dz)).astype(np.float32)
    z_ls = rng.normal(size=(b, dz)).astype(np.float32) * 0.3
    z_wc_mus = rng.normal(size=(b, dz, dc)).astype(np.float32)
    z_wc_lsi = rng.normal(size=(b, dz, dc)).astype(np.float32) * 0.3
    z_sampled = rng.normal(size=(b, dz)).astype(np.float32)
    pc = np.asarray(
        _mixture_posterior(z_sampled, z_wc_mus, z_wc_lsi)["pc"])
    return {
        "xz_mu": rng.normal(size=(b, h, h, 1)).astype(np.float32),
        "z_mu": z_mu, "z_log_sigma": z_ls,
        "z_wc_mus": z_wc_mus, "z_wc_log_sigma_invs": z_wc_lsi,
        "z_sampled": z_sampled, "pc": pc,
        "w_mu": rng.normal(size=(b, 2)).astype(np.float32),
        "w_log_sigma": rng.normal(size=(b, 2)).astype(np.float32) * 0.3,
    }


def _spatial_outputs(rng, b=2, s=4, dz=2, dc=5, h=16):
    z_mu = rng.normal(size=(b, s, s, dz)).astype(np.float32)
    z_ls = rng.normal(size=(b, s, s, dz)).astype(np.float32) * 0.3
    z_wc_mus = rng.normal(size=(b, s, s, dz, dc)).astype(np.float32)
    z_wc_lsi = rng.normal(size=(b, s, s, dz, dc)).astype(np.float32) * 0.3
    z_sampled = rng.normal(size=(b, s, s, dz)).astype(np.float32)
    pc = np.asarray(
        _mixture_posterior(z_sampled, z_wc_mus, z_wc_lsi)["pc"])
    return {
        "xz_mu": rng.normal(size=(b, h, h, 1)).astype(np.float32),
        "z_mu": z_mu, "z_log_sigma": z_ls,
        "z_wc_mus": z_wc_mus, "z_wc_log_sigma_invs": z_wc_lsi,
        "z_sampled": z_sampled, "pc": pc,
        "w_mu": rng.normal(size=(b, s, s, 2)).astype(np.float32),
        "w_log_sigma": rng.normal(size=(b, s, s, 2)).astype(
            np.float32) * 0.3,
    }


KEYS = ["reconstructionLoss", "conditional_prior_loss", "w_prior_loss",
        "c_prior_loss", "loss"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gmvae_dense_loss_vs_torch(seed):
    rng = np.random.default_rng(seed)
    out = _dense_outputs(rng)
    x = rng.normal(size=out["xz_mu"].shape).astype(np.float32)
    got = L.gmvae_loss(x, {k: v for k, v in out.items()}, dim_c=6,
                       c_lambda=0.5, spatial=False)
    want = torch_gmvae_dense(x, out, dim_c=6, c_lambda=0.5)
    for k in KEYS:
        _close(got[k], want[k])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gmvae_spatial_loss_vs_torch(seed):
    rng = np.random.default_rng(seed)
    out = _spatial_outputs(rng)
    x = rng.normal(size=out["xz_mu"].shape).astype(np.float32)
    got = L.gmvae_loss(x, {k: v for k, v in out.items()}, dim_c=5,
                       c_lambda=0.5, spatial=True)
    want = torch_gmvae_spatial(x, out, dim_c=5, c_lambda=0.5)
    for k in KEYS:
        _close(got[k], want[k])


def test_gmvae_c_lambda_clamp_active_vs_torch():
    """c_loss = max(closs1, c_lambda) must clamp ELEMENTWISE before the
    mean — a uniform pc drives closs1 ~ 0 < c_lambda=1 (the preset value),
    exercising the clamped branch."""
    rng = np.random.default_rng(3)
    out = _dense_outputs(rng)
    out["pc"] = np.full_like(out["pc"], 1.0 / out["pc"].shape[-1])
    x = rng.normal(size=out["xz_mu"].shape).astype(np.float32)
    got = L.gmvae_loss(x, dict(out), dim_c=6, c_lambda=1.0, spatial=False)
    want = torch_gmvae_dense(x, out, dim_c=6, c_lambda=1.0)
    for k in KEYS:
        _close(got[k], want[k])
    # the clamp must actually have fired
    assert abs(float(got["c_prior_loss"]) - 1.0) < 1e-6


@pytest.mark.parametrize("spatial", [False, True])
def test_mixture_posterior_vs_torch(spatial):
    rng = np.random.default_rng(4)
    out = _spatial_outputs(rng) if spatial else _dense_outputs(rng)
    got = _mixture_posterior(out["z_sampled"], out["z_wc_mus"],
                             out["z_wc_log_sigma_invs"])["pc"]
    want = torch_mixture_posterior(out["z_sampled"], out["z_wc_mus"],
                                   out["z_wc_log_sigma_invs"])
    _close(got, want)


@pytest.mark.parametrize("seed", [0, 1])
def test_vae_and_cevae_losses_vs_torch(seed):
    rng = np.random.default_rng(seed)
    b, h, dz = 4, 16, 8
    x = rng.normal(size=(b, h, h, 1)).astype(np.float32)
    x_ce = rng.normal(size=(b, h, h, 1)).astype(np.float32)
    out = {
        "x_hat": rng.normal(size=(b, h, h, 1)).astype(np.float32),
        "x_hat_ce": rng.normal(size=(b, h, h, 1)).astype(np.float32),
        "z_mu": rng.normal(size=(b, dz)).astype(np.float32),
        "z_sigma": np.abs(rng.normal(size=(b, dz)).astype(np.float32)) + 0.1,
    }
    # VAE: rec = sum|x - x_hat|; kl = 0.5*sum(mu^2 + s^2 - log(s^2) - 1)
    # (`trainers/VAE.py:36-42` keeps SIGMA, not logvar)
    xt, xh = _t(x), _t(out["x_hat"])
    rec = torch.sum(torch.abs(xt - xh), dim=[1, 2, 3])
    mu, s = _t(out["z_mu"]), _t(out["z_sigma"])
    kl = 0.5 * torch.sum(mu ** 2 + s ** 2 - torch.log(s ** 2) - 1, dim=1)
    got = L.vae_loss(x, out)
    _close(got["loss"], torch.mean(rec + kl))
    _close(got["kl"], torch.mean(kl))
    # ceVAE combi (`trainers/ceVAE.py:38-50`): loss = mean(rec_vae+kl+rec_ce)
    rec_ce = torch.sum(torch.abs(_t(x_ce) - _t(out["x_hat_ce"])),
                       dim=[1, 2, 3])
    got_ce = L.cevae_loss(x, x_ce, out)
    _close(got_ce["loss"], torch.mean(rec + kl + rec_ce))
    _close(got_ce["reconstructionLoss"], 0.5 * torch.mean(rec + rec_ce))


def test_total_variation_vs_torch():
    """tf.image.total_variation parity: per-sample SUM of |dh| + |dw|."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 17, 13, 1)).astype(np.float32)
    xt = _t(x)
    tv = (torch.sum(torch.abs(xt[:, 1:] - xt[:, :-1]), dim=[1, 2, 3])
          + torch.sum(torch.abs(xt[:, :, 1:] - xt[:, :, :-1]),
                      dim=[1, 2, 3]))
    _close(L.total_variation(x), tv)


def test_wgan_gp_axis1_quirk_vs_torch():
    """`trainers/fAnoGAN.py:55-57` reduces slopes over axis 1 ONLY — for
    4-D image gradients that sums H alone (a reference quirk we keep)."""
    rng = np.random.default_rng(6)
    for shape in [(4, 8), (2, 8, 8, 1)]:
        ddx = rng.normal(size=shape).astype(np.float32)
        dt = _t(ddx)
        slopes = torch.sqrt(torch.sum(dt ** 2, dim=1) + 1e-12)
        want = torch.mean((slopes - 1.0) ** 2) * 10.0
        _close(L.wgan_gp_penalty_from_grads(ddx, 10.0), want)


def test_constrained_loss_vs_torch():
    """`trainers/ConstrainedAE.py:37-43`: loss = mean_b(mean_hwc L2 +
    rho * mean_z (z - z_rec)^2)."""
    rng = np.random.default_rng(7)
    b, h, dz = 4, 16, 8
    x = rng.normal(size=(b, h, h, 1)).astype(np.float32)
    out = {
        "x_hat": rng.normal(size=(b, h, h, 1)).astype(np.float32),
        "z": rng.normal(size=(b, dz)).astype(np.float32),
        "z_rec": rng.normal(size=(b, dz)).astype(np.float32),
    }
    l2 = torch.mean((_t(x) - _t(out["x_hat"])) ** 2, dim=[1, 2, 3])
    rec_z = torch.mean((_t(out["z"]) - _t(out["z_rec"])) ** 2, dim=1)
    got = L.constrained_loss(x, out, rho=1.0)
    _close(got["loss"], torch.mean(l2 + 1.0 * rec_z))
