"""Loss functions for every algorithm in the zoo — exact formula parity.

Each function reproduces the corresponding reference trainer's loss
*formulas* (not textbook versions); citations point into
`/root/reference/trainers/`.  All functions are pure jnp and jit-safe.

Conventions: images are NHWC float32; latent vectors are (B, Z).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# elementary reductions


def l1_elem(x: Array, y: Array) -> Array:
    """Elementwise absolute difference (`trainers/AE.py:28`)."""
    return jnp.abs(x - y)


def l2_elem(x: Array, y: Array) -> Array:
    """Elementwise squared error (`trainers/AAE.py:57`)."""
    return jnp.square(x - y)


def sum_per_sample(e: Array) -> Array:
    """Sum over all non-batch axes -> (B,)."""
    return jnp.sum(e, axis=tuple(range(1, e.ndim)))


def mean_per_sample(e: Array) -> Array:
    """Mean over all non-batch axes -> (B,)."""
    return jnp.mean(e, axis=tuple(range(1, e.ndim)))


def l1_recon_sum(x: Array, x_hat: Array) -> Array:
    """``mean_b(sum_hwc |x - x_hat|)`` (`trainers/AE.py:29`)."""
    return jnp.mean(sum_per_sample(l1_elem(x, x_hat)))


def l2_recon_mean(x: Array, x_hat: Array) -> Array:
    """``mean_b(mean_hwc (x - x_hat)^2)`` (`trainers/AAE.py:57-59`)."""
    return jnp.mean(mean_per_sample(l2_elem(x, x_hat)))


# ---------------------------------------------------------------------------
# VAE family


def vae_kl(z_mu: Array, z_sigma: Array) -> Array:
    """Per-sample analytic KL in the reference's sigma form:
    ``0.5 * sum(mu^2 + sigma^2 - log(sigma^2) - 1)`` (`trainers/VAE.py:38`).
    """
    s2 = jnp.square(z_sigma)
    return 0.5 * jnp.sum(jnp.square(z_mu) + s2 - jnp.log(s2) - 1.0, axis=1)


def vae_loss(x: Array, outputs: Dict[str, Array]) -> Dict[str, Array]:
    """VAE total loss (`trainers/VAE.py:36-42`)."""
    rec = sum_per_sample(l1_elem(x, outputs["x_hat"]))
    kl = vae_kl(outputs["z_mu"], outputs["z_sigma"])
    return {
        "reconstructionLoss": jnp.mean(rec),
        "kl": jnp.mean(kl),
        "loss": jnp.mean(rec + kl),
        "pixel_loss": rec + kl,  # per-sample, used by VAE_You restoration
    }


def cevae_loss(x: Array, x_ce: Array, outputs: Dict[str, Array]
               ) -> Dict[str, Array]:
    """ceVAE combi loss (`trainers/ceVAE.py:38-50`)."""
    rec_vae = sum_per_sample(l1_elem(x, outputs["x_hat"]))
    rec_ce = sum_per_sample(l1_elem(x_ce, outputs["x_hat_ce"]))
    kl = vae_kl(outputs["z_mu"], outputs["z_sigma"])
    return {
        "Rec_vae": jnp.mean(rec_vae),
        "Rec_ce": jnp.mean(rec_ce),
        "reconstructionLoss": 0.5 * jnp.mean(rec_vae + rec_ce),
        "kl": jnp.mean(kl),
        "loss": jnp.mean(rec_vae + kl + rec_ce),
        "loss_vae": jnp.mean(rec_vae + kl),
    }


# ---------------------------------------------------------------------------
# GMVAE (4-term loss) — `trainers/GMVAE.py:60-91` (dense),
# `trainers/GMVAE_spatial.py:59-93` (spatial 5-D reductions)


def gmvae_loss(x: Array, outputs: Dict[str, Array], dim_c: int,
               c_lambda: float, spatial: bool) -> Dict[str, Array]:
    xz_mu = outputs["xz_mu"]
    rec = sum_per_sample(l1_elem(x, xz_mu))
    mean_p_loss = jnp.mean(rec)

    z_mu = jnp.expand_dims(outputs["z_mu"], -1)
    z_logvar = jnp.expand_dims(outputs["z_log_sigma"], -1)
    z_wc_mu = outputs["z_wc_mus"]
    z_wc_lsi = outputs["z_wc_log_sigma_invs"]
    pc = outputs["pc"]

    d_mu_2 = jnp.square(z_mu - z_wc_mu)
    d_var = (jnp.exp(z_logvar) + d_mu_2) * (jnp.exp(z_wc_lsi) + 1e-6)
    d_logvar = -1.0 * (z_wc_lsi + z_logvar)
    kl = (d_var + d_logvar - 1.0) * 0.5
    # contract the mixture axis with pc, then sum remaining non-batch axes
    weighted = jnp.einsum("...zc,...c->...z", kl, pc)
    con_prior_loss = sum_per_sample(weighted)
    mean_con_loss = jnp.mean(con_prior_loss)

    w_mu, w_log_sigma = outputs["w_mu"], outputs["w_log_sigma"]
    w_loss = 0.5 * sum_per_sample(
        jnp.square(w_mu) + jnp.exp(w_log_sigma) - w_log_sigma - 1.0)
    mean_w_loss = jnp.mean(w_loss)

    closs1 = jnp.sum(pc * jnp.log(pc * dim_c + 1e-8), axis=-1)
    c_loss = jnp.maximum(closs1, c_lambda)
    if spatial:
        c_loss = sum_per_sample(c_loss)
    mean_c_loss = jnp.mean(c_loss)

    loss = mean_p_loss + mean_con_loss + mean_w_loss + mean_c_loss
    return {
        "reconstructionLoss": mean_p_loss,
        "conditional_prior_loss": mean_con_loss,
        "w_prior_loss": mean_w_loss,
        "c_prior_loss": mean_c_loss,
        "loss": loss,
    }


# ---------------------------------------------------------------------------
# adversarial (WGAN-GP) pieces


def total_variation(images: Array) -> Array:
    """Per-sample anisotropic TV, parity with ``tf.image.total_variation``:
    sum of absolute row and column differences -> (B,)."""
    dh = jnp.abs(images[:, 1:, :, :] - images[:, :-1, :, :])
    dw = jnp.abs(images[:, :, 1:, :] - images[:, :, :-1, :])
    return sum_per_sample(dh) + sum_per_sample(dw)


def wgan_gp_penalty_from_grads(ddx: Array, scale: float) -> Array:
    """Gradient penalty with the reference's axis-1 slope reduction quirk.

    The reference computes ``sqrt(sum(ddx^2, axis=1))`` on gradients of any
    rank (`trainers/fAnoGAN.py:55-57`): for 2-D latents that is the
    per-sample norm; for 4-D images it reduces the H axis only (a quirk we
    keep for exact parity).  Then ``mean((slopes - 1)^2) * scale``.
    """
    slopes = jnp.sqrt(jnp.sum(jnp.square(ddx), axis=1) + 1e-12)
    return jnp.mean(jnp.square(slopes - 1.0)) * scale


def wgan_disc_loss(d_real: Array, d_fake: Array) -> Array:
    """``mean(d_fake) - mean(d_real)`` (`trainers/AAE.py:43-46`)."""
    return jnp.mean(d_fake) - jnp.mean(d_real)


def wgan_gen_loss(d_fake: Array) -> Array:
    """``-mean(d_fake)``."""
    return -jnp.mean(d_fake)


def constrained_loss(x: Array, outputs: Dict[str, Array], rho: float,
                     z_key: str = "z") -> Dict[str, Array]:
    """Constrained-AE objective (`trainers/ConstrainedAE.py:37-43`)."""
    l2 = mean_per_sample(l2_elem(x, outputs["x_hat"]))
    rec_z = jnp.mean(l2_elem(outputs[z_key], outputs["z_rec"]), axis=1)
    return {
        "reconstructionLoss": l1_recon_sum(x, outputs["x_hat"]),
        "L2": jnp.mean(l2),
        "Rec_z": jnp.mean(rec_z),
        "loss": jnp.mean(l2 + rho * rec_z),
    }


def fanogan_enc_loss(x: Array, outputs: Dict[str, Array], kappa: float
                     ) -> Dict[str, Array]:
    """izif encoder loss (`trainers/fAnoGAN.py:60-66`)."""
    loss_img = jnp.mean(mean_per_sample(l2_elem(x, outputs["x_enc"])))
    loss_fts = jnp.mean(mean_per_sample(
        l2_elem(outputs["d_enc_features"], outputs["d_features"])))
    enc_loss = loss_img + kappa * loss_fts
    return {
        "loss_img": loss_img,
        "loss_fts": loss_fts,
        "enc_loss": enc_loss,
        "reconstructionLoss": l1_recon_sum(x, outputs["x_enc"]),
    }
