"""Adversarial trainers: AAE, ConstrainedAAE, fAnoGAN, AnoVAEGAN.

Re-designs the reference multi-`sess.run` GAN batch schedules
(`trainers/AAE.py:85-131`, `trainers/fAnoGAN.py:87-210`,
`trainers/AnoVAEGAN.py:95-160`) as single jitted steps: all sub-updates of
one batch (AE x k, critic x d_iters, generator x 1, ...) run inside one XLA
program via `lax.fori_loop`, with parameter-group masking standing in for
TF variable scopes (`trainers/AAE.py:60-68`).

WGAN-GP gradients are `jax.grad` of the critic w.r.t. the interpolates —
grad-of-grad under the parameter gradient, all compiled.  The slope
reduction keeps the reference's axis-1 quirk for image critics
(`trainers/fAnoGAN.py:55-57`, see losses.wgan_gp_penalty_from_grads).

Optimizers: Adam(lr, beta1=0.5, beta2=0.9) per group (`trainers/AAE.py:66-68`).
Early stopping monitors ``reconstructionLoss`` (`trainers/AAE.py:161`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from unsupervised_anomaly_detection_brain_mri_tpu.train import losses as L
from unsupervised_anomaly_detection_brain_mri_tpu.train.base import BaseTrainer
from unsupervised_anomaly_detection_brain_mri_tpu.train.state import (
    TrainState,
    gan_adam,
)

Array = jnp.ndarray
Batch = Dict[str, Array]


def path_mask(pred: Callable[[Tuple[str, ...]], bool]):
    """params -> bool pytree mask; pred sees the tuple of dict keys."""

    def build(params):
        def fn(path, leaf):
            keys = tuple(
                p.key if hasattr(p, "key") else str(p) for p in path)
            return pred(keys)

        return jax.tree_util.tree_map_with_path(fn, params)

    return build


def masked_adam(config, pred) -> optax.GradientTransformation:
    """Adam on the parameter group selected by ``pred``; every other
    parameter's update is zeroed (optax.masked alone passes non-masked
    gradients through unchanged, which would apply raw-gradient ascent to
    the other groups)."""
    mask = path_mask(pred)

    def inv_mask(params):
        return jax.tree_util.tree_map(lambda b: not b, mask(params))

    return optax.chain(
        optax.masked(gan_adam(config), mask),
        optax.masked(optax.set_to_zero(), inv_mask),
    )


def group_value_and_grad(loss_fn, params, pred):
    """``value_and_grad(has_aux=True)`` restricted to the parameter group
    selected by ``pred``: every other leaf enters the loss through
    ``stop_gradient``, so the substep's backward pass covers ONLY the
    group's subgraph.  The reference computed gradients only for each
    scope's ``var_list`` (`trainers/AAE.py:60-68`); differentiating the
    full tree and masking afterwards paid the whole model's backward on
    every critic substep — at 20 critic iters/batch that was most of the
    step.  Returns full-tree grads with zeros outside the group, exactly
    what the masked optimizers expect."""
    mask = path_mask(pred)(params)

    def wrapped(p):
        frozen = jax.tree_util.tree_map(
            lambda leaf, m: leaf if m else jax.lax.stop_gradient(leaf),
            p, mask)
        return loss_fn(frozen)

    return jax.value_and_grad(wrapped, has_aux=True)(params)


class AdversarialTrainerBase(BaseTrainer):
    """Shared machinery for latent-critic AAE-family trainers."""

    early_stop_metric = "reconstructionLoss"

    # parameter-group predicates (TF scope parity) — overridden per model
    def disc_pred(self, keys) -> bool:
        return any("discriminator" in k for k in keys)

    def gen_pred(self, keys) -> bool:
        # TF 'Encoder' scope = the conv pyramid only (`models/
        # adversarial_autoencoder.py:14`)
        return any(k == "encoder" for k in keys)

    def _variables(self, params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def sample_z(self, rng: Array, n: int) -> Array:
        return jax.random.normal(rng, (n, self.config.zDim))

    def model_inputs(self, batch, rng, train):
        """Models that consume a prior latent get one in every forward
        (parity: `trainers/AAE.py:166-172` feeds z in TRAIN and VAL, which
        also ensures the critic's parameters are created at init)."""
        if self.spec.takes_prior_z:
            z = self.sample_z(rng, batch["x"].shape[0])
            return (batch["x"], z), {}
        return (batch["x"],), {}


class AAE(AdversarialTrainerBase):
    """Adversarial AE (`trainers/AAE.py`).

    Reference schedule per batch (`trainers/AAE.py:85-131`): AE update x
    (20 if epoch <= 5 else 1), critic update x 20, generator update x 1.
    """

    d_iters: int = 20

    def optimizers(self):
        c = self.config
        return {
            "ae": gan_adam(c),
            "disc": masked_adam(c, self.disc_pred),
            "gen": masked_adam(c, self.gen_pred),
        }

    def ae_loss(self, outputs, batch) -> Dict[str, Array]:
        l2 = L.mean_per_sample(L.l2_elem(batch["x"], outputs["x_hat"]))
        return {
            "loss": jnp.mean(l2),
            "reconstructionLoss": L.l1_recon_sum(batch["x"], outputs["x_hat"]),
        }

    def compute_losses(self, outputs, batch):  # VAL path
        return self.ae_loss(outputs, batch)

    def epoch_static(self, epoch: int, phase: str) -> Dict[str, Any]:
        if self.check_phase(phase) != "TRAIN":
            return {}
        return {"ae_iters": self.d_iters if epoch <= 5 else 1}

    # -- substeps ------------------------------------------------------

    def _forward(self, params, batch_stats, rng, batch, z):
        """Full model forward (with critic wiring) under train-mode norm."""
        outputs, new_bs = None, batch_stats
        variables = self._variables(params, batch_stats)
        mutable = ["batch_stats"] if batch_stats else False
        rngs = self._rng_streams(rng)
        res = self.model.apply(
            variables, batch["x"], z, train=True, dropout=True,
            rngs=rngs, mutable=mutable)
        if mutable:
            outputs, mut = res
            new_bs = mut.get("batch_stats", batch_stats)
        else:
            outputs = res
        return outputs, new_bs

    def _disc_loss(self, params, batch_stats, rng, batch, z):
        outputs, new_bs = self._forward(params, batch_stats, rng, batch, z)
        disc_loss = L.wgan_disc_loss(outputs["d"], outputs["d_"])
        variables = self._variables(params, batch_stats)

        def d_of(zh):
            return jnp.sum(self.model.apply(
                variables, zh, method="discriminate"))

        ddx = jax.grad(d_of)(outputs["z_hat"])
        gp = L.wgan_gp_penalty_from_grads(ddx, self.config.scale)
        return disc_loss + gp, new_bs

    def _gen_loss(self, params, batch_stats, rng, batch):
        outputs, new_bs = self._forward(params, batch_stats, rng, batch, None)
        d_ = self.model.apply(
            self._variables(params, new_bs), outputs["z_"],
            method="discriminate")
        return L.wgan_gen_loss(d_), new_bs

    def _build_train_step(self, ae_iters: int = 1, **static):
        opts = self.optimizers()
        c = self.config

        def step(state: TrainState, batch: Batch):
            params, bs = state.params, state.batch_stats
            opt_states = dict(state.opt_states)
            rng = state.rng

            # ---- AE updates (x ae_iters); the LAST iteration's losses ride
            # out of the loop as metrics (like disc_body's dl) — a separate
            # metrics forward would cost a full extra model apply per batch
            # and report a draw no update actually used
            def _ae_losses_shape(p, b, sub):
                outputs, _ = self._forward(p, b, sub, batch, None)
                return self.ae_loss(outputs, batch)

            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(_ae_losses_shape, params, bs, rng))

            def ae_body(_, carry):
                params, bs, opt_ae, rng, _prev = carry
                rng, sub = jax.random.split(rng)

                def loss_fn(p):
                    outputs, new_bs = self._forward(p, bs, sub, batch, None)
                    losses = self.ae_loss(outputs, batch)
                    return losses["loss"], (losses, new_bs)

                (_, (losses, new_bs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_ae = opts["ae"].update(grads, opt_ae, params)
                return (optax.apply_updates(params, updates), new_bs,
                        opt_ae, rng, losses)

            (params, bs, opt_states["ae"], rng,
             ae_losses) = jax.lax.fori_loop(
                0, ae_iters, ae_body,
                (params, bs, opt_states["ae"], rng, zero_losses))
            metrics = dict(ae_losses)

            # ---- critic updates (x d_iters)
            def disc_body(_, carry):
                params, bs, opt_d, rng, _ = carry
                rng, zr, sub = jax.random.split(rng, 3)
                z = self.sample_z(zr, batch["x"].shape[0])

                def loss_fn(p):
                    return self._disc_loss(p, bs, sub, batch, z)

                (dl, new_bs), grads = group_value_and_grad(
                    loss_fn, params, self.disc_pred)
                updates, opt_d = opts["disc"].update(grads, opt_d, params)
                return (optax.apply_updates(params, updates), new_bs, opt_d,
                        rng, dl)

            params, bs, opt_states["disc"], rng, disc_l = jax.lax.fori_loop(
                0, self.d_iters, disc_body,
                (params, bs, opt_states["disc"], rng, jnp.float32(0)))
            metrics["disc_loss"] = disc_l

            # ---- generator update (x 1)
            rng, sub = jax.random.split(rng)

            def gen_fn(p):
                return self._gen_loss(p, bs, sub, batch)

            (gl, bs), grads = group_value_and_grad(
                gen_fn, params, self.gen_pred)
            updates, opt_states["gen"] = opts["gen"].update(
                grads, opt_states["gen"], params)
            params = optax.apply_updates(params, updates)
            metrics["gen_loss"] = gl

            new_state = state.replace(
                params=params, batch_stats=bs, opt_states=opt_states,
                rng=rng, step=state.step + 1)
            return new_state, metrics

        return step


class ConstrainedAAE(AAE):
    """Constrained AAE (`trainers/ConstrainedAAE.py`): AAE schedule with the
    latent-consistency term in the AE loss (`:45-61`)."""

    def ae_loss(self, outputs, batch):
        out = L.constrained_loss(batch["x"], outputs, self.config.rho, "z_")
        return out


class AnoVAEGAN(AdversarialTrainerBase):
    """AnoVAEGAN (`trainers/AnoVAEGAN.py`): per batch — VAE step over
    encoder+generator, generator step, 5 critic steps."""

    d_iters: int = 5

    def gen_pred(self, keys) -> bool:
        return any(k in ("generator", "intermediate_conv_reverse",
                         "dec_dense") for k in keys)

    def enc_pred(self, keys) -> bool:
        return any(k in ("encoder", "intermediate_conv", "mu_layer",
                         "sigma_layer") for k in keys)

    def disc_pred(self, keys) -> bool:
        return any(k.startswith("disc") for k in keys)

    def optimizers(self):
        c = self.config
        return {
            "vae": masked_adam(
                c, lambda ks: self.enc_pred(ks) or self.gen_pred(ks)),
            "gen": masked_adam(c, self.gen_pred),
            "disc": masked_adam(c, self.disc_pred),
        }

    def _forward(self, params, batch_stats, rng, batch):
        variables = self._variables(params, batch_stats)
        mutable = ["batch_stats"] if batch_stats else False
        res = self.model.apply(
            variables, batch["x"], train=True, dropout=True,
            rngs=self._rng_streams(rng), mutable=mutable)
        if mutable:
            outputs, mut = res
            return outputs, mut.get("batch_stats", batch_stats)
        return res, batch_stats

    def vae_losses(self, outputs, batch) -> Dict[str, Array]:
        kl = L.vae_kl(outputs["z_mu"], outputs["z_sigma"])
        rec_sum = L.l1_recon_sum(batch["x"], outputs["out"])
        return {
            "kl": jnp.mean(kl),
            "reconstructionLoss": rec_sum,
            "loss": rec_sum,
            "enc_loss": rec_sum + self.config.kl_weight * jnp.mean(kl),
        }

    def compute_losses(self, outputs, batch):  # VAL path
        return self.vae_losses(outputs, batch)

    def _disc_loss(self, params, batch_stats, rng, batch):
        outputs, new_bs = self._forward(params, batch_stats, rng, batch)
        disc_loss = L.wgan_disc_loss(outputs["d"], outputs["d_"])
        variables = self._variables(params, batch_stats)

        def d_of(xh):
            _, d = self.model.apply(variables, xh, train=False,
                                    method="discriminate")
            return jnp.sum(d)

        ddx = jax.grad(d_of)(outputs["x_hat_gp"])
        gp = L.wgan_gp_penalty_from_grads(ddx, self.config.scale)
        return disc_loss + gp, new_bs

    def _build_train_step(self, **static):
        opts = self.optimizers()

        def step(state: TrainState, batch: Batch):
            params, bs = state.params, state.batch_stats
            opt_states = dict(state.opt_states)
            rng = state.rng

            # ---- VAE (encoder+generator) update
            rng, sub = jax.random.split(rng)

            def vae_fn(p):
                outputs, new_bs = self._forward(p, bs, sub, batch)
                losses = self.vae_losses(outputs, batch)
                return losses["enc_loss"], (losses, new_bs)

            (_, (metrics, bs)), grads = group_value_and_grad(
                vae_fn, params,
                lambda ks: self.enc_pred(ks) or self.gen_pred(ks))
            updates, opt_states["vae"] = opts["vae"].update(
                grads, opt_states["vae"], params)
            params = optax.apply_updates(params, updates)

            # ---- generator update
            rng, sub = jax.random.split(rng)

            def gen_fn(p):
                outputs, new_bs = self._forward(p, bs, sub, batch)
                return L.wgan_gen_loss(outputs["d_"]), new_bs

            (gl, bs), grads = group_value_and_grad(
                gen_fn, params, self.gen_pred)
            updates, opt_states["gen"] = opts["gen"].update(
                grads, opt_states["gen"], params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["gen_loss"] = gl

            # ---- critic updates x d_iters
            def disc_body(_, carry):
                params, bs, opt_d, rng, _ = carry
                rng, sub = jax.random.split(rng)

                def loss_fn(p):
                    return self._disc_loss(p, bs, sub, batch)

                (dl, new_bs), grads = group_value_and_grad(
                    loss_fn, params, self.disc_pred)
                updates, opt_d = opts["disc"].update(grads, opt_d, params)
                return (optax.apply_updates(params, updates), new_bs, opt_d,
                        rng, dl)

            params, bs, opt_states["disc"], rng, dl = jax.lax.fori_loop(
                0, self.d_iters, disc_body,
                (params, bs, opt_states["disc"], rng, jnp.float32(0)))
            metrics["disc_loss"] = dl

            new_state = state.replace(
                params=params, batch_stats=bs, opt_states=opt_states,
                rng=rng, step=state.step + 1)
            return new_state, metrics

        return step


class FAnoGAN(AdversarialTrainerBase):
    """fAnoGAN (`trainers/fAnoGAN.py`): two sequential phases —
    epochs [0, numEpochs): WGAN (generator x1, critic x5 per batch);
    epochs [numEpochs, 2*numEpochs): izif encoder training."""

    d_iters: int = 5

    def gen_pred(self, keys) -> bool:
        return any(k in ("generator", "intermediate_conv_reverse",
                         "dec_dense", "gen_dense") for k in keys)

    def enc_pred(self, keys) -> bool:
        return any(k in ("encoder", "intermediate_conv", "z_layer",
                         "enc_dense") for k in keys)

    def disc_pred(self, keys) -> bool:
        return any(k.startswith("disc") for k in keys)

    def optimizers(self):
        c = self.config
        return {
            "gen": masked_adam(c, self.gen_pred),
            "disc": masked_adam(c, self.disc_pred),
            "enc": masked_adam(c, self.enc_pred),
        }

    def num_epochs(self) -> int:
        return 2 * self.config.numEpochs

    def epoch_static(self, epoch: int, phase: str) -> Dict[str, Any]:
        if self.check_phase(phase) != "TRAIN":
            return {}
        return {"phase2": epoch >= self.config.numEpochs}

    def compute_losses(self, outputs, batch):  # VAL path
        return L.fanogan_enc_loss(batch["x"], outputs, self.config.kappa)

    def _forward(self, params, batch_stats, rng, batch, z):
        variables = self._variables(params, batch_stats)
        mutable = ["batch_stats"] if batch_stats else False
        res = self.model.apply(
            variables, batch["x"], z, train=True, dropout=True,
            rngs=self._rng_streams(rng), mutable=mutable)
        if mutable:
            outputs, mut = res
            return outputs, mut.get("batch_stats", batch_stats)
        return res, batch_stats

    def _build_train_step(self, phase2: bool = False, **static):
        opts = self.optimizers()
        c = self.config

        if phase2:
            def step(state: TrainState, batch: Batch):
                rng, sub = jax.random.split(state.rng)

                def enc_fn(p):
                    outputs, new_bs = self._forward(
                        p, state.batch_stats, sub, batch, None)
                    losses = L.fanogan_enc_loss(batch["x"], outputs, c.kappa)
                    return losses["enc_loss"], (losses, new_bs)

                (_, (losses, bs)), grads = group_value_and_grad(
                    enc_fn, state.params, self.enc_pred)
                updates, opt_enc = opts["enc"].update(
                    grads, state.opt_states["enc"], state.params)
                params = optax.apply_updates(state.params, updates)
                new_state = state.replace(
                    params=params, batch_stats=bs,
                    opt_states={**state.opt_states, "enc": opt_enc},
                    rng=rng, step=state.step + 1)
                return new_state, losses

            return step

        def step(state: TrainState, batch: Batch):
            params, bs = state.params, state.batch_stats
            opt_states = dict(state.opt_states)
            rng = state.rng

            # ---- generator update
            rng, zr, sub = jax.random.split(rng, 3)
            z = self.sample_z(zr, batch["x"].shape[0])

            def gen_fn(p):
                outputs, new_bs = self._forward(p, bs, sub, batch, z)
                return L.wgan_gen_loss(outputs["d_"]), new_bs

            (gl, bs), grads = group_value_and_grad(
                gen_fn, params, self.gen_pred)
            updates, opt_states["gen"] = opts["gen"].update(
                grads, opt_states["gen"], params)
            params = optax.apply_updates(params, updates)

            # ---- critic updates x d_iters
            def disc_body(_, carry):
                params, bs, opt_d, rng, _ = carry
                rng, zr, sub = jax.random.split(rng, 3)
                z = self.sample_z(zr, batch["x"].shape[0])

                def loss_fn(p):
                    outputs, new_bs = self._forward(p, bs, sub, batch, z)
                    dl = L.wgan_disc_loss(outputs["d"], outputs["d_"])
                    variables = self._variables(p, bs)

                    def d_of(xh):
                        _, d = self.model.apply(
                            variables, xh, train=False, method="discriminate")
                        return jnp.sum(d)

                    ddx = jax.grad(d_of)(outputs["x_hat"])
                    gp = L.wgan_gp_penalty_from_grads(ddx, c.scale)
                    return dl + gp, new_bs

                (dl, new_bs), grads = group_value_and_grad(
                    loss_fn, params, self.disc_pred)
                updates, opt_d = opts["disc"].update(grads, opt_d, params)
                return (optax.apply_updates(params, updates), new_bs, opt_d,
                        rng, dl)

            params, bs, opt_states["disc"], rng, dl = jax.lax.fori_loop(
                0, self.d_iters, disc_body,
                (params, bs, opt_states["disc"], rng, jnp.float32(0)))

            metrics = {"gen_loss": gl, "disc_loss": dl,
                       "reconstructionLoss": jnp.float32(0)}
            new_state = state.replace(
                params=params, batch_stats=bs, opt_states=opt_states,
                rng=rng, step=state.step + 1)
            return new_state, metrics

        return step

    def validation_enabled(self, epoch: int) -> bool:
        """No VAL/early-stop during the WGAN phase (parity:
        `trainers/fAnoGAN.py:87-140`); encoder epochs validate on
        reconstructionLoss.  Resume/TensorBoard/profiler come from
        `BaseTrainer.fit` (parity: `trainers/DLMODEL.py:86-110`)."""
        return epoch >= self.config.numEpochs

    def phase_tag(self, epoch: int) -> str:
        return ("TRAIN_Encoder" if epoch >= self.config.numEpochs
                else "TRAIN_WGAN")
