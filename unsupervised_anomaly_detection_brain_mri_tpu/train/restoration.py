"""Input-gradient restoration and gradient-based anomaly maps.

Parity targets:
  * `trainers/VAE_You.py:125-147` — 150 gradient-descent steps on the INPUT
    minimising ``pixel_loss + tv_lambda * TV(x - x_hat)``; the reference ran
    150 `sess.run` round-trips per slice; here the whole loop is ONE
    `lax.fori_loop` inside jit (the single biggest eval speedup, SURVEY 3.2).
  * `trainers/GMVAE.py:94-95,166-197` — same loop with the GMVAE 4-term loss.
  * `trainers/ceVAE.py:51,136-139` — one-shot gradient anomaly map
    ``L1_vae * |d loss_vae / d x|`` and restoration ``x - lambda * anomaly``.
  * (`trainers/VAE_You.py:149-173`'s ``determine_best_lambda`` sweep lives
    on ``BaseTrainer`` — it needs the trainer's ``_restoration_fn``.)

The restoration objective shares ONE model forward between the pixel loss
and the TV reconstruction term — exactly like the reference graph, where
`self.reconstruction` feeds both `self.loss` and `self.restore`
(`trainers/VAE_You.py:36-54`): a single `sess.run` evaluated one forward.
(An earlier design here closed over two separate forward functions, which
made XLA trace — and differentiate — the network twice per restoration
step; fusing them halved the per-step cost at identical math.)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from unsupervised_anomaly_detection_brain_mri_tpu.train.losses import (
    total_variation,
)

Array = jnp.ndarray

# outputs_fn(x, rng) -> (pixel_loss (B,), x_hat (B,H,W,C)) from ONE model
# forward — closes over params.  The rng drives dropout when the trainer
# restores with MC dropout on (`trainers/VAE_You.py:134` — "apply only
# during MC sampling"); trainers restoring deterministically ignore it.
RestorationFn = Callable[[Array, Array], Tuple[Array, Array]]


def restoration_grads(outputs_fn: RestorationFn, x: Array,
                      tv_lambda: Array, rng: Array) -> Array:
    """d(pixel_loss + tv_lambda*TV(x - x_hat)) / dx, like the reference
    graph `trainers/VAE_You.py:53-54`.  Both terms come from the SAME
    forward (and thus one shared dropout mask per step, matching the
    reference's single ``sess.run``)."""

    def total(x_in: Array) -> Array:
        pixel, x_hat = outputs_fn(x_in, rng)
        restore = tv_lambda * total_variation(x_in - x_hat)
        return jnp.sum(pixel + restore)

    return jax.grad(total)(x)


def restore_inputs(
    outputs_fn: RestorationFn,
    x: Array,
    tv_lambda: Array,
    restore_lr: float,
    restore_steps: int,
    rng: Array = None,
) -> Array:
    """Iterative input restoration: ``x <- x - lr * grads`` for
    ``restore_steps`` iterations, entirely on device.  The rng is folded
    per step so dropout-on restoration (MC sampling) draws a fresh mask
    every iteration, matching the reference's per-``sess.run`` sampling
    (`trainers/VAE_You.py:130-139`)."""
    if rng is None:
        rng = jax.random.key(0)

    def body(i, restored):
        g = restoration_grads(outputs_fn, restored, tv_lambda,
                              jax.random.fold_in(rng, i))
        return restored - restore_lr * g

    return jax.lax.fori_loop(0, restore_steps, body, x)


def gradient_anomaly_map(loss_vae_fn: Callable[[Array], Array],
                         l1_vae: Array, x: Array) -> Array:
    """ceVAE anomaly map: ``L1_vae * |d loss_vae / d x|``
    (`trainers/ceVAE.py:51`)."""
    g = jax.grad(lambda xi: jnp.sum(loss_vae_fn(xi)))(x)
    return l1_vae * jnp.abs(g)


