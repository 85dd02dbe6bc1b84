"""Train state and optimizer factory.

Re-designs the reference's `trainers/DLMODEL.py:112-131` (`create_optimizer`
ADAM/SGD/MOMENTUM/RMS) and the GAN trainers' multi-optimizer var-scope
partitioning (`trainers/AAE.py:60-68`: Discriminator / Encoder / all) as a
functional TrainState pytree + optax transforms with parameter masks.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config, Optimizer

Array = jnp.ndarray


def make_optimizer(config: Config, learningrate: Optional[float] = None,
                   beta1: Optional[float] = None,
                   beta2: Optional[float] = None) -> optax.GradientTransformation:
    """Optimizer parity with `trainers/DLMODEL.py:112-131`."""
    lr = learningrate if learningrate is not None else config.learningrate
    b1 = beta1 if beta1 is not None else config.beta1
    b2 = beta2 if beta2 is not None else config.beta2
    opt = config.optimizer
    if opt == Optimizer.ADAM:
        return optax.adam(lr, b1=b1, b2=b2)
    if opt == Optimizer.SGD:
        return optax.sgd(lr)
    if opt == Optimizer.MOMENTUM:
        return optax.sgd(lr, momentum=0.9)
    if opt == Optimizer.RMSPROP:
        # the reference passes momentum=0.9 (`trainers/DLMODEL.py:113,120`)
        return optax.rmsprop(lr, momentum=0.9)
    raise ValueError(f"unknown optimizer {opt}")


def gan_adam(config: Config) -> optax.GradientTransformation:
    """Adam(beta1=0.5, beta2=0.9) used by every reference GAN optimizer
    (`trainers/AAE.py:66-68`)."""
    return optax.adam(config.learningrate, b1=0.5, b2=0.9)


class TrainState(struct.PyTreeNode):
    """Functional training state.

    ``opt_states`` maps optimizer name ('main' for deterministic trainers;
    'disc'/'gen'/'ae'/'enc' for GAN trainers) to its optax state.  ``rng``
    advances every step inside the jitted epoch scan.
    """

    params: Any
    batch_stats: Any
    opt_states: Dict[str, Any]
    rng: Array
    epoch: Array  # int32 scalar
    step: Array  # int32 scalar, global

    def variables(self) -> Mapping[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def count_params(params: Any) -> int:
    """Parity with `trainers/DLMODEL.py:133-152`."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
