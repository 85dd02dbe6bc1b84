"""Train state and optimizer factory.

Re-designs the reference's `trainers/DLMODEL.py:112-131` (`create_optimizer`
ADAM/SGD/MOMENTUM/RMS) and the GAN trainers' multi-optimizer var-scope
partitioning (`trainers/AAE.py:60-68`: Discriminator / Encoder / all) as a
functional TrainState pytree + optax transforms with parameter masks.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

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


def masked(opt: optax.GradientTransformation,
           mask: Any) -> optax.GradientTransformation:
    return optax.masked(opt, mask)


def param_group_mask(params: Any, predicate: Callable[[Tuple[str, ...]], bool]
                     ) -> Any:
    """Boolean pytree mask selecting parameters whose path satisfies
    ``predicate`` (the functional analogue of TF var-name scoping,
    `trainers/AAE.py:62-64`)."""
    def label(path) -> bool:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path)
        return predicate(keys)

    def mask_fn(path, leaf):
        return label(path)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


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


def create_train_state(
    rng: Array,
    params: Any,
    batch_stats: Any,
    optimizers: Dict[str, optax.GradientTransformation],
) -> Tuple[TrainState, Dict[str, optax.GradientTransformation]]:
    opt_states = {name: opt.init(params) for name, opt in optimizers.items()}
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_states=opt_states,
        rng=rng,
        epoch=jnp.asarray(0, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
    )
    return state, optimizers


def count_params(params: Any) -> int:
    """Parity with `trainers/DLMODEL.py:133-152`."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
