"""Shared argument builder for the fused-decoder-stage tools.

Both the hardware parity check and the dispatch-amortized scan bench must
measure the SAME configuration (shapes, seed, init scales); keeping the
builder in one place prevents silent drift between them.
"""
import jax.numpy as jnp
import numpy as np


def make_args(B, H, Cin, Cout, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B, H, H, Cin)).astype(np.float32)).astype(dtype)
    Wt = jnp.asarray(rng.normal(0, 0.2, (5, 5, Cin, Cout)).astype(np.float32))
    bt = jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (Cout,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32))
    Wh = jnp.asarray(rng.normal(0, 0.3, (Cout, 1)).astype(np.float32))
    bh = jnp.asarray(rng.normal(0, 0.1, (1,)).astype(np.float32))
    return x, Wt, bt, gamma, beta, Wh, bh
