"""Hardware check: fused decoder kernels vs XLA reference on the real TPU.

Step 1: forward + gradients at parity shapes (small batch), bf16 + f32.
Step 2: micro-throughput of the fused stage vs the XLA composition.
"""
import time

import jax
import jax.numpy as jnp

from unsupervised_anomaly_detection_brain_mri_tpu.ops.decoder_stage import (
    decoder_stage_reference,
)
from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_decoder import (
    fused_decoder_stage,
)
from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
    enable_persistent_compilation_cache,
)

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _fused_decoder_common import make_args  # noqa: E402

enable_persistent_compilation_cache()
print("device:", jax.devices()[0])




def loss_of(stage):
    def loss(*a):
        o, _, _ = stage(*a)
        return jnp.sum(jnp.sin(o * 3.0))
    return loss


def grads(stage, args):
    return jax.jit(jax.grad(loss_of(stage), argnums=(0, 1, 3, 4, 5)))(*args)


names = ["dx", "dWt", "dgamma", "dbeta", "dWh"]
# f32: fused vs XLA reference directly
args32 = make_args(4, 64, 64, 32, jnp.float32)
o_ref, _, _ = jax.jit(decoder_stage_reference)(*args32)
o_f, _, _ = jax.jit(fused_decoder_stage)(*args32)
err = float(jnp.abs(o_f - o_ref).max()) / float(jnp.abs(o_ref).max())
print(f"float32: fwd rel err {err:.2e}")
assert err < 2e-4
g_truth = grads(decoder_stage_reference, args32)  # f32 ground truth
g_f32 = grads(fused_decoder_stage, args32)
for n, a, b in zip(names, g_f32, g_truth):
    sc = max(float(jnp.abs(b).max()), 1e-4)
    rel = float(jnp.abs(a - b).max()) / sc
    print(f"  {n}: rel {rel:.2e}")
    assert rel < 1e-3, f"{n} f32 mismatch on hardware"

# bf16: BOTH paths round; judge each against the f32 ground truth
args16 = make_args(4, 64, 64, 32, jnp.bfloat16)
o_ref16, _, _ = jax.jit(decoder_stage_reference)(*args16)
o_f16, _, _ = jax.jit(fused_decoder_stage)(*args16)
err = float(jnp.abs(o_f16 - o_ref16).max()) / float(jnp.abs(o_ref16).max())
print(f"bfloat16: fwd rel err vs bf16 XLA {err:.2e}")
assert err < 5e-2
g_ref16 = grads(decoder_stage_reference, args16)
g_f16 = grads(fused_decoder_stage, args16)
for n, a, b, t in zip(names, g_f16, g_ref16, g_truth):
    sc = max(float(jnp.abs(t).max()), 1e-4)
    e_fused = float(jnp.abs(a.astype(jnp.float32) - t).max()) / sc
    e_xla = float(jnp.abs(b.astype(jnp.float32) - t).max()) / sc
    print(f"  {n}: fused-vs-f32truth {e_fused:.2e}  xla16-vs-f32truth {e_xla:.2e}")
    assert e_fused < max(3.0 * e_xla, 5e-2), f"{n} bf16 worse than XLA bf16"

# micro-throughput (fwd+bwd) at parity shapes, batch 128 bf16
args = make_args(128, 64, 64, 32, jnp.bfloat16)


def value_and_grads(stage):
    def loss(*a):
        o, _, _ = stage(*a)
        return jnp.sum(o * o)

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))


for name, stage in (("xla_reference", decoder_stage_reference),
                    ("fused_pallas", fused_decoder_stage)):
    f = value_and_grads(stage)
    v, g = f(*args)
    _ = float(v)  # force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            v, g = f(*args)
        _ = float(v)
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"{name}: {best * 1e3:.2f} ms/step (fwd+bwd, B=128)")
print("HW CHECK DONE")
