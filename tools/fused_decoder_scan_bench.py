"""Dispatch-amortized micro-bench of the fused decoder stage.

The axon tunnel adds ~10+ ms fixed latency per jitted call, which drowns
a single-stage timing (the whole 8-step train epoch dispatches as ONE
scanned call and takes ~50 ms wall).  This bench chains N stage
fwd+bwd steps inside one `lax.scan` with a data dependence, so one
dispatch covers N device executions and the per-step time is honest.

Shapes are the PARITY last stage for 128x128 images: Cin=32 -> Cout=32,
input 64x64 (models/layers.py: filters = max(32, 128 // 2**3) = 32).
"""
import argparse
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




def scan_stepper(stage, n_steps, fwd_only=False):
    """One jitted call = n_steps chained stage executions."""

    def loss(x, Wt, rest):
        o, _, _ = stage(x, Wt, *rest)
        return jnp.sum(o * o)

    def body(carry, _):
        x, Wt, rest = carry
        if fwd_only:
            v = loss(x, Wt, rest)
            # data dependence: nudge x by the scalar so steps serialize
            x = x + (v * 1e-20).astype(x.dtype)
        else:
            v, (dx, dWt) = jax.value_and_grad(loss, argnums=(0, 1))(
                x, Wt, rest)
            x = x + (1e-12 * dx).astype(x.dtype)
            Wt = Wt + 1e-12 * dWt
        return (x, Wt, rest), v

    @jax.jit
    def run(x, Wt, rest):
        (x, Wt, _), vs = jax.lax.scan(body, (x, Wt, rest), None,
                                      length=n_steps)
        return vs[-1]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    enable_persistent_compilation_cache()
    print("device:", jax.devices()[0])
    a = make_args(args.batch, args.h, args.cin, args.cout, jnp.bfloat16)
    x, Wt, rest = a[0], a[1], a[2:]

    for mode, fwd_only in (("fwd", True), ("fwd+bwd", False)):
        results = {}
        for name, stage in (("xla", decoder_stage_reference),
                            ("fused", fused_decoder_stage)):
            run = scan_stepper(stage, args.steps, fwd_only)
            _ = float(run(x, Wt, rest))  # compile + warm
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _ = float(run(x, Wt, rest))
                best = min(best, time.perf_counter() - t0)
            per_step = best / args.steps * 1e3
            results[name] = per_step
            print(f"  {mode:8s} {name:6s}: {per_step:8.3f} ms/step "
                  f"(B={args.batch}, {args.h}->{2*args.h}, "
                  f"{args.cin}->{args.cout}ch)")
        print(f"  {mode:8s} speedup xla/fused: "
              f"{results['xla'] / results['fused']:.3f}x")


if __name__ == "__main__":
    main()
