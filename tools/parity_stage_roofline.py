#!/usr/bin/env python
"""Per-stage roofline of the PARITY AE train step (docs/DESIGN.md table).

Times each stage of the flagship parity autoencoder (encoder pyramid
128^2 -> 8^2, dense bottleneck, decoder pyramid, decoder LAST stage alone)
as its own jitted forward+backward program at the parity shapes
(batch 128, 128x128, bf16 compute / f32 params), and compares each
measured time against that stage's compute ceiling (XLA cost-analysis
FLOPs / chip peak) and bandwidth ceiling (XLA cost-analysis bytes
accessed / HBM peak).  The question this answers (VERDICT r4 next #8):
is the parity step's ~3% MFU a framework inefficiency or the bound the
reference-mandated shapes impose?  (`models/customlayers.py:16-38`
defines those shapes.)

Tunnel-robust timing: each program runs its stage K times inside ONE
jitted lax.scan (serialized by data dependency), and the reported time is
the marginal slope between a K_LO and a K_HI run — the remote tunnel's
fixed dispatch/fetch latency cancels.

Usage:  python tools/parity_stage_roofline.py [--batch 128] [--image 128]
                                              [--fast]
``--fast`` rooflines the shipped fast-profile stages instead (s2d stem,
d2s head, reverse-free ConvT grad — the TPU-default execution profile):
is the default profile also at its bandwidth floor, or is there headroom?
Prints a markdown table + one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):  # the TPU plugin ignores the env var
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    DenseBottleneck,
    UnifiedDecoder,
    UnifiedEncoder,
    conv_transpose,
    leaky_relu,
)
from unsupervised_anomaly_detection_brain_mri_tpu.utils.misc import (
    device_peaks,
)
from flax import linen as nn

K_LO, K_HI, REPS = 2, 10, 3


class DecoderLastStage(nn.Module):
    """The parity decoder's final stage in isolation: ConvT(k=5, s=2,
    32ch) from 64^2 to 128^2 + BN + LeakyReLU + 1x1 output conv — the
    stage whose full-resolution 32-channel feature map (134 MB bf16 at
    batch 128) the round-3 profile blamed for the step's HBM traffic."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = conv_transpose(32, (5, 5), (2, 2), fast=False,
                           dtype=self.dtype, name="convt")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        x = leaky_relu(x)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="out")(x)


class D2SHeadStage(nn.Module):
    """The fast profile's replacement for DecoderLastStage: Conv(3x3,
    4*C_out) at HALF resolution + depth-to-space(2x2) — the 134 MB tensor
    never exists (`models/layers.py::UnifiedDecoder`, packed head)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
            depth_to_space,
        )

        x = nn.Conv(4, (3, 3), padding="SAME", dtype=self.dtype,
                    name="head")(x)
        return depth_to_space(x, 2)


def _stage_program(module, x, call_kw, seed=0):
    """(params, jitted scan-K fn, single-iter lowered) for fwd+bwd of
    ``sum(module(x))`` — the stage's own gradient program."""
    variables = jax.lax.stop_gradient(
        module.init({"params": jax.random.key(seed),
                     "dropout": jax.random.key(seed + 1)}, x, **call_kw))

    def loss(variables, x):
        mut = [k for k in variables if k != "params"]
        out = module.apply(variables, x, **call_kw, mutable=mut)
        if mut:
            out, _new_vars = out
        # squared loss: the output cotangent is data-dependent, so the
        # backward pass cannot be constant-folded away
        return sum(jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                   for leaf in jax.tree_util.tree_leaves(out))

    grad = jax.grad(loss)

    def k_iters(k):
        def body(carry, _):
            g = grad(variables, carry)
            # serialize iterations: fold a scalar of EVERY grad leaf back
            # into x — XLA only computes what feeds an output, so a single
            # leaf would let it prune most of the backward pass; scaling by
            # 1e-30 (not 0.0) keeps the multiply un-foldable.
            s = sum(jnp.sum(leaf)
                    for leaf in jax.tree_util.tree_leaves(g))
            return carry + (s * 1e-30).astype(carry.dtype), None

        def run(x):
            y, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(y)

        return jax.jit(run)

    single = jax.jit(lambda x: grad(variables, x))
    return k_iters, single, variables


def _time_marginal(k_iters, x):
    f_lo, f_hi = k_iters(K_LO), k_iters(K_HI)
    _ = float(f_lo(x))  # compile
    _ = float(f_hi(x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter(); _ = float(f_lo(x)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = float(f_hi(x)); t_hi = time.perf_counter() - t0
        if t_hi > t_lo:
            best = min(best, (t_hi - t_lo) / (K_HI - K_LO))
    return best if np.isfinite(best) else None


def _cost(single, x):
    c = single.lower(x).compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image", type=int, default=128)
    ap.add_argument("--fast", action="store_true",
                    help="roofline the fast-profile stages (s2d stem, "
                         "d2s head, reverse-free ConvT grad)")
    args = ap.parse_args()
    B, H = args.batch, args.image
    dev_kind = jax.devices()[0].device_kind.lower()
    # CPU smoke runs get placeholder ceilings: output keeps its shape
    peak_flops, peak_bw = device_peaks(dev_kind)

    rng = np.random.default_rng(0)
    x_img = jnp.asarray(rng.uniform(0, 1, (B, H, H, 1)).astype(np.float32))
    inter = 8
    h_lat = jnp.asarray(rng.uniform(
        0, 1, (B, inter, inter, 128)).astype(np.float32))
    x_half = jnp.asarray(rng.uniform(
        0, 1, (B, H // 2, H // 2, 32)).astype(np.float32))

    if args.fast:
        stages = [
            ("encoder 128^2->8^2 (s2d stem)",
             UnifiedEncoder(H, inter, space_to_depth_stem=True,
                            dtype=jnp.bfloat16), x_img, {"train": True}),
            ("bottleneck (dense z=128)", DenseBottleneck(128, 0.2,
                                                         dtype=jnp.bfloat16),
             h_lat, {"dropout": False}),
            ("decoder 8^2->128^2 (d2s head)",
             UnifiedDecoder(H, 1, inter, depth_to_space_head=True,
                            fast_convt_grad=True, dtype=jnp.bfloat16),
             h_lat, {"train": True}),
            ("decoder HEAD stage (d2s, computed at 64^2)", D2SHeadStage(),
             x_half, {"train": True}),
        ]
    else:
        stages = [
            ("encoder 128^2->8^2",
             UnifiedEncoder(H, inter, dtype=jnp.bfloat16),
             x_img, {"train": True}),
            ("bottleneck (dense z=128)", DenseBottleneck(128, 0.2,
                                                         dtype=jnp.bfloat16),
             h_lat, {"dropout": False}),
            ("decoder 8^2->128^2", UnifiedDecoder(H, 1, inter,
                                                  dtype=jnp.bfloat16), h_lat,
             {"train": True}),
            ("decoder LAST stage (64^2->128^2)", DecoderLastStage(), x_half,
             {"train": True}),
        ]

    rows, total_ms = [], 0.0
    for name, module, xin, call_kw in stages:
        k_iters, single, _ = _stage_program(module, xin, call_kw)
        t = _time_marginal(k_iters, xin)
        flops, bts = _cost(single, xin)
        if t is None:
            rows.append({"stage": name, "error": "noise-dominated"})
            continue
        t_comp = flops / peak_flops
        t_bw = bts / peak_bw
        bound = "compute" if t_comp >= t_bw else "bandwidth"
        rows.append({
            "stage": name, "measured_ms": round(1e3 * t, 3),
            "gflops": round(flops / 1e9, 2), "gbytes": round(bts / 1e9, 3),
            "compute_ceiling_ms": round(1e3 * t_comp, 3),
            "bandwidth_ceiling_ms": round(1e3 * t_bw, 3),
            "bound": bound,
            "pct_of_lightspeed": round(
                100 * max(t_comp, t_bw) / t, 1),
        })
        if "LAST" not in name and "HEAD stage" not in name:
            total_ms += 1e3 * t

    print("\n| stage | measured ms | GFLOP | GB | compute ceil ms | "
          "BW ceil ms | bound | % of lightspeed |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['stage']} | {r['error']} | | | | | | |")
            continue
        print(f"| {r['stage']} | {r['measured_ms']} | {r['gflops']} | "
              f"{r['gbytes']} | {r['compute_ceiling_ms']} | "
              f"{r['bandwidth_ceiling_ms']} | {r['bound']} | "
              f"{r['pct_of_lightspeed']} |")
    print(json.dumps({"device": dev_kind, "batch": B, "image": H,
                      "profile": "fast" if args.fast else "parity",
                      "stages": rows,
                      "stage_sum_ms": round(total_ms, 3)}))


if __name__ == "__main__":
    main()
