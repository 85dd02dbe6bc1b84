"""Fused residual-postprocess Pallas kernel: parity with the reference
composition (residual -> eroded-mask -> prior -> 5^3 'reflect' median) in
interpreter mode on CPU.  The masks deliberately touch the image border so
the zero-shell argument the kernel relies on (erosion iterations >=
kernel//2 zero the border shell) is exercised at its minimum."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_postprocess import (
    fused_gate_ok,
    fused_residual_median_pallas,
    fused_residual_median_xla,
)


def _scipy_reference(x, rec, eroded, q, keep_pos):
    diff = np.maximum(x - rec, 0.0) if keep_pos else np.abs(x - rec)
    diff = np.where(x < q, 0.0, diff * eroded)
    return ndi.median_filter(diff.astype(np.float32), size=5)


def _border_touching_mask(rng, shape, iters):
    """Random mask with ones AT the image border, eroded with zero-border
    semantics — the minimum-gate stress case."""
    m = (rng.uniform(size=shape) > 0.3)
    m[:, :2, :] = True  # force border contact
    m[:, :, -2:] = True
    cross = ndi.generate_binary_structure(2, 1)
    out = np.stack([ndi.binary_erosion(s, cross, iterations=iters)
                    for s in m])
    return out.astype(np.float32)


@pytest.mark.parametrize("keep_pos", [True, False])
@pytest.mark.parametrize("use_prior", [True, False])
def test_fused_matches_scipy_and_xla(rng, keep_pos, use_prior):
    S, H, W = 8, 16, 16
    x = rng.uniform(size=(S, H, W)).astype(np.float32)
    rec = rng.uniform(size=(S, H, W)).astype(np.float32)
    eroded = _border_touching_mask(rng, (S, H, W), iters=2)  # == kernel//2
    q = float(np.quantile(x, 0.6)) if use_prior else -np.inf

    want = _scipy_reference(x, rec, eroded, q, keep_pos)
    got_xla = np.asarray(fused_residual_median_xla(
        jnp.asarray(x), jnp.asarray(rec), jnp.asarray(eroded),
        jnp.float32(q), keep_only_positive=keep_pos))
    got_pallas = np.asarray(fused_residual_median_pallas(
        jnp.asarray(x), jnp.asarray(rec), jnp.asarray(eroded),
        jnp.float32(q), keep_only_positive=keep_pos, interpret=True))

    np.testing.assert_allclose(got_xla, want, atol=1e-6)
    np.testing.assert_allclose(got_pallas, want, atol=1e-6)


def test_fused_nondivisible_slices(rng):
    S, H, W = 7, 16, 16
    x = rng.uniform(size=(S, H, W)).astype(np.float32)
    rec = rng.uniform(size=(S, H, W)).astype(np.float32)
    eroded = _border_touching_mask(rng, (S, H, W), iters=12)
    want = _scipy_reference(x, rec, eroded, -np.inf, True)
    got = np.asarray(fused_residual_median_pallas(
        jnp.asarray(x), jnp.asarray(rec), jnp.asarray(eroded),
        jnp.float32(-np.inf), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_gate():
    assert fused_gate_ok(True, 12, True)
    assert fused_gate_ok(True, 2, True)
    assert not fused_gate_ok(True, 1, True)   # shell thinner than reach
    assert not fused_gate_ok(False, 12, True)  # unmasked residual at border
    assert not fused_gate_ok(True, 12, False)  # no median requested
