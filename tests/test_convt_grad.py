"""Reverse-free ConvT kernel gradient (`ops/convt.py`, VERDICT r3 #4).

The decoder's ConvT(5x5, s=2) kernel gradient is the AE step's measured
pure waste: XLA materialises a spatial ``reverse`` of the full-resolution
cotangent (134 MB on the flagship shape).  These tests pin that the
reformulation is a pure execution change — bit-identical forward, shared
parameter tree, gradients equal to float reassociation — and that the big
reverse is actually gone from the compiled HLO.
"""

import re

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
from unsupervised_anomaly_detection_brain_mri_tpu.models.layers import (
    ConvTransposeNRG,
    conv_init,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer


def _pair(cin=6, cout=5, h=16, b=4, dtype=jnp.float32):
    ref = nn.ConvTranspose(cout, kernel_size=(5, 5), strides=(2, 2),
                           padding="SAME", kernel_init=conv_init,
                           dtype=dtype)
    new = ConvTransposeNRG(cout, dtype=dtype)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, h, h, cin)).astype(np.float32))
    vref = ref.init(jax.random.key(0), x)
    return ref, new, x, vref


def test_same_pad_matches_jax_conv_transpose():
    """`_same_pad_a` must reproduce the padding jax emits for 'SAME'."""
    from jax import lax

    from unsupervised_anomaly_detection_brain_mri_tpu.ops.convt import (
        _same_pad_a,
    )

    for k, s in [(5, 2), (3, 2), (5, 1), (4, 2), (2, 2), (5, 3)]:
        x = jnp.zeros((1, 8, 8, 2))
        w = jnp.zeros((k, k, 2, 3))
        jx = jax.make_jaxpr(lambda a, b: lax.conv_transpose(
            a, b, strides=(s, s), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))(x, w)
        eqn = [e for e in jx.jaxpr.eqns if "conv" in e.primitive.name][0]
        assert eqn.params["padding"][0][0] == _same_pad_a(k, s), (k, s)


@pytest.mark.parametrize("k,s", [(5, 2), (4, 2), (3, 2), (1, 2), (3, 1)])
def test_functional_parity_across_kernel_stride(k, s):
    """conv_transpose_nrev == lax.conv_transpose (forward bitwise, both
    gradients to float reassociation) for every (kernel, stride) shape the
    model zoo uses: 5x5/4x4/3x3/1x1 stride-2 decoders and the Chen
    resnet's 3x3 stride-1 ConvT."""
    from jax import lax

    from unsupervised_anomaly_detection_brain_mri_tpu.ops.convt import (
        conv_transpose_nrev,
    )

    rng = np.random.default_rng(k * 10 + s)
    x = jnp.asarray(rng.normal(size=(3, 12, 12, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 4, 6)).astype(np.float32))

    def ref(x, w):
        return lax.conv_transpose(x, w, strides=(s, s), padding="SAME",
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y_ref = ref(x, w)
    y_new = conv_transpose_nrev(x, w, s)
    np.testing.assert_array_equal(np.asarray(y_new), np.asarray(y_ref))

    g = jnp.asarray(rng.normal(size=y_ref.shape).astype(np.float32))
    dx_r, dw_r = jax.grad(lambda a, b: jnp.vdot(ref(a, b), g),
                          argnums=(0, 1))(x, w)
    dx_n, dw_n = jax.grad(
        lambda a, b: jnp.vdot(conv_transpose_nrev(a, b, s), g),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_n), np.asarray(dx_r),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_n), np.asarray(dw_r),
                               rtol=5e-4, atol=1e-5)


def test_forward_bit_identical_and_params_shared():
    ref, new, x, vref = _pair()
    y_ref = ref.apply(vref, x)
    y_new = new.apply(vref, x)  # SAME variables: shared checkpoint tree
    np.testing.assert_array_equal(np.asarray(y_new), np.asarray(y_ref))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradients_match_builtin(dtype):
    ref, new, x, vref = _pair(dtype=dtype)
    g_out = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, 32, 32, 5)).astype(np.float32))

    def loss(mod):
        def f(v, xx):
            return jnp.vdot(mod.apply(v, xx).astype(jnp.float32), g_out)
        return jax.grad(f, argnums=(0, 1))(vref, x)

    (dv_ref, dx_ref), (dv_new, dx_new) = loss(ref), loss(new)
    # contraction order differs (direct correlation vs reverse+conv), so
    # agreement is to float reassociation over B*H*W-length sums
    tol = dict(rtol=5e-4, atol=1e-5) if dtype == jnp.float32 else dict(
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dx_new, np.float32),
                               np.asarray(dx_ref, np.float32), **tol)
    ref_leaves = {str(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(dv_ref)}
    new_leaves = {str(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(dv_new)}
    assert set(ref_leaves) == set(new_leaves)
    for key in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(new_leaves[key], np.float32),
            np.asarray(ref_leaves[key], np.float32), **tol, err_msg=key)


def test_train_step_equivalent_and_no_big_reverse(synth_dataset):
    """Full AE train epoch with fastConvTGrad: losses match the standard
    path to float tolerance, and the compiled step's only reverses are
    kernel-sized (the 134 MB map reverse is gone)."""

    def run(fast):
        cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                     outputWidth=32, outputHeight=32, zDim=16, numEpochs=2,
                     compute_dtype="float32", fastConvTGrad=fast)
        tr = get_trainer("AE")(cfg)
        tr.fit(synth_dataset)
        return tr, [h["loss"] for h in tr.history if h["phase"] == "TRAIN"]

    tr_a, losses_ref = run(False)
    tr_b, losses_new = run(True)
    np.testing.assert_allclose(losses_new, losses_ref, rtol=1e-4)

    # HLO check on the flagship decoder shape (64 -> 128 channels-32 stage
    # analog at reduced size): no reverse of a tensor bigger than the
    # 5x5 kernels
    jitted = next(iter(tr_b._train_compiler._cache.values()))
    state = tr_b.init_state()
    pool = {"x": jnp.zeros((16, 32, 32, 1), jnp.float32)}
    idxs = jnp.zeros((2, 8), jnp.int32)
    hlo = jitted.lower(state, pool, idxs).compile().as_text()
    big = []
    for m in re.finditer(r"reverse\(", hlo):
        line = hlo[hlo.rfind("\n", 0, m.start()) + 1: hlo.find(
            "\n", m.end())]
        shape = re.search(r"\[([\d,]+)\]", line)
        if shape:
            dims = [int(d) for d in shape.group(1).split(",")]
            if np.prod(dims) > 5 * 5 * 128 * 128:
                big.append(line.strip()[:120])
    assert not big, big


@pytest.mark.parametrize("name", [
    "variational_autoencoder_Zimmerer",
    pytest.param("constrained_adversarial_autoencoder_Chen",
                 marks=pytest.mark.slow),
    pytest.param("fanogan_schlegl", marks=pytest.mark.slow),
])
def test_zoo_models_identical_forward_under_fast_convt_grad(name):
    """Every ConvT-bearing decoder family routes through the shared
    `conv_transpose` factory: with fast_convt_grad on/off the parameter
    tree and the forward are identical (same lax.conv_transpose call,
    shared checkpoints) — the switch changes ONLY the backward lowering.
    (For the Zimmerer/Chen/Schlegl families the registry keeps it OFF per
    the round-4 hardware measurements, so the fast twin is constructed
    directly here.)"""
    import dataclasses

    from unsupervised_anomaly_detection_brain_mri_tpu.models import get_model

    SIZE, ZDIM, BATCH = 32, 16, 2
    cfg = Config(model=name, outputWidth=SIZE, outputHeight=SIZE,
                 zDim=ZDIM, intermediateResolutions=(8, 8),
                 batchsize=BATCH, fastConvTGrad=False)
    model_a, spec = get_model(cfg, None)
    assert not model_a.fast_convt_grad
    model_b = dataclasses.replace(model_a, fast_convt_grad=True)
    x = jax.random.uniform(jax.random.key(0), (BATCH, SIZE, SIZE, 1))
    rngs = {k: jax.random.key(i + 1)
            for i, k in enumerate(("params",) + spec.rngs + ("sample",))}
    args = (x,)
    if spec.takes_prior_z:
        args = (x, jax.random.normal(jax.random.key(7), (BATCH, ZDIM)))
    va = model_a.init(rngs, *args, train=False, dropout=False)
    vb = model_b.init(rngs, *args, train=False, dropout=False)
    pa = {str(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(va["params"])}
    pb = {str(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(vb["params"])}
    assert set(pa) == set(pb)  # shared checkpoint tree
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    out_a = model_a.apply(va, *args, train=False, dropout=False,
                          rngs=apply_rngs)
    out_b = model_b.apply(va, *args, train=False, dropout=False,
                          rngs=apply_rngs)  # SAME variables
    ra = np.asarray(out_a[spec.reconstruction_key])
    rb = np.asarray(out_b[spec.reconstruction_key])
    np.testing.assert_array_equal(rb, ra)

    # gradients through the full model agree to float reassociation
    def loss(model, v):
        out = model.apply(v, *args, train=False, dropout=False,
                          rngs=apply_rngs)
        return jnp.sum(out[spec.reconstruction_key] ** 2)

    ga = jax.grad(lambda v: loss(model_a, v))(va)
    gb = jax.grad(lambda v: loss(model_b, v))(va)
    la = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(ga)}
    lb = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    for key in la:
        np.testing.assert_allclose(np.asarray(lb[key]), np.asarray(la[key]),
                                   rtol=5e-4, atol=1e-4, err_msg=key)
