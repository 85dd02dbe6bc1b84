"""Fused decoder-last-stage kernels (VERDICT r2 item 1).

The phase-decomposed stage (`ops/decoder_stage.py`) is checked against
the standard flax composition, the Pallas kernels
(`ops/pallas_decoder.py`, interpret mode off-TPU) against the
phase-decomposed reference — forward AND all seven gradients — and the
`Config.fusedDecoderHead` integration for parameter-tree compatibility
and numerical equivalence with the flag off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from unsupervised_anomaly_detection_brain_mri_tpu.ops.decoder_stage import (
    decoder_stage_eval,
    decoder_stage_reference,
)
from unsupervised_anomaly_detection_brain_mri_tpu.ops.pallas_decoder import (
    fused_decoder_stage,
)


def _args(B=3, H=8, Cin=6, Cout=4, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, H, Cin)).astype(dtype))
    Wt = jnp.asarray(rng.normal(0, 0.2, (5, 5, Cin, Cout)).astype(np.float32))
    bt = jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (Cout,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32))
    Wh = jnp.asarray(rng.normal(0, 0.3, (Cout, 1)).astype(np.float32))
    bh = jnp.asarray(rng.normal(0, 0.1, (1,)).astype(np.float32))
    return x, Wt, bt, gamma, beta, Wh, bh


class _FlaxStage(nn.Module):
    """The standard composition the fused stage must reproduce."""

    features: int = 4

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.ConvTranspose(self.features, (5, 5), strides=(2, 2),
                             padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.leaky_relu(x, negative_slope=0.3)
        x = nn.Conv(1, (1, 1), padding="SAME")(x)
        return x


def test_reference_stage_matches_flax_composition():
    x, Wt, bt, gamma, beta, Wh, bh = _args()
    st = _FlaxStage()
    vs = st.init(jax.random.key(0), x)
    p = {"ConvTranspose_0": {"kernel": Wt, "bias": bt},
         "BatchNorm_0": {"scale": gamma, "bias": beta},
         "Conv_0": {"kernel": Wh[None, None], "bias": bh}}
    vs = {"params": p, "batch_stats": vs["batch_stats"]}
    out_flax, mut = st.apply(vs, x, train=True, mutable=["batch_stats"])
    out, mean, var = decoder_stage_reference(x, Wt, bt, gamma, beta, Wh, bh)
    np.testing.assert_allclose(out, out_flax, atol=2e-5)
    # running stats: flax applies ra = m*ra + (1-m)*batch from (0, 1)
    np.testing.assert_allclose(
        mut["batch_stats"]["BatchNorm_0"]["mean"], 0.01 * mean, atol=1e-7)
    np.testing.assert_allclose(
        mut["batch_stats"]["BatchNorm_0"]["var"], 0.99 + 0.01 * var,
        atol=1e-6)
    # eval mode
    vs2 = {"params": p, "batch_stats": mut["batch_stats"]}
    out_flax_e = st.apply(vs2, x, train=False)
    out_e = decoder_stage_eval(
        x, Wt, bt, gamma, beta, Wh, bh,
        mut["batch_stats"]["BatchNorm_0"]["mean"],
        mut["batch_stats"]["BatchNorm_0"]["var"])
    np.testing.assert_allclose(out_e, out_flax_e, atol=2e-5)


def test_pallas_forward_matches_reference():
    args = _args()
    o_ref, m_ref, v_ref = decoder_stage_reference(*args)
    o_f, m_f, v_f = fused_decoder_stage(*args)
    np.testing.assert_allclose(o_f, o_ref, atol=2e-5)
    np.testing.assert_allclose(m_f, m_ref, atol=1e-5)
    np.testing.assert_allclose(v_f, v_ref, atol=1e-5)


@pytest.mark.slow
def test_pallas_gradients_match_reference():
    # nightly: the fused head is experimental + off by default; forward
    # match, param-tree, and model equivalence stay in the fast tier
    args = _args(B=2, H=6, Cin=5, Cout=3, seed=1)

    def loss_ref(*a):
        o, _, _ = decoder_stage_reference(*a)
        return jnp.sum(jnp.sin(o * 3.0))

    def loss_f(*a):
        o, _, _ = fused_decoder_stage(*a)
        return jnp.sum(jnp.sin(o * 3.0))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_f = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    names = ["dx", "dWt", "dbt", "dgamma", "dbeta", "dWh", "dbh"]
    for n, a, b in zip(names, g_f, g_ref):
        if n == "dbt":
            # analytically zero: BatchNorm's mean-subtraction absorbs the
            # ConvT bias — both paths return only rounding noise
            assert float(jnp.abs(a).max()) < 1e-3
            assert float(jnp.abs(b).max()) < 1e-3
            continue
        scale = max(float(jnp.abs(b).max()), 1e-4)
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 1e-4, f"{n}: rel err {rel}"


def test_fused_head_param_tree_compatible():
    """fusedDecoderHead must share the exact parameter/batch_stats tree
    with the standard decoder (checkpoints interchangeable)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
    from unsupervised_anomaly_detection_brain_mri_tpu.models.registry import (
        get_model,
    )

    x = jnp.zeros((2, 32, 32, 1), jnp.float32)
    trees = {}
    for fused in (False, True):
        cfg = Config(trainer="AE", model="autoencoder", batchsize=2,
                     outputWidth=32, outputHeight=32, zDim=16,
                     compute_dtype="float32", fusedDecoderHead=fused)
        model, _ = get_model(cfg, jnp.float32)
        vs = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, x, train=False,
                        dropout=False)
        trees[fused] = vs
    flat_a = jax.tree_util.tree_map(jnp.shape, trees[False])
    flat_b = jax.tree_util.tree_map(jnp.shape, trees[True])
    assert jax.tree_util.tree_structure(flat_a) == \
        jax.tree_util.tree_structure(flat_b)
    assert flat_a == flat_b


def test_fused_head_model_equivalence():
    """Same params, flag on vs off: identical outputs in train and eval
    (off-TPU the fused path routes to the phase-decomposed reference —
    the Pallas kernels are covered by the tests above)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
    from unsupervised_anomaly_detection_brain_mri_tpu.models.registry import (
        get_model,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    cfg = Config(trainer="AE", model="autoencoder", batchsize=2,
                 outputWidth=32, outputHeight=32, zDim=16,
                 compute_dtype="float32")
    model_std, _ = get_model(cfg, jnp.float32)
    model_fused, _ = get_model(
        cfg.replace(fusedDecoderHead=True), jnp.float32)
    vs = model_std.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, x, train=False,
                        dropout=False)

    for train in (True, False):
        kw = dict(train=train, dropout=False)
        if train:
            o_std, mut_std = model_std.apply(
                vs, x, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2)}, **kw)
            o_f, mut_f = model_fused.apply(
                vs, x, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2)}, **kw)
            bs_std = jax.tree_util.tree_leaves(mut_std)
            bs_f = jax.tree_util.tree_leaves(mut_f)
            for a, b in zip(bs_f, bs_std):
                np.testing.assert_allclose(a, b, atol=1e-5)
        else:
            o_std = model_std.apply(vs, x, **kw)
            o_f = model_fused.apply(vs, x, **kw)
        np.testing.assert_allclose(
            o_f["x_hat"], o_std["x_hat"], atol=3e-5,
            err_msg=f"train={train}")


@pytest.mark.slow
def test_fused_head_training_step_equivalence(synth_dataset):
    """One full AE train step with the fused head matches the standard
    path (loss and parameter update) at float32 tolerance."""
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Config
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    losses = {}
    params = {}
    for fused in (False, True):
        cfg = Config(trainer="AE", model="autoencoder", batchsize=4,
                     outputWidth=32, outputHeight=32, zDim=16, numEpochs=1,
                     compute_dtype="float32", fusedDecoderHead=fused)
        tr = get_trainer("AE")(cfg)
        state = tr.init_state(jax.random.key(3))
        step = jax.jit(tr._build_train_step())
        batch = {"x": jnp.asarray(synth_dataset.slices("TRAIN")[:4])}
        state, metrics = step(state, batch)
        losses[fused] = float(metrics["loss"])
        params[fused] = state.params
    assert abs(losses[True] - losses[False]) < 1e-2 * max(
        abs(losses[False]), 1.0)
    a = jax.tree_util.tree_leaves(params[True])
    b = jax.tree_util.tree_leaves(params[False])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=5e-4)
