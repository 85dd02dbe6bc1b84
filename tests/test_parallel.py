"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md 4(e))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_anomaly_detection_brain_mri_tpu.config import (
    Config,
    MeshConfig,
)
from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
    MeshContext,
    make_mesh,
    pad_batch_to,
)


@pytest.fixture(scope="module")
def ctx8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])


def test_mesh_construction(ctx8):
    assert ctx8.n_data == 8 and ctx8.n_model == 1
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = ctx8.shard_batch(x)
    assert xs.sharding.spec[0] == "data"


def test_pad_batch_to():
    b = np.arange(10, dtype=np.float32)[:, None]
    padded = pad_batch_to(b, 8)
    assert padded.shape[0] == 16
    np.testing.assert_array_equal(padded[10:], b[:6])


def test_data_parallel_training_step_matches_single_device(ctx8):
    """One AE train step on the 8-device mesh == single device (bitwise-ish)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    cfg = Config(trainer="AE", model="autoencoder", batchsize=16,
                 outputWidth=32, outputHeight=32, zDim=16,
                 compute_dtype="float32")
    x = np.random.default_rng(0).uniform(
        0, 1, (16, 32, 32, 1)).astype(np.float32)
    batch = {"x": jnp.asarray(x)}

    tr1 = get_trainer("AE")(cfg)
    s1 = tr1.init_state()
    step1 = jax.jit(tr1._build_train_step())
    s1, m1 = step1(s1, batch)

    tr8 = get_trainer("AE")(cfg, mesh=ctx8)
    s8 = tr8.init_state()
    step8 = jax.jit(tr8._build_train_step())
    s8, m8 = step8(s8, ctx8.shard_batch({"x": jnp.asarray(x)}))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


@pytest.mark.slow
def test_sharded_median_filter_matches_single_device(ctx8, rng):
    from unsupervised_anomaly_detection_brain_mri_tpu.ops.postprocess import (
        median_filter_3d,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.parallel.distributed_eval import (
        sharded_median_filter_3d,
    )

    vol = rng.uniform(size=(32, 24, 24)).astype(np.float32)
    expected = np.asarray(median_filter_3d(jnp.asarray(vol)))
    got = np.asarray(sharded_median_filter_3d(ctx8, jnp.asarray(vol)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_collective_helpers(ctx8):
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from unsupervised_anomaly_detection_brain_mri_tpu.parallel import (
        collectives,
    )

    @partial(shard_map, mesh=ctx8.mesh, in_specs=P("data"),
             out_specs=P("data"))
    def f(x):
        m = collectives.psum_mean(jnp.sum(x))
        return x * 0 + m

    x = jnp.arange(8.0)
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.full(8, np.mean(
        np.arange(8.0))), rtol=1e-6)


@pytest.mark.slow
def test_tensor_parallel_step(ctx8):
    """dp=4 x tp=2: params sharded over 'model', one step runs finite."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    ctx = make_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg, mesh=ctx)
    state = tr.init_state()
    # at least one kernel is sharded over the model axis
    from unsupervised_anomaly_detection_brain_mri_tpu.parallel.sharding import (
        param_shardings,
    )

    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec,
                               param_shardings(ctx, state.params)),
        is_leaf=lambda x: hasattr(x, "index"))
    assert any("model" in str(s) for s in specs)

    x = np.random.default_rng(0).uniform(
        0, 1, (8, 32, 32, 1)).astype(np.float32)
    step = jax.jit(tr._build_train_step())
    state, m = step(state, ctx.shard_batch({"x": jnp.asarray(x)}))
    assert np.isfinite(float(m["loss"]))


def test_mesh_reconstruct_shards_and_unpads(ctx8):
    """reconstruct() under a mesh: uneven batch padded to the data axis,
    result unpadded back."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16,
                 compute_dtype="float32")
    tr = get_trainer("AE")(cfg, mesh=ctx8)
    state = tr.init_state()
    x = np.random.default_rng(0).uniform(
        0, 1, (11, 32, 32, 1)).astype(np.float32)  # 11 % 8 != 0
    res = tr.reconstruct(state, x)
    assert res["reconstruction"].shape == (11, 32, 32, 1)
    assert np.isfinite(res["l1err"])


@pytest.mark.slow
def test_data_parallel_gan_step(ctx8):
    """One AAE adversarial step (critic + gen + AE updates) on the 8-device
    mesh matches the single-device step — the GAN family's multi-chip path."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    cfg = Config(trainer="AAE", model="adversarial_autoencoder",
                 batchsize=16, outputWidth=32, outputHeight=32, zDim=16,
                 intermediateResolutions=(16, 16), compute_dtype="float32")
    x = np.random.default_rng(1).uniform(
        0, 1, (16, 32, 32, 1)).astype(np.float32)

    tr1 = get_trainer("AAE")(cfg)
    s1 = tr1.init_state()
    step1 = jax.jit(tr1._build_train_step())
    s1, m1 = step1(s1, {"x": jnp.asarray(x)})

    tr8 = get_trainer("AAE")(cfg, mesh=ctx8)
    s8 = tr8.init_state()
    step8 = jax.jit(tr8._build_train_step())
    s8, m8 = step8(s8, ctx8.shard_batch({"x": jnp.asarray(x)}))

    for k in m1:
        assert np.isfinite(float(m8[k])), k
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-4,
                                   err_msg=k)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-4)


@pytest.mark.slow
def test_data_parallel_gmvae_step(ctx8):
    """One GMVAE step (4-term mixture loss) on the 8-device mesh."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    cfg = Config(trainer="GMVAE", model="gaussian_mixture_variational_autoencoder",
                 batchsize=16, outputWidth=32, outputHeight=32,
                 dim_c=3, dim_z=16, dim_w=1, compute_dtype="float32")
    x = np.random.default_rng(2).uniform(
        0, 1, (16, 32, 32, 1)).astype(np.float32)

    tr1 = get_trainer("GMVAE")(cfg)
    s1 = tr1.init_state()
    step1 = jax.jit(tr1._build_train_step())
    s1, m1 = step1(s1, {"x": jnp.asarray(x)})

    tr8 = get_trainer("GMVAE")(cfg, mesh=ctx8)
    s8 = tr8.init_state()
    step8 = jax.jit(tr8._build_train_step())
    s8, m8 = step8(s8, ctx8.shard_batch({"x": jnp.asarray(x)}))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_mesh_evaluation_matches_single_device(ctx8, synth_dataset,
                                               synth_lesion_dataset,
                                               tmp_path):
    """The WHOLE eval driver under a data-parallel mesh == single device:
    sharded reconstruct_device -> device-resident postprocess -> curves ->
    CC -> segmented confusion stats must reproduce the unmeshed numbers
    exactly (the mesh path takes the XLA postprocess composition)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.config import Options
    from unsupervised_anomaly_detection_brain_mri_tpu.eval.evaluate import (
        evaluate,
    )
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    cfg = Config(trainer="AE", model="autoencoder", batchsize=8,
                 outputWidth=32, outputHeight=32, zDim=16, numEpochs=1,
                 compute_dtype="float32")
    tr1 = get_trainer("AE")(cfg)
    state = tr1.fit(synth_dataset)
    tr8 = get_trainer("AE")(cfg, mesh=ctx8)

    def run(tr, sub):
        opts = Options()
        opts.paths.sample_dir = str(tmp_path / sub)
        opts.exportPNGs = False
        opts.exportVolumes = False
        return evaluate(synth_lesion_dataset, tr, state, opts, cfg)

    r1 = run(tr1, "single")
    r8 = run(tr8, "mesh")
    for k in ("bestDiceScore", "bestThreshold", "diff_AUC", "diff_AUPRC",
              "DiceScore", "TP", "FP", "TN", "FN", "TPCC", "FPCC", "FNCC"):
        np.testing.assert_allclose(r1[k], r8[k], rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(r1["diffs"]),
                               np.asarray(r8["diffs"]), atol=1e-5)


def test_shard_like_params_requires_shape_match():
    """Optimizer-state leaves that share a param's path SUFFIX but not its
    shape (factored moments like adafactor's v_row) must be replicated,
    not given the param's 2-D sharding (which would fail device_put)."""
    from unsupervised_anomaly_detection_brain_mri_tpu.parallel.sharding import (
        shard_like_params,
    )

    ctx = make_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    params = {"dense": {"kernel": np.zeros((8, 16), np.float32)}}
    opt_tree = {
        "m": {"dense": {"kernel": np.zeros((8, 16), np.float32)}},
        "v_row": {"dense": {"kernel": np.zeros((8,), np.float32)}},
    }
    out = shard_like_params(ctx, params, opt_tree)
    full = out["m"]["dense"]["kernel"].sharding
    red = out["v_row"]["dense"]["kernel"].sharding
    assert "model" in str(full.spec)
    assert red.is_fully_replicated


def test_sharded_batched_restoration_matches_single_device(ctx8):
    """Multi-chip batched restoration (round 4): VAE_You's vmapped
    restoration loop with the stacked volume axis sharded over 'data'
    (3 volumes padded to 8) reproduces the unmeshed outputs exactly."""
    from unsupervised_anomaly_detection_brain_mri_tpu.train import get_trainer

    def build(mesh):
        cfg = Config(trainer="VAE_You", model="variational_autoencoder",
                     batchsize=8, outputWidth=32, outputHeight=32, zDim=16,
                     numEpochs=1, compute_dtype="float32", restore_steps=2,
                     tv_lambda=0.5, restore_lr=1e-3)
        return get_trainer("VAE_You")(cfg, mesh=mesh)

    tr_single = build(None)
    state = tr_single.init_state()
    tr_mesh = build(ctx8)
    rng = np.random.default_rng(0)
    vols = jnp.asarray(rng.uniform(0, 1, (3, 4, 32, 32, 1)
                                   ).astype(np.float32))
    keys = jax.random.split(jax.random.key(5), 3)
    ref = tr_single.reconstruct_volumes_device(
        state, vols, rngs=keys)["reconstruction"]
    # the mesh trainer shares the single-device parameters
    mesh_state = tr_mesh.init_state().replace(params=state.params)
    got = tr_mesh.reconstruct_volumes_device(
        mesh_state, vols, rngs=keys)["reconstruction"]
    assert got.shape[0] == 3  # padding cropped
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
