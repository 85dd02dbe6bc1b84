"""Trainer base + deterministic (single-optimizer) algorithm trainers.

Re-designs the reference trainer hierarchy (`trainers/DLMODEL.py` ->
`trainers/AEMODEL.py` -> per-algorithm classes) as functional JAX:

  * the epoch loop is a jitted `lax.scan` (see `engine.py`) instead of
    per-batch `sess.run` (`trainers/AE.py:63-90`);
  * checkpoints (params / batch_stats / optimizer states / epoch / rng) are
    saved per epoch via orbax with a JSON config sidecar, parity with
    `trainers/DLMODEL.py:63-110`;
  * early stopping: patience 5 on validation loss
    (`trainers/AEMODEL.py:70-79`);
  * ``reconstruct`` is a jitted forward (or restoration loop) used by the
    evaluation pipeline, parity with each reference trainer's
    ``reconstruct``.

Deterministic trainers implemented here: AE, VAE, VAE_You, CE, ceVAE,
GMVAE, GMVAE_spatial, ConstrainedAE.  Adversarial trainers live in gan.py.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unsupervised_anomaly_detection_brain_mri_tpu.config import Config, Options
from unsupervised_anomaly_detection_brain_mri_tpu.models import get_model
from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import MeshContext
from unsupervised_anomaly_detection_brain_mri_tpu.train import losses as L
from unsupervised_anomaly_detection_brain_mri_tpu.train.context import (
    random_context_masks,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train.engine import (
    EpochCompiler,
    early_stopping_update,
    epoch_indices,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train.restoration import (
    restore_inputs,
)
from unsupervised_anomaly_detection_brain_mri_tpu.train.state import (
    TrainState,
    count_params,
    make_optimizer,
)

Array = jnp.ndarray
Batch = Dict[str, Array]


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


class BaseTrainer:
    """Shared machinery: state init, jitted epoch loops, fit, checkpoints."""

    # subclasses may add rng streams beyond the model spec's
    needs_brainmask: bool = False
    early_stop_metric: str = "loss"

    def __init__(
        self,
        config: Config,
        options: Optional[Options] = None,
        mesh: Optional[MeshContext] = None,
        workdir: Optional[str] = None,
    ) -> None:
        self.config = config
        self.options = options or Options()
        self.mesh = mesh
        self.workdir = workdir
        self.dtype = _dtype_of(config.compute_dtype)
        self.model, self.spec = get_model(config, self.dtype)
        self._train_compiler = EpochCompiler(
            self._build_train_step, mesh,
            log_every_n=int(getattr(self.options, "logEveryNBatches", 0)),
            tb_every=int(getattr(self.options, "tbEveryNBatches", 0)),
            tb_hook=self._tb_batch_log,
            visual_fn=self._train_visual_fn)
        self._val_compiler = EpochCompiler(self._build_val_step, mesh)
        self._reconstruct_jit: Dict[Any, Callable] = {}
        self.history: List[Dict[str, float]] = []
        self.tv_lambda_value = float(config.tv_lambda)
        self.logger = None
        if self.options.tensorboard and workdir:
            from unsupervised_anomaly_detection_brain_mri_tpu.utils.logger import (
                Logger,
            )

            self.logger = Logger(os.path.join(workdir, "logs"))

    # ------------------------------------------------------------------
    # model application

    def _rng_streams(self, rng: Array) -> Dict[str, Array]:
        names = tuple(self.spec.rngs)
        keys = jax.random.split(rng, len(names))
        return dict(zip(names, keys))

    def model_inputs(self, batch: Batch, rng: Array, train: bool
                     ) -> Tuple[tuple, dict]:
        """Positional/keyword extras for the model call (overridden by
        trainers with extra inputs: ceVAE mask, AAE prior z)."""
        return (batch["x"],), {}

    def maybe_add_instance_noise(self, batch: Batch, rng: Array,
                                 train: bool) -> Batch:
        """Optional N(0, 0.01) instance noise on training batches
        (`dataloaders/BRAINWEB.py:466-468`), applied on device."""
        if not train or not self.options.addInstanceNoise:
            return batch
        noise = 0.01 * jax.random.normal(rng, batch["x"].shape)
        return {**batch, "x": batch["x"] + noise}

    def apply_model(self, params: Any, batch_stats: Any, rng: Array,
                    batch: Batch, train: bool, dropout: Optional[bool] = None,
                    return_inputs: bool = False):
        dropout = train if dropout is None else dropout
        in_rng, call_rng = jax.random.split(rng)
        # instance noise draws from its own folded key: sharing in_rng with
        # model_inputs (context masks, prior z) would correlate the noise
        # field with the mask/prior geometry every step
        noise_rng = jax.random.fold_in(in_rng, 1)
        batch = self.maybe_add_instance_noise(batch, noise_rng, train)
        args, kwargs = self.model_inputs(batch, in_rng, train)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats) else False
        out = self.model.apply(
            variables, *args, train=train, dropout=dropout,
            rngs=self._rng_streams(call_rng), mutable=mutable, **kwargs)
        if mutable:
            outputs, mutated = out
            new_bs = mutated.get("batch_stats", batch_stats)
        else:
            outputs, new_bs = out, batch_stats
        if return_inputs:
            return outputs, new_bs, args
        return outputs, new_bs

    # ------------------------------------------------------------------
    # hooks

    def optimizers(self) -> Dict[str, optax.GradientTransformation]:
        return {"main": make_optimizer(self.config)}

    def compute_losses(self, outputs: Dict[str, Array], batch: Batch
                       ) -> Dict[str, Array]:
        raise NotImplementedError

    def compute_losses_with_inputs(self, outputs: Dict[str, Array],
                                   batch: Batch, inputs: tuple
                                   ) -> Dict[str, Array]:
        """Loss hook that additionally sees the positional args fed to the
        model (so dual-input trainers like ceVAE can target the actual
        — possibly masked — network input).  Defaults to compute_losses."""
        return self.compute_losses(outputs, batch)

    def metric_keys(self) -> Tuple[str, ...]:
        """Which loss entries are logged (0-dim scalars only)."""
        return ()

    # ------------------------------------------------------------------
    # steps

    def _scalar_metrics(self, losses: Dict[str, Array]) -> Dict[str, Array]:
        return {k: v for k, v in losses.items() if jnp.ndim(v) == 0}

    def _build_train_step(self, **static: Any):
        opts = self.optimizers()
        opt = opts["main"]

        def step(state: TrainState, batch: Batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(params):
                outputs, new_bs, inputs = self.apply_model(
                    params, state.batch_stats, sub, batch, train=True,
                    return_inputs=True)
                losses = self.compute_losses_with_inputs(
                    outputs, batch, inputs)
                return losses["loss"], (losses, new_bs)

            (_, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = opt.update(
                grads, state.opt_states["main"], state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, batch_stats=new_bs,
                opt_states={**state.opt_states, "main": new_opt},
                rng=rng, step=state.step + 1)
            return new_state, self._scalar_metrics(losses)

        return step

    def _build_val_step(self, **static: Any):
        def step(state: TrainState, batch: Batch):
            rng, sub = jax.random.split(state.rng)
            outputs, _, inputs = self.apply_model(
                state.params, state.batch_stats, sub, batch, train=False,
                return_inputs=True)
            losses = self.compute_losses_with_inputs(outputs, batch, inputs)
            return state.replace(rng=rng), self._scalar_metrics(losses)

        return step

    #: the only phase strings ``epoch_static`` accepts.  Stringly-typed
    #: phases already caused one silently wrong measurement (a bench passed
    #: lowercase "train" and got the steady-state program instead of the
    #: warmup schedule — docs/STATUS.md, round-4 GAN note), so unknown
    #: phases now raise instead of returning the no-statics default.
    VALID_PHASES = ("TRAIN", "VAL")

    @classmethod
    def check_phase(cls, phase: str) -> str:
        if phase not in cls.VALID_PHASES:
            raise ValueError(
                f"unknown phase {phase!r}; expected one of "
                f"{cls.VALID_PHASES} (phase strings are case-sensitive)")
        return phase

    def epoch_static(self, epoch: int, phase: str) -> Dict[str, Any]:
        """Static (compile-time) per-epoch step arguments."""
        self.check_phase(phase)
        return {}

    # ------------------------------------------------------------------
    # state init

    def init_state(self, rng: Optional[Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.key(self.config.seed)
        init_rng, state_rng = jax.random.split(rng)
        c = self.config
        dummy = {
            "x": jnp.zeros((c.batchsize, c.outputHeight, c.outputWidth,
                            c.numChannels), jnp.float32),
        }
        if self.needs_brainmask:
            dummy["mask"] = jnp.ones(
                (c.batchsize, c.outputHeight, c.outputWidth), jnp.float32)
        opts = self.optimizers()

        # one jitted program for the whole init: un-jitted flax init runs
        # every layer initializer as a separate eager dispatch — dozens of
        # round trips through a remote-device transport (~80 s through the
        # axon tunnel vs one program here).  Numerics are unchanged: jit
        # neither alters PRNG streams nor reassociates the elementwise
        # initializer math.
        def _init_core(rng_in):
            args, kwargs = self.model_inputs(dummy, rng_in, train=True)
            variables = self.model.init(
                {"params": rng_in, **self._rng_streams(rng_in)},
                *args, train=True, dropout=True, **kwargs)
            params = variables["params"]
            return (params, variables.get("batch_stats", {}),
                    {name: o.init(params) for name, o in opts.items()})

        params, batch_stats, opt_states = jax.jit(_init_core)(init_rng)
        state = TrainState(
            params=params, batch_stats=batch_stats, opt_states=opt_states,
            rng=state_rng, epoch=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32))
        state = self._apply_mesh_layout(state)
        print(f"[{self.__class__.__name__}] {self.config.model}: "
              f"{count_params(params):,} parameters")
        return state

    def _apply_mesh_layout(self, state: TrainState) -> TrainState:
        """Commit a host/single-device state to the mesh's layout (param
        sharding under tensor parallelism, replication otherwise).  Applied
        by ``init_state`` AND ``load_checkpoint`` — a restored state must
        land in the same layout the train step was compiled for, not on the
        default device."""
        if self.mesh is None:
            return state
        from unsupervised_anomaly_detection_brain_mri_tpu.parallel.sharding import (
            shard_like_params,
            shard_params,
        )

        if self.mesh.n_model > 1:
            return state.replace(
                params=shard_params(self.mesh, state.params),
                batch_stats=self.mesh.replicate(state.batch_stats),
                opt_states=shard_like_params(
                    self.mesh, state.params, state.opt_states),
                rng=self.mesh.replicate(state.rng),
                epoch=self.mesh.replicate(state.epoch),
                step=self.mesh.replicate(state.step))
        return self.mesh.replicate(state)

    # ------------------------------------------------------------------
    # fit loop

    def _pool_from_dataset(self, dataset, split: str) -> Optional[Batch]:
        """Slice pool for a split.  Host-resident (numpy) when the streaming
        path will drive this split, device-resident otherwise."""
        arr = dataset.slices(split)
        if arr is None or len(arr) == 0:
            return None
        pool = {"x": np.asarray(arr)}
        if self.needs_brainmask:
            pool["mask"] = np.asarray(dataset.brainmasks(split))
        if self._stream_pool(pool):
            return pool  # keep on host; epochs stream chunks
        return {k: jnp.asarray(v) for k, v in pool.items()}

    def _stream_pool(self, host_pool: Dict[str, np.ndarray]) -> bool:
        o = self.options
        if getattr(o, "streamPool", False):
            return True
        nbytes = sum(v.nbytes for v in host_pool.values())
        return nbytes > float(
            getattr(o, "streamPoolThresholdMB", 4096.0)) * 2 ** 20

    def _run_epoch(self, compiler: EpochCompiler, state: TrainState,
                   pool: Batch, idxs: np.ndarray, static: Dict[str, Any]):
        """One epoch through ``compiler`` — resident pool (whole-pool scan)
        or, for host pools, the chunked streaming path: gather each chunk's
        slices on host in permutation order, upload, and run the SAME jitted
        scan over local indices.  The next chunk's host gather + upload
        overlaps the current chunk's (asynchronously dispatched) compute.
        State threads through the chained scans exactly as through one
        whole-pool scan (same rng splits, same update order), so streaming
        is bit-identical to the resident pool (parity tested)."""
        if isinstance(next(iter(pool.values())), jnp.ndarray):
            self.streamed_last_epoch = False
            return compiler(state, pool, jnp.asarray(idxs), **static)

        self.streamed_last_epoch = True
        chunk = max(1, int(getattr(self.options, "streamPoolChunkBatches",
                                   64)))
        rows_list = [idxs[i:i + chunk] for i in range(0, len(idxs), chunk)]

        def make_chunk(rows: np.ndarray):
            flat = rows.reshape(-1)
            cpool = {k: jnp.asarray(v[flat]) for k, v in pool.items()}
            local = jnp.asarray(np.arange(flat.size, dtype=np.int32)
                                .reshape(rows.shape))
            return cpool, local

        nxt = make_chunk(rows_list[0])
        weighted: List[Tuple[Dict[str, Array], int]] = []
        for ci, rows in enumerate(rows_list):
            cpool, local = nxt
            state, metrics = compiler(state, cpool, local, **static)
            if ci + 1 < len(rows_list):  # prefetch while the device works
                nxt = make_chunk(rows_list[ci + 1])
            weighted.append((metrics, len(rows)))
        total = sum(w for _, w in weighted)
        combined = {k: sum(m[k] * (w / total) for m, w in weighted)
                    for k in weighted[0][0]}
        return state, combined

    def fit(self, dataset, state: Optional[TrainState] = None,
            resume: bool = True) -> TrainState:
        """Epoch loop with VAL early stopping + per-epoch checkpoints.

        Parity with the reference train loops (`trainers/AE.py:23-61`).
        """
        c = self.config
        if c.debugNaN:
            jax.config.update("jax_debug_nans", True)
        state = state if state is not None else self.init_state()
        start_epoch = 0
        best_cost, last_improvement = float("inf"), 0
        if resume and self.workdir:
            restored = self.load_checkpoint(state)
            if restored is not None:
                state, start_epoch = restored
                # replay the VAL history so early-stopping counters survive
                # resume (parity: the reference restarts them, but the
                # deterministic-resume guarantee here extends to them)
                curves = os.path.join(self.workdir, "curves.json")
                if os.path.isfile(curves):
                    with open(curves) as f:
                        self.history = json.load(f)
                already_stopped = False
                for h in self.history:
                    if (h.get("phase") == "VAL"
                            and h.get("epoch", 1 << 30) < start_epoch):
                        (best_cost, last_improvement,
                         stop) = early_stopping_update(
                            h.get(self.early_stop_metric, float("inf")),
                            best_cost, last_improvement,
                            c.earlyStoppingPatience)
                        already_stopped = already_stopped or stop
                if already_stopped:
                    # the interrupted run had ALREADY early-stopped: resume
                    # must recognize the stop, not train extra epochs past it
                    print(f"[{self.config.trainer}] resume: early stopping "
                          f"already triggered at epoch {start_epoch - 1}; "
                          "nothing left to train")
                    # every exit path owes post_fit (the VAE_You/GMVAE
                    # lambda sweep) — a persisted sweep makes it a no-op
                    self.post_fit(dataset, state)
                    return state

        train_pool = self._pool_from_dataset(dataset, "TRAIN")
        val_pool = self._pool_from_dataset(dataset, "VAL")
        if train_pool is None:
            raise ValueError(
                "training split is empty — check the dataset partition and "
                "slice range (sliceStart/sliceEnd vs volume depth)")
        n_train = int(train_pool["x"].shape[0])
        if isinstance(train_pool["x"], np.ndarray):
            mb = sum(v.nbytes for v in train_pool.values()) / 2 ** 20
            print(f"[stream-pool] training pool ({mb:.0f} MB) streams in "
                  f"chunks of "
                  f"{getattr(self.options, 'streamPoolChunkBatches', 64)} "
                  "batches (host prefetch overlaps device compute)")

        for epoch in range(start_epoch, self.num_epochs()):
            t0 = time.time()
            # per-epoch seeded shuffle: the data order is a pure function of
            # (seed, epoch), so training is deterministic across
            # checkpoint-resume (SURVEY.md section 5, failure recovery)
            host_rng = np.random.default_rng((c.seed + 1, epoch))
            idxs = epoch_indices(host_rng, n_train, c.batchsize)
            if idxs.size == 0:
                raise ValueError(
                    f"batchsize {c.batchsize} exceeds the training pool of "
                    f"{n_train} slices — no full batch can be formed")
            profile_ctx = None
            if getattr(self.options, "profileDir", None) and epoch == start_epoch:
                profile_ctx = jax.profiler.trace(self.options.profileDir)
                profile_ctx.__enter__()
            state, metrics = self._run_epoch(
                self._train_compiler, state, train_pool, idxs,
                self.epoch_static(epoch, "TRAIN"))
            if profile_ctx is not None:
                jax.tree_util.tree_map(
                    lambda a: a.block_until_ready(), state.params)
                profile_ctx.__exit__(None, None, None)
            state = state.replace(epoch=state.epoch + 1)
            metrics = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            sps = idxs.size / max(dt, 1e-9)
            tag = self.phase_tag(epoch)
            label = "TRAIN" if tag == "TRAIN" else tag
            print(f"Epoch (train{'' if tag == 'TRAIN' else ' ' + tag}): "
                  f"[{epoch:3d}] "
                  + " ".join(f"{k}: {v:.6f}" for k, v in sorted(metrics.items()))
                  + f" ({sps:,.0f} slices/s)")
            self.history.append({"epoch": epoch, "phase": label, **metrics})
            self.log_epoch(epoch, "TRAIN", metrics, state, train_pool)

            stop = False
            if val_pool is not None and self.validation_enabled(epoch):
                vidx = epoch_indices(host_rng, int(val_pool["x"].shape[0]),
                                     c.batchsize, shuffle=False)
                if vidx.size:
                    state, vmetrics = self._run_epoch(
                        self._val_compiler, state, val_pool, vidx,
                        self.epoch_static(epoch, "VAL"))
                    vmetrics = {k: float(v) for k, v in vmetrics.items()}
                    print(f"Epoch (val):   [{epoch:3d}] "
                          + " ".join(f"{k}: {v:.6f}"
                                     for k, v in sorted(vmetrics.items())))
                    self.history.append(
                        {"epoch": epoch, "phase": "VAL", **vmetrics})
                    self.log_epoch(epoch, "VAL", vmetrics, state, val_pool)
                    if self.early_stopping_enabled():
                        best_cost, last_improvement, stop = early_stopping_update(
                            vmetrics.get(self.early_stop_metric,
                                         float("inf")), best_cost,
                            last_improvement, c.earlyStoppingPatience)

            # checkpoint AFTER the VAL pass (the reference saved before it,
            # `trainers/AE.py:46-52`): the saved rng is then exactly the
            # stream the next epoch starts from, so killed-and-resumed runs
            # reproduce uninterrupted ones bitwise
            if self.workdir and (epoch + 1) % c.snapshotEveryEpochs == 0:
                self.save_checkpoint(state, epoch + 1)
            if stop:
                print("Early stopping was triggered due to no "
                      f"improvement over the last "
                      f"{c.earlyStoppingPatience} epochs")
                break

        if getattr(self.options, "tbEveryNBatches", 0) or getattr(
                self.options, "logEveryNBatches", 0):
            # the per-batch log/TB paths run as ASYNC debug callbacks;
            # drain them before returning so event files are complete
            jax.effects_barrier()
        self.post_fit(dataset, state)
        return state

    def _train_visual_fn(self, state: TrainState, batch: Batch) -> Array:
        """Jittable eval-mode reconstruction of a few batch slices for the
        mid-epoch TB image grid (runs under the engine's lax.cond, so only
        logging batches pay for it)."""
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = self._reconstruct_outputs(
            variables, batch["x"][:8], dropout=False, rng=jax.random.key(0))
        return out["reconstruction"]

    def _tb_batch_log(self, step, metrics, x, rec) -> None:
        """Host side of the mid-epoch TB path (async debug callback):
        scalars under batch/<metric> at the GLOBAL step (the per-epoch
        writers use epoch numbers — separate tags keep the axes distinct)
        plus the input|rec|L1 grid, parity with `trainers/AEMODEL.py:37-42`.
        """
        if self.logger is None:  # pragma: no cover - tbEveryN without TB
            return
        step = int(step)
        self.logger.log_scalars(
            step, {f"batch/{k}": float(v) for k, v in metrics.items()
                   if np.ndim(v) == 0}, "TRAIN")
        self.logger.log_visuals(step, np.asarray(x), np.asarray(rec),
                                "TRAIN")
        self.logger.flush()

    def log_epoch(self, epoch: int, phase: str, metrics: Dict[str, float],
                  state: TrainState, pool: Optional[Batch]) -> None:
        """TensorBoard epoch logging (scalars + image grid), parity with
        `trainers/AEMODEL.py:37-42`."""
        if self.logger is None:
            return
        self.logger.log_scalars(epoch, metrics, phase)
        if pool is not None and len(pool["x"]):
            n = min(8, int(pool["x"].shape[0]))
            x = np.asarray(pool["x"][:n])
            # plain eval-mode forward for the thumbnail grid — going
            # through reconstruct() would run restoration trainers' full
            # 150-step restore loop twice per epoch of pure logging work;
            # the reference grid is the model reconstruction too
            # (`trainers/AEMODEL.py:37-42`)
            rec = np.asarray(
                self._train_visual_fn(state, {"x": jnp.asarray(x)}))
            self.logger.log_visuals(epoch, x, rec, phase)
        self.logger.flush()

    def num_epochs(self) -> int:
        return self.config.numEpochs

    def early_stopping_enabled(self) -> bool:
        return True

    def validation_enabled(self, epoch: int) -> bool:
        """Whether to run the VAL pass this epoch (fAnoGAN disables it
        during its WGAN phase, parity: `trainers/fAnoGAN.py:87-140`)."""
        return True

    def phase_tag(self, epoch: int) -> str:
        """History/print label for the training phase of this epoch."""
        return "TRAIN"

    def post_fit(self, dataset, state: TrainState) -> None:
        """Hook after training (e.g. VAE_You lambda sweep)."""

    def determine_best_lambda(self, dataset, state: TrainState) -> float:
        """tv_lambda sweep on 20% of VAL for restoration trainers
        (`trainers/VAE_You.py:149-173`, `trainers/GMVAE.py:199-223`):
        pick the lambda in {0.0 .. 1.9} minimising sum|x - restored|.
        The swept value persists to ``<workdir>/tv_lambda.json`` so a
        fresh process (separate eval run, serving) restores with it
        instead of the -1.0 sweep sentinel.  Requires the subclass's
        ``_restoration_fn``."""
        c = self.config
        arr = dataset.slices("VAL")
        bs = min(c.batchsize, len(arr))
        if bs == 0:
            print("determine_best_lambda: empty VAL split, keeping lambda")
            return self.tv_lambda_value
        n_batches = max(1, int((len(arr) // bs) * 0.2))
        batches = arr[: n_batches * bs].reshape(
            n_batches, bs, *arr.shape[1:])
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs_fn = self._restoration_fn(variables)

        @jax.jit
        def sweep(bs):
            lambdas = jnp.arange(20, dtype=jnp.float32) / 10.0

            def err_for_lambda(lam):
                def err_one(b):
                    restored = restore_inputs(outputs_fn, b, lam,
                                              c.restore_lr, c.restore_steps)
                    return jnp.sum(jnp.abs(b - restored))

                return jnp.mean(jax.lax.map(err_one, bs))

            errors = jax.lax.map(err_for_lambda, lambdas)
            return lambdas[jnp.argmin(errors)], errors

        best, _ = sweep(jnp.asarray(batches))
        self.tv_lambda_value = float(best)
        print(f"Best lambda: {self.tv_lambda_value}")
        if self.workdir:
            with open(os.path.join(self.workdir, "tv_lambda.json"),
                      "w") as f:
                json.dump({"tv_lambda_value": self.tv_lambda_value}, f)
        return self.tv_lambda_value

    # ------------------------------------------------------------------
    # checkpointing (orbax)

    def _ckpt_manager(self):
        # one manager per trainer: constructing a CheckpointManager scans
        # the checkpoint directory, so a fresh one per save/load call paid
        # a re-enumeration every epoch
        import orbax.checkpoint as ocp
        if getattr(self, "_ckpt_mngr", None) is None:
            path = os.path.abspath(os.path.join(self.workdir, "ckpt"))
            os.makedirs(path, exist_ok=True)
            self._ckpt_mngr = ocp.CheckpointManager(
                path, options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.config.keepCheckpoints))
        return self._ckpt_mngr

    def save_checkpoint(self, state: TrainState, epoch: int) -> None:
        import orbax.checkpoint as ocp
        mngr = self._ckpt_manager()
        payload = jax.tree_util.tree_map(np.asarray, {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_states": state.opt_states,
            # full determinism across resume: the on-device rng stream
            # (dropout/sampling noise) and the global step are part of the
            # checkpoint, not just params (ADVICE r1)
            "rng": jax.random.key_data(state.rng),
            "step": state.step,
        })
        mngr.save(epoch, args=ocp.args.StandardSave(payload))
        mngr.wait_until_finished()
        with open(os.path.join(self.workdir, "config.json"), "w") as f:
            f.write(self.config.to_json())
        with open(os.path.join(self.workdir, "curves.json"), "w") as f:
            json.dump(self.history, f)
        # Curves.npy twin (`trainers/DLMODEL.py:84`): the reference saves
        # a {name: values} dict via np.save and reloads it with
        # np.load(...).item() — note its dict is never actually populated
        # (always {}); ours carries the real per-epoch history as
        # "<PHASE>/<metric>" -> list, same load recipe.
        curves: Dict[str, list] = {}
        for h in self.history:
            phase = h.get("phase", "TRAIN")
            for k, v in h.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    curves.setdefault(f"{phase}/{k}", []).append(v)
        np.save(os.path.join(self.workdir, "Curves.npy"),
                np.asarray(curves, dtype=object))

    def load_checkpoint(self, template: TrainState
                       ) -> Optional[Tuple[TrainState, int]]:
        import orbax.checkpoint as ocp
        if not self.workdir or not os.path.isdir(
                os.path.join(self.workdir, "ckpt")):
            return None
        mngr = self._ckpt_manager()
        step = mngr.latest_step()
        if step is None:
            return None
        target = jax.tree_util.tree_map(np.asarray, {
            "params": template.params,
            "batch_stats": template.batch_stats,
            "opt_states": template.opt_states,
            "rng": jax.random.key_data(template.rng),
            "step": template.step,
        })
        try:
            restored = mngr.restore(step, args=ocp.args.StandardRestore(target))
        except Exception:
            # legacy (round-1) 3-tuple checkpoints without rng/step
            legacy = jax.tree_util.tree_map(
                np.asarray, (template.params, template.batch_stats,
                             template.opt_states))
            params, batch_stats, opt_states = mngr.restore(
                step, args=ocp.args.StandardRestore(legacy))
            restored = {"params": params, "batch_stats": batch_stats,
                        "opt_states": opt_states,
                        "rng": np.asarray(jax.random.key_data(template.rng)),
                        "step": np.asarray(step, np.int32)}
        state = template.replace(
            params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, restored["batch_stats"]),
            opt_states=jax.tree_util.tree_map(
                jnp.asarray, restored["opt_states"]),
            rng=jax.random.wrap_key_data(jnp.asarray(restored["rng"])),
            step=jnp.asarray(restored["step"], jnp.int32),
            epoch=jnp.asarray(step, jnp.int32))
        state = self._apply_mesh_layout(state)
        print(f"Restored checkpoint at epoch {step}")
        lam_path = os.path.join(self.workdir, "tv_lambda.json")
        if os.path.isfile(lam_path):
            # the post-fit lambda sweep result must survive into fresh
            # processes (eval/serving), or they'd restore with the -1.0
            # sweep sentinel instead of the swept value
            with open(lam_path) as f:
                self.tv_lambda_value = float(
                    json.load(f)["tv_lambda_value"])
            print(f"Restored swept tv_lambda={self.tv_lambda_value}")
        return state, int(step)

    # ------------------------------------------------------------------
    # reconstruction (evaluation API)

    def _reconstruct_outputs(self, variables, x: Array, dropout: bool,
                             rng: Array) -> Dict[str, Array]:
        batch = {"x": x}
        if self.needs_brainmask:
            batch["mask"] = (x[..., 0] > 0.05).astype(jnp.float32)
        args, kwargs = self.model_inputs(batch, rng, train=False)
        outputs = self.model.apply(
            variables, *args, train=False, dropout=dropout,
            rngs=self._rng_streams(rng), **kwargs)
        rec = outputs[self.spec.reconstruction_key]
        return {"reconstruction": rec, **outputs}

    def reconstruct_device(self, state: TrainState, x: Array,
                           dropout: bool = False,
                           rng: Optional[Array] = None) -> Dict[str, Array]:
        """Reconstruct a batch of slices, all outputs DEVICE-resident (the
        eval driver composes this with on-device post-processing — no
        per-volume host round trip).  Under a mesh, the slice batch is
        sharded over the 'data' axis (multi-chip evaluation)."""
        if x.ndim < 4:
            x = x[None]
        rng = rng if rng is not None else jax.random.key(0)
        key = bool(dropout)
        if key not in self._reconstruct_jit:
            def fn(variables, xin, r):
                return self._reconstruct_outputs(variables, xin, key, r)
            self._reconstruct_jit[key] = jax.jit(fn)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        n_orig = x.shape[0]
        xin = jnp.asarray(x)
        if self.mesh is not None and self.mesh.n_data > 1:
            from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
                pad_batch_to,
            )

            xin = jnp.asarray(pad_batch_to(np.asarray(x), self.mesh.n_data))
            xin = jax.device_put(xin, self.mesh.batch_sharding())
        out = self._reconstruct_jit[key](variables, xin, rng)
        if out["reconstruction"].shape[0] != n_orig:
            out = {k: v[:n_orig] if hasattr(v, "shape") and v.shape
                   and v.shape[0] == xin.shape[0] else v
                   for k, v in out.items()}
        return out

    def batched_volume_restoration(self) -> bool:
        """True when `reconstruct_volumes_device` vmaps an iterative
        restoration loop over stacked whole volumes (VAE_You/GMVAE) — the
        eval driver then restores several patients per device dispatch."""
        return False

    def _shard_volume_stack(self, vols, rngs):
        """Shard a stacked (K, S, H, W, C) volume batch (and its per-volume
        rng keys) over the mesh 'data' axis, padding K to a multiple of the
        axis size — multi-chip batched restoration.  No-op off-mesh."""
        if self.mesh is None or self.mesh.n_data <= 1:
            return vols, rngs
        from unsupervised_anomaly_detection_brain_mri_tpu.parallel.mesh import (
            pad_batch_to,
        )

        vols = jnp.asarray(pad_batch_to(np.asarray(vols), self.mesh.n_data))
        # pad keys to match (padded volumes' outputs are cropped; their
        # rng content is irrelevant)
        keys = jax.random.wrap_key_data(jnp.asarray(pad_batch_to(
            np.asarray(jax.random.key_data(rngs)), self.mesh.n_data)))
        sh = self.mesh.batch_sharding()
        return jax.device_put(vols, sh), jax.device_put(keys, sh)

    def reconstruct(self, state: TrainState, x: Array, dropout: bool = False,
                    rng: Optional[Array] = None) -> Dict[str, np.ndarray]:
        """Reconstruct a batch of slices; returns numpy dict with
        ``reconstruction``, ``l1err``, ``l2err`` (parity:
        `trainers/AE.py:92-110`)."""
        if x.ndim < 4:
            x = x[None]
        out = self.reconstruct_device(state, x, dropout, rng)
        rec = np.asarray(out["reconstruction"], np.float32)
        res = {k: np.asarray(v) for k, v in out.items()}
        res["l1err"] = float(np.sum(np.abs(x - rec)))
        res["l2err"] = float(np.sum(np.sqrt((x - rec) ** 2)))
        return res


# ---------------------------------------------------------------------------
# deterministic trainers


class AE(BaseTrainer):
    """L1 autoencoder (`trainers/AE.py:28-33`)."""

    def compute_losses(self, outputs, batch):
        rec = L.l1_recon_sum(batch["x"], outputs["x_hat"])
        return {"loss": rec, "reconstructionLoss": rec}


class VAE(BaseTrainer):
    """VAE (`trainers/VAE.py:36-42`)."""

    def compute_losses(self, outputs, batch):
        out = L.vae_loss(batch["x"], outputs)
        return {k: v for k, v in out.items() if k != "pixel_loss"}


class VAE_You(VAE):
    """VAE with iterative input restoration (`trainers/VAE_You.py`)."""

    def post_fit(self, dataset, state: TrainState) -> None:
        if self.tv_lambda_value < 0:
            self.determine_best_lambda(dataset, state)

    def _restoration_fn(self, variables, dropout: bool = False):
        """(x, rng) -> (pixel_loss, x_hat) from ONE forward, for the
        restoration loop.  ``dropout=True`` applies dropout during
        restoration forwards — the reference does this "only during MC
        sampling" (`trainers/VAE_You.py:134`).  The single shared forward
        mirrors the reference graph, where `self.reconstruction` feeds both
        the pixel loss and the TV term (`trainers/VAE_You.py:36-54`)."""

        def outputs_fn(x_in: Array, r: Array):
            outputs = self.model.apply(
                variables, x_in, train=False, dropout=dropout,
                rngs=self._rng_streams(r))
            rec = L.sum_per_sample(L.l1_elem(x_in, outputs["x_hat"]))
            kl = L.vae_kl(outputs["z_mu"], outputs["z_sigma"])
            return rec + kl, outputs["x_hat"]

        return outputs_fn

    def reconstruct_device(self, state: TrainState, x, dropout: bool = False,
                           rng=None) -> Dict[str, Array]:
        if x.ndim < 4:
            x = x[None]
        c = self.config
        key = ("restore", bool(dropout))
        if key not in self._reconstruct_jit:
            def fn(variables, xin, lam, r):
                outputs_fn = self._restoration_fn(variables, bool(dropout))
                return restore_inputs(outputs_fn, xin, lam,
                                      c.restore_lr, c.restore_steps, rng=r)
            self._reconstruct_jit[key] = jax.jit(fn)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        rng = rng if rng is not None else jax.random.key(0)
        restored = self._reconstruct_jit[key](
            variables, jnp.asarray(x),
            jnp.float32(max(self.tv_lambda_value, 0.0)), rng)
        return {"reconstruction": restored}

    def batched_volume_restoration(self) -> bool:
        return self.config.restore_steps > 0

    def reconstruct_volumes_device(self, state: TrainState, vols,
                                   dropout: bool = False,
                                   rngs=None) -> Dict[str, Array]:
        """Restore K whole volumes in ONE device dispatch: the restoration
        loop (`trainers/VAE_You.py:125-147`) is vmapped over a stacked
        (K, S, H, W, 1) volume axis.  Each volume keeps exactly its
        sequential semantics — its own rng stream and its own restoration
        batch axis — so outputs match per-volume `reconstruct_device` calls
        while the chip sees K x S slices of work per restoration step.
        The restoration objective is per-sample, so zero-padded slices
        never influence real ones.  Under a device mesh the stacked volume
        axis is sharded over 'data' (padded to a multiple of the axis
        size) — multi-chip evaluation restores K volumes across chips."""
        c = self.config
        key = ("restore_vols", bool(dropout))
        if key not in self._reconstruct_jit:
            def one(variables, v, lam, r):
                outputs_fn = self._restoration_fn(variables, bool(dropout))
                return restore_inputs(outputs_fn, v, lam,
                                      c.restore_lr, c.restore_steps, rng=r)
            self._reconstruct_jit[key] = jax.jit(
                jax.vmap(one, in_axes=(None, 0, None, 0)))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        vols = jnp.asarray(vols)
        n_orig = vols.shape[0]
        if rngs is None:
            rngs = jax.random.split(jax.random.key(0), n_orig)
        vols, rngs = self._shard_volume_stack(vols, rngs)
        restored = self._reconstruct_jit[key](
            variables, vols,
            jnp.float32(max(self.tv_lambda_value, 0.0)), rngs)
        return {"reconstruction": restored[:n_orig]}

class CE(BaseTrainer):
    """Context-encoder AE (`trainers/CE.py`): train on masked inputs, loss
    against the clean image."""

    needs_brainmask = True

    def model_inputs(self, batch, rng, train):
        if train and "mask" in batch:
            masked = random_context_masks(rng, batch["x"], batch["mask"])
            return (masked,), {}
        return (batch["x"],), {}

    def compute_losses(self, outputs, batch):
        rec = L.l1_recon_sum(batch["x"], outputs["x_hat"])
        return {"loss": rec, "reconstructionLoss": rec}


class CeVAE(BaseTrainer):
    """ceVAE (`trainers/ceVAE.py`): dual-branch combi loss; gradient-based
    restoration at eval when ``use_gradient_based_restoration`` > 0."""

    needs_brainmask = True

    def model_inputs(self, batch, rng, train):
        x = batch["x"]
        if train and "mask" in batch:
            x_ce = random_context_masks(rng, x, batch["mask"])
        else:
            x_ce = x
        return (x, x_ce), {}

    def compute_losses_with_inputs(self, outputs, batch, inputs):
        # Parity (`trainers/ceVAE.py:40`): L1_ce compares x_hat_ce against
        # the x_ce placeholder — the MASKED input during TRAIN, the clean
        # image during VAL/eval.  ``inputs`` is the (x, x_ce) tuple that the
        # model was actually called with.
        return L.cevae_loss(batch["x"], inputs[1], outputs)

    def compute_losses(self, outputs, batch):
        return L.cevae_loss(batch["x"], batch["x"], outputs)

    def reconstruct_device(self, state: TrainState, x, dropout: bool = False,
                           rng=None) -> Dict[str, Array]:
        if x.ndim < 4:
            x = x[None]
        lam = float(self.config.use_gradient_based_restoration)
        key = ("cevae", lam > 0, bool(dropout))
        if key not in self._reconstruct_jit:
            def fn(variables, xin, r):
                outputs = self.model.apply(
                    variables, xin, xin, train=False, dropout=dropout,
                    rngs=self._rng_streams(r))
                rec = outputs["x_hat"]
                if lam > 0:
                    # same rng as the reconstruction forward: the reference
                    # evaluates anomaly grads and reconstruction in ONE
                    # sess.run, sharing a single dropout mask
                    # (`trainers/ceVAE.py:128-139`)
                    def loss_vae(x_in):
                        o = self.model.apply(
                            variables, x_in, x_in, train=False,
                            dropout=dropout, rngs=self._rng_streams(r))
                        recs = L.sum_per_sample(L.l1_elem(x_in, o["x_hat"]))
                        kl = L.vae_kl(o["z_mu"], o["z_sigma"])
                        return recs + kl

                    g = jax.grad(lambda xi: jnp.sum(loss_vae(xi)))(xin)
                    anomaly = L.l1_elem(xin, rec) * jnp.abs(g)
                    rec = xin - lam * anomaly
                return rec
            self._reconstruct_jit[key] = jax.jit(fn)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        rng = rng if rng is not None else jax.random.key(0)
        rec = self._reconstruct_jit[key](variables, jnp.asarray(x), rng)
        return {"reconstruction": rec}


class GMVAE(BaseTrainer):
    """Dense GMVAE (`trainers/GMVAE.py`), with iterative restoration."""

    spatial = False

    def compute_losses(self, outputs, batch):
        return L.gmvae_loss(batch["x"], outputs, self.config.dim_c,
                            self.config.c_lambda, self.spatial)

    def post_fit(self, dataset, state: TrainState) -> None:
        if self.tv_lambda_value < 0 and self.config.restore_steps > 0:
            self.determine_best_lambda(dataset, state)

    def _restoration_fn(self, variables, dropout: bool = False):
        """(x, rng) -> (loss, xz_mu) from ONE forward, for the restoration
        loop; ``dropout=True`` enables MC-sampling dropout
        (`trainers/GMVAE.py:186` — "apply only during MC sampling").

        Gradient-scale parity (`trainers/GMVAE.py:94-95`): the reference
        computes ``tf.gradients(loss + restore, x)`` where ``loss`` is the
        SCALAR batch mean and ``restore`` is the per-sample (B,) TV vector
        — TF broadcasts the scalar over the vector and `tf.gradients` sums
        its ys, so the differentiated objective is ``B*mean_loss +
        sum(restore)`` and the per-sample pixel gradient is ``d l_j/dx_j``
        with NO 1/B factor.  Broadcasting the raw mean here reproduces that
        exactly (sum over B of the broadcast mean == the loss SUM); it also
        makes the gradient on each real slice independent of zero-padded
        batch mates (the GMVAE loss is a per-sample-decomposable mean), so
        cross-volume batching needs no rescaling.  (Round-4 audit note: an
        earlier revision divided by B — under-weighting the pixel term vs
        the TV term by the restoration batch size; fixed + pinned by
        `tests/test_round4_fixes.py::test_gmvae_restoration_batch_size_
        invariant`.)"""

        def outputs_fn(x_in: Array, r: Array):
            outputs = self.model.apply(
                variables, x_in, train=False, dropout=dropout,
                rngs=self._rng_streams(r))
            losses = L.gmvae_loss(x_in, outputs, self.config.dim_c,
                                  self.config.c_lambda, self.spatial)
            pixel = jnp.broadcast_to(losses["loss"], (x_in.shape[0],))
            return pixel, outputs["xz_mu"]

        return outputs_fn

    def reconstruct_device(self, state: TrainState, x, dropout: bool = False,
                           rng=None) -> Dict[str, Array]:
        if x.ndim < 4:
            x = x[None]
        c = self.config
        if c.restore_steps <= 0:
            return super().reconstruct_device(state, x, dropout, rng)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        key = ("restore", bool(dropout))
        if key not in self._reconstruct_jit:
            def fn(vs, xin, lam, r):
                outputs_fn = self._restoration_fn(vs, bool(dropout))
                return restore_inputs(outputs_fn, xin, lam,
                                      c.restore_lr, c.restore_steps, rng=r)
            self._reconstruct_jit[key] = jax.jit(fn)
        rng = rng if rng is not None else jax.random.key(0)
        rec = self._reconstruct_jit[key](
            variables, jnp.asarray(x),
            jnp.float32(max(self.tv_lambda_value, 0.0)), rng)
        return {"reconstruction": rec}

    def batched_volume_restoration(self) -> bool:
        return self.config.restore_steps > 0

    def reconstruct_volumes_device(self, state: TrainState, vols,
                                   dropout: bool = False,
                                   rngs=None) -> Dict[str, Array]:
        """K-volume restoration in ONE dispatch (see
        `VAE_You.reconstruct_volumes_device`).  The GMVAE restoration
        objective differentiates the loss SUM (see `_restoration_fn`), so
        zero-padded slices leave real-slice gradients bit-identical to the
        unpadded per-volume call with no rescaling."""
        c = self.config
        key = ("restore_vols", bool(dropout))
        if key not in self._reconstruct_jit:
            def one(vs, v, lam, r):
                outputs_fn = self._restoration_fn(vs, bool(dropout))
                return restore_inputs(outputs_fn, v, lam,
                                      c.restore_lr, c.restore_steps, rng=r)
            self._reconstruct_jit[key] = jax.jit(
                jax.vmap(one, in_axes=(None, 0, None, 0)))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        vols = jnp.asarray(vols)
        n_orig = vols.shape[0]
        if rngs is None:
            rngs = jax.random.split(jax.random.key(0), n_orig)
        vols, rngs = self._shard_volume_stack(vols, rngs)
        rec = self._reconstruct_jit[key](
            variables, vols,
            jnp.float32(max(self.tv_lambda_value, 0.0)), rngs)
        return {"reconstruction": rec[:n_orig]}


class GMVAE_spatial(GMVAE):
    """Spatial GMVAE (`trainers/GMVAE_spatial.py`)."""

    spatial = True


class ConstrainedAE(BaseTrainer):
    """Constrained AE (`trainers/ConstrainedAE.py:37-43`)."""

    def compute_losses(self, outputs, batch):
        return L.constrained_loss(batch["x"], outputs, self.config.rho, "z")
