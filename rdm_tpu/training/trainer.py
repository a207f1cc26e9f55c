"""Training driver — the TPU-native equivalent of the reference's
PyTorch-Lightning main.py loop (/root/reference/main.py:681-1048):

- LR scaling rule `lr = accumulate x n_data_devices x batch x base_lr`
  (main.py:992-1000).
- scalar logging to <logdir>/metrics.jsonl + stdout (TestTube/TB stand-in).
- periodic image logging: EMA-weighted samples conditioned on the current
  batch's neighbors, saved as PNG grids under <logdir>/images/<split>/
  (ImageLogger, main.py:541-656).
- Orbax checkpointing: `last` every ckpt_every steps + monitored-metric
  bookkeeping; SIGUSR1 and exception-triggered saves (main.py:1003-1029).
- resume from the latest checkpoint in the run dir.

The device step itself lives in rdm_tpu.training.train_state (pjit over the
(data, db) mesh); this file only orchestrates host-side IO around it.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
from rdm_tpu.models.rdm import RDM, RDMConfig
from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.training.checkpoint import (
    CheckpointManager,
    install_signal_checkpoint,
)
from rdm_tpu.training.optim import make_optimizer
from rdm_tpu.training.train_state import (
    TrainState,
    init_train_state,
    make_rarm_train_step,
    make_train_step,
)


def _place_state(state: "TrainState", mesh, param_sharding: str):
    """Device placement for a fresh/restored train state: FSDP-shard the
    leaves over the data axis when configured, else leave as-is (jit's
    replicated in_shardings handles placement). With `_init_state`'s
    sharded init this is a no-op re-put for already-sharded leaves."""
    if param_sharding == "fsdp" and mesh is not None:
        from rdm_tpu.parallel.mesh import shard_train_state
        return shard_train_state(state, mesh)
    return state


def _init_state(make, rng, mesh, param_sharding: str) -> "TrainState":
    """Build the initial train state. In FSDP mode the WHOLE init
    (model.init + optimizer + EMA copy) is jitted with FSDP
    out_shardings so no full replica of params+moments+EMA ever
    materializes on one chip — the very models the mode exists for
    (state > 1 chip's HBM) would OOM in a replicated init. The sharded
    state then also serves as the orbax restore target, which restores
    shard-wise."""
    if param_sharding == "fsdp" and mesh is not None:
        from rdm_tpu.parallel.mesh import fsdp_shardings
        shapes = jax.eval_shape(make, rng)
        shardings = fsdp_shardings(shapes, mesh)
        return jax.jit(make, out_shardings=shardings)(rng)
    return jax.jit(make)(rng)


@dataclasses.dataclass
class TrainerConfig:
    logdir: str = "logs/run"
    base_lr: float = 1e-4
    scale_lr: bool = True
    max_steps: int = 100_000
    log_every: int = 50
    ckpt_every: int = 1000
    image_log_every: int = 5000
    image_log_steps: int = 20  # DDIM steps for logged samples
    accumulate_grad_batches: int = 1
    ema_decay: float = 0.9999
    warm_up_steps: int = 100
    grad_clip: Optional[float] = None
    seed: int = 0
    monitor: str = "val/loss_simple_ema"  # reference monitor key
    max_ckpts: int = 3
    use_tensorboard: bool = False  # tf.summary scalars under <logdir>/tb
    val_every: int = 0  # 0 => validate only at checkpoint saves
    val_batches: int = 8
    # gradient rematerialization (reference use_checkpoint: true).
    # Measured on v5e at the flagship batch-16 op point: no-remat 86.3
    # samples/s vs dots_saveable 82 (nothing_saveable 71.9,
    # dots_no_batch 64.9) — activations fit in HBM there, so remat only
    # costs recompute. Default False; set True for larger batches/models
    # (batch 32 OOMs even with remat).
    remat: bool = False
    remat_policy: str = "dots"
    # Adam first-moment storage dtype (None = f32). "bfloat16" frees
    # ~0.8 GB HBM on the 395M flagship for larger batches.
    adam_mu_dtype: Optional[str] = None
    # "replicated" (reference-DDP equivalent) or "fsdp": shard params,
    # Adam moments and EMA over the data axis (parallel.mesh.fsdp_spec)
    # for models whose train state outgrows one chip's HBM.
    param_sharding: str = "replicated"


class RDMTrainer:
    def __init__(self, config: RDMConfig, trainer: TrainerConfig,
                 first_stage_config: AutoencoderConfig,
                 first_stage_params: Any, mesh=None,
                 batch_size: Optional[int] = None):
        self.cfg = config
        self.tcfg = trainer
        self.mesh = mesh
        n_data = 1
        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
        lr = trainer.base_lr
        if trainer.scale_lr and batch_size is not None:
            lr = (trainer.accumulate_grad_batches * n_data * batch_size
                  * trainer.base_lr)
            print(f"lr scaled to {lr:.3e} = accum({trainer.accumulate_grad_batches})"
                  f" * devices({n_data}) * bs({batch_size}) * base({trainer.base_lr:.2e})")
        self.model = RDM(config, dtype=jnp.bfloat16)
        self.schedule = DiffusionSchedule.create(
            config.timesteps, config.beta_schedule, config.linear_start,
            config.linear_end)
        self.tx = make_optimizer(
            lr, warm_up_steps=trainer.warm_up_steps,
            grad_clip=trainer.grad_clip,
            accumulate_steps=trainer.accumulate_grad_batches,
            mu_dtype=trainer.adam_mu_dtype)
        from rdm_tpu.training.optim import lambda_linear_schedule
        self._lr_schedule = lambda_linear_schedule(
            lr, warm_up_steps=trainer.warm_up_steps)
        self.step_fn = make_train_step(
            self.model, self.tx, self.schedule, mesh=mesh,
            ema_decay=trainer.ema_decay, remat=trainer.remat,
            remat_policy=trainer.remat_policy,
            param_sharding=trainer.param_sharding)
        self.first_stage = VQModel(first_stage_config, dtype=jnp.bfloat16)
        self.first_stage_params = first_stage_params
        # LDM trains on the PRE-quantization latent (VQModelInterface.encode)
        self._encode = jax.jit(lambda p, x: self.first_stage.apply(
            p, x, method=VQModel.encode_prequant) * config.scale_factor)
        self._decode = jax.jit(lambda p, z: self.first_stage.apply(
            p, z / config.scale_factor, force_not_quantize=False,
            method=VQModel.decode))
        os.makedirs(trainer.logdir, exist_ok=True)
        os.makedirs(os.path.join(trainer.logdir, "images", "train"),
                    exist_ok=True)
        self.ckpt = CheckpointManager(
            os.path.join(trainer.logdir, "checkpoints"),
            max_to_keep=trainer.max_ckpts, monitor=trainer.monitor)
        self._metrics_f = open(
            os.path.join(trainer.logdir, "metrics.jsonl"), "a")
        self._tb = None
        if trainer.use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(trainer.logdir, "tb"))
            except ImportError:
                print("tensorboard logging requested but tensorflow "
                      "unavailable; falling back to jsonl only")

    # ---------- state ----------

    def init_state(self) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.channels))

        def make(rng):
            params = self.model.init(
                rng, x, jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, cfg.k_nn, cfg.context_dim)))
            return init_train_state(params, self.tx)

        return _init_state(make, jax.random.PRNGKey(self.tcfg.seed),
                           self.mesh, self.tcfg.param_sharding)

    def resume_or_init(self) -> TrainState:
        state = self.init_state()
        latest = self.ckpt.latest_step()
        if latest is not None:
            print(f"resuming from step {latest}")
            state = self.ckpt.restore(state, latest)
        return _place_state(state, self.mesh, self.tcfg.param_sharding)

    # ---------- batch plumbing ----------

    def prepare_batch(self, batch: Dict[str, np.ndarray]):
        """host batch {'image' [B,H,W,3] in [-1,1], 'nn_embeddings'
        [B,n,k,D]} → (z latents, neighbor context)."""
        x = jnp.asarray(batch["image"], dtype=jnp.float32)
        z = self._encode(self.first_stage_params, x)
        nns = jnp.asarray(batch["nn_embeddings"], dtype=jnp.float32)
        return z, nns

    # ---------- loop ----------

    def validate(self, state: TrainState, val_loader,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        """EMA-weighted validation loss — the reference's monitored
        val/loss_simple_ema (ldm validation_step + ema_scope)."""
        max_batches = max_batches or self.tcfg.val_batches
        losses = []
        rng = jax.random.PRNGKey(0)  # fixed: comparable across evals
        for bi, batch in enumerate(val_loader):
            if bi >= max_batches:
                break
            z, nns = self.prepare_batch(batch)
            _, m = self.model.apply(
                state.ema.params, z, nns, jax.random.fold_in(rng, bi),
                self.schedule, method=RDM.training_loss)
            losses.append(float(np.asarray(m["loss_simple"])))
        return {"val/loss_simple_ema":
                float(np.mean(losses)) if losses else float("nan")}

    def fit(self, loader: Iterable, state: Optional[TrainState] = None,
            max_steps: Optional[int] = None,
            val_loader: Optional[Iterable] = None) -> TrainState:
        state = state if state is not None else self.resume_or_init()
        max_steps = max_steps or self.tcfg.max_steps
        rng = jax.random.PRNGKey(self.tcfg.seed + 1)
        install_signal_checkpoint(
            lambda: self._save(state, {}, wait=True))
        t0 = time.time()
        seen = 0
        # host-side step counter: reading int(state.step) every iteration
        # would force a device sync per step and serialize host batch prep
        # against device compute (async dispatch lets the host run ahead)
        step = int(state.step)
        try:
            while step < max_steps:
                for batch in loader:
                    if step >= max_steps:
                        break
                    z, nns = self.prepare_batch(batch)
                    state, metrics = self.step_fn(state, z, nns, rng)
                    seen += z.shape[0]
                    if step % self.tcfg.log_every == 0:
                        self._log(step, metrics, seen, time.time() - t0)
                    if step and step % self.tcfg.ckpt_every == 0:
                        metrics = dict(metrics)
                        if val_loader is not None:
                            val = self.validate(state, val_loader)
                            metrics.update(val)
                            self._log(step, val, seen, time.time() - t0)
                        self._save(state, metrics)
                    if (self.tcfg.image_log_every
                            and step % self.tcfg.image_log_every == 0):
                        self._log_images(state, batch, step)
                    step += 1
        except BaseException:
            # With async dispatch a device failure surfaces at the next
            # metrics sync (up to log_every steps late) and `state` may
            # hold poisoned buffers whose device_get re-raises — never
            # let the salvage attempt mask the original traceback.
            print("exception — saving checkpoint before exit")
            try:
                self._save(state, {}, wait=True)
            except Exception as save_err:
                print(f"checkpoint salvage failed: {save_err!r}")
            raise
        self._save(state, {}, wait=True)
        return state

    # ---------- logging / ckpt ----------

    def _log(self, step: int, metrics: Dict[str, Any], seen: int,
             elapsed: float) -> None:
        row = {k: float(np.asarray(v)) for k, v in metrics.items()}
        row.update(step=step, samples_seen=seen, wall_s=round(elapsed, 1),
                   samples_per_sec=round(seen / max(elapsed, 1e-9), 2),
                   lr=float(np.asarray(self._lr_schedule(step))))
        from rdm_tpu.utils.profiling import device_memory_stats
        mem = device_memory_stats()
        if "bytes_in_use" in mem:
            row["hbm_gb"] = round(mem["bytes_in_use"] / 2**30, 2)
        self._metrics_f.write(json.dumps(row) + "\n")
        self._metrics_f.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in row.items():
                    if k != "step":
                        tf.summary.scalar(k, v, step=step)
        print(f"step {step}: " + " ".join(
            f"{k}={v:.4g}" for k, v in row.items() if k != "step"))

    def _save(self, state: TrainState, metrics: Dict[str, Any],
              wait: bool = False) -> None:
        self.ckpt.save(int(state.step), jax.device_get(state),
                       metrics={k: np.asarray(v)
                                for k, v in metrics.items()})
        if wait:
            self.ckpt.wait()

    def _log_images(self, state: TrainState, batch, step: int) -> None:
        """Full diagnostics grids with EMA weights (ImageLogger/log_images
        equivalent, reference main.py:541-656 + ddpm.py:460-638)."""
        from PIL import Image

        from rdm_tpu.diagnostics import log_images

        grids = log_images(
            self.model, state.ema.params, self.first_stage,
            self.first_stage_params, self.schedule, batch,
            jax.random.PRNGKey(step),
            ddim_steps=self.tcfg.image_log_steps)
        for key, grid in grids.items():
            Image.fromarray(grid).save(os.path.join(
                self.tcfg.logdir, "images", "train",
                f"{key}_gs-{step:06d}.png"))


class RARMTrainer:
    """Training driver for the autoregressive family: images are VQ-f16
    encoded to code indices on device, the transformer trains with
    teacher-forced cross-entropy (reference LatentImageRETRO training via
    main.py; AdamW betas (0.9, 0.95), transformer.py:283-287)."""

    def __init__(self, config, trainer: TrainerConfig,
                 first_stage_config: AutoencoderConfig,
                 first_stage_params: Any, mesh=None,
                 batch_size: Optional[int] = None):
        import optax

        from rdm_tpu.models.rarm import RARM

        self.cfg = config
        self.tcfg = trainer
        self.mesh = mesh
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        lr = trainer.base_lr
        if trainer.scale_lr and batch_size is not None:
            lr = (trainer.accumulate_grad_batches * n_data * batch_size
                  * trainer.base_lr)
        self.model = RARM(config, dtype=jnp.bfloat16)
        from rdm_tpu.training.optim import lambda_linear_schedule
        self.tx = optax.adamw(
            lambda_linear_schedule(lr,
                                   warm_up_steps=trainer.warm_up_steps),
            b1=0.9, b2=0.95, weight_decay=1e-2)
        self.step_fn = make_rarm_train_step(
            self.model, self.tx, mesh=mesh, ema_decay=trainer.ema_decay,
            p_mask_max=config.p_mask_max,
            param_sharding=trainer.param_sharding)
        self.first_stage = VQModel(first_stage_config, dtype=jnp.bfloat16)
        self.first_stage_params = first_stage_params

        @jax.jit
        def encode_codes(p, x):
            _, _, idx = self.first_stage.apply(p, x,
                                               method=VQModel.encode)
            return idx.reshape(idx.shape[0], -1).astype(jnp.int32)

        self._encode_codes = encode_codes
        os.makedirs(trainer.logdir, exist_ok=True)
        os.makedirs(os.path.join(trainer.logdir, "images", "train"),
                    exist_ok=True)
        self.ckpt = CheckpointManager(
            os.path.join(trainer.logdir, "checkpoints"),
            max_to_keep=trainer.max_ckpts, monitor=trainer.monitor)
        self._metrics_f = open(
            os.path.join(trainer.logdir, "metrics.jsonl"), "a")
        self._tb = None

    def init_state(self) -> TrainState:
        def make(rng):
            params = self.model.init(
                rng, jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, self.cfg.seq_len, self.cfg.context_dim)))
            return init_train_state(params, self.tx)

        return _init_state(make, jax.random.PRNGKey(self.tcfg.seed),
                           self.mesh, self.tcfg.param_sharding)

    def resume_or_init(self) -> TrainState:
        state = self.init_state()
        latest = self.ckpt.latest_step()
        if latest is not None:
            print(f"resuming from step {latest}")
            state = self.ckpt.restore(state, latest)
        return _place_state(state, self.mesh, self.tcfg.param_sharding)

    def prepare_batch(self, batch):
        x = jnp.asarray(batch["image"], dtype=jnp.float32)
        z_indices = self._encode_codes(self.first_stage_params, x)
        nns = jnp.asarray(batch["nn_embeddings"], dtype=jnp.float32)
        b = nns.shape[0]
        if nns.ndim == 4:
            nns = nns.reshape(b, -1, nns.shape[-1])
        return z_indices, nns

    def validate(self, state: TrainState, val_loader,
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        """EMA-weighted held-out CE loss (the counterpart of the RDM
        trainer's validate; backs the post-fit test pass, reference
        main.py:1024-1031)."""
        from rdm_tpu.models.rarm import RARM

        max_batches = max_batches or self.tcfg.val_batches
        losses = []
        rng = jax.random.PRNGKey(0)  # fixed: comparable across evals
        for bi, batch in enumerate(val_loader):
            if bi >= max_batches:
                break
            z_idx, nns = self.prepare_batch(batch)
            _, m = self.model.apply(
                state.ema.params, z_idx, nns, jax.random.fold_in(rng, bi),
                None, method=RARM.training_loss)
            losses.append(float(np.asarray(m["loss"])))
        return {"val/loss_ema":
                float(np.mean(losses)) if losses else float("nan")}

    def fit(self, loader, state: Optional[TrainState] = None,
            max_steps: Optional[int] = None) -> TrainState:
        state = state if state is not None else self.resume_or_init()
        max_steps = max_steps or self.tcfg.max_steps
        rng = jax.random.PRNGKey(self.tcfg.seed + 1)
        t0 = time.time()
        # host-side step counter — see the RDM fit(): a per-step
        # int(state.step) read would sync the device every iteration
        step = int(state.step)
        try:
            while step < max_steps:
                for batch in loader:
                    if step >= max_steps:
                        break
                    z_idx, nns = self.prepare_batch(batch)
                    state, metrics = self.step_fn(state, z_idx, nns, rng)
                    if step % self.tcfg.log_every == 0:
                        row = {k: float(np.asarray(v))
                               for k, v in metrics.items()}
                        row.update(step=step,
                                   wall_s=round(time.time() - t0, 1))
                        self._metrics_f.write(json.dumps(row) + "\n")
                        self._metrics_f.flush()
                        print(f"step {step}: " + " ".join(
                            f"{k}={v:.4g}" for k, v in row.items()
                            if k != "step"))
                    if step and step % self.tcfg.ckpt_every == 0:
                        self.ckpt.save(step, jax.device_get(state),
                                       metrics={
                                           k: np.asarray(v)
                                           for k, v in metrics.items()})
                    if (self.tcfg.image_log_every
                            and step % self.tcfg.image_log_every == 0):
                        self._log_images(state, batch, step)
                    step += 1
        except BaseException:
            try:  # see the RDM fit(): don't mask the original error
                self.ckpt.save(int(state.step), jax.device_get(state))
                self.ckpt.wait()
            except Exception as save_err:
                print(f"checkpoint salvage failed: {save_err!r}")
            raise
        self.ckpt.save(int(state.step), jax.device_get(state))
        self.ckpt.wait()
        return state

    def _log_images(self, state: TrainState, batch, step: int) -> None:
        from PIL import Image

        from rdm_tpu.diagnostics import log_images_rarm

        grids = log_images_rarm(
            self.model, state.ema.params, self.first_stage,
            self.first_stage_params, batch, jax.random.PRNGKey(step))
        for key, grid in grids.items():
            Image.fromarray(grid).save(os.path.join(
                self.tcfg.logdir, "images", "train",
                f"{key}_gs-{step:06d}.png"))
