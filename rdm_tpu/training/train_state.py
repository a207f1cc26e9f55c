"""Sharded training step for RDM.

Replaces the reference's PyTorch-Lightning + DDP training path
(/root/reference/main.py:784-785, ddpm.py:390-398) with a single jitted
function over the global mesh:

- params / opt-state / EMA replicated over the mesh (default) or
  FSDP-sharded over the `data` axis (param_sharding="fsdp", beyond the
  reference's always-replicated DDP); batch sharded over `data` — XLA
  inserts the gradient all-reduce / all-gather+reduce-scatter over ICI
  (the NCCL equivalent, SURVEY.md §2.5).
- gradient rematerialization: the loss closure is wrapped in
  `jax.checkpoint` with a dots-saveable policy so the U-Net's matmuls are
  kept and the rest recomputed (the reference's `use_checkpoint: true`).
- EMA update fused into the step (LitEma equivalent).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rdm_tpu.models.rdm import RDM
from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.training.ema import EmaState, ema_init, ema_update


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: EmaState


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params["params"] if "params" in params else params),
        ema=ema_init(params),
    )


def _state_constrainer(mesh: Optional[Mesh], param_sharding: str,
                       min_size: int = 16384):
    """Identity for replicated training; for "fsdp", a tree-map of
    with_sharding_constraint pinning every state leaf to its fsdp_spec so
    the OUTPUT state stays sharded (the input's sharding comes from
    shard_train_state; without the output pin GSPMD may decide to keep a
    replicated copy alive, forfeiting the memory win)."""
    if param_sharding not in ("replicated", "fsdp"):
        raise ValueError(f"unknown param_sharding '{param_sharding}'")
    if param_sharding == "replicated" or mesh is None:
        return lambda tree: tree
    from rdm_tpu.parallel.mesh import fsdp_spec

    n = mesh.shape["data"]

    def constrain(tree):
        return jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(
                l, NamedSharding(mesh, fsdp_spec(l.shape, n,
                                                 min_size=min_size))), tree)

    return constrain


def _jit_step(train_step, mesh: Optional[Mesh], param_sharding: str):
    """Common jit tail for the RDM and RARM steps: batch over `data`,
    metrics replicated; the state replicated (DDP mode) or left to the
    argument's sharding + the in-step constraint (fsdp mode)."""
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    state_in = repl if param_sharding == "replicated" else None
    state_out = repl if param_sharding == "replicated" else None
    return jax.jit(
        train_step,
        in_shardings=(state_in, batch_sh, batch_sh, repl),
        out_shardings=(state_out, repl),
        donate_argnums=(0,),
    )


def make_train_step(
    model: RDM,
    tx: optax.GradientTransformation,
    schedule: DiffusionSchedule,
    *,
    mesh: Optional[Mesh] = None,
    ema_decay: float = 0.9999,
    remat: bool = True,
    remat_policy: str = "dots",
    param_sharding: str = "replicated",
    fsdp_min_size: int = 16384,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jax.Array],
              Tuple[TrainState, dict]]:
    """Build the jitted train step.

    step(state, z[B,H,W,C], neighbors[B,n,k,D], rng) -> (state, metrics).
    `z` is the already-encoded (and scaled) latent batch — first-stage
    encoding happens in the input pipeline or a separate frozen pass.

    remat_policy: "dots" keeps MXU outputs and recomputes pointwise
    (measured best at the flagship op point); "nothing" recomputes
    everything (min memory); "dots_no_batch" keeps only weight-stationary
    matmul outputs.

    param_sharding: "replicated" (reference-DDP equivalent) or "fsdp" —
    state leaves sharded over the data axis (parallel.mesh.fsdp_spec);
    put the state with parallel.mesh.shard_train_state first. Cuts the
    resident params+moments+EMA HBM by ~n_data x for models that outgrow
    a chip; GSPMD inserts the all-gathers/reduce-scatters over ICI.
    """

    def loss_fn(params, z, neighbors, rng):
        return model.apply(params, z, neighbors, rng, schedule,
                           deterministic=False, method=RDM.training_loss,
                           rngs={"dropout": jax.random.fold_in(rng, 1)})

    if remat:
        policy = {
            "dots": jax.checkpoint_policies.dots_saveable,
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            # Resolution-selective: keep only the UNet block outputs at
            # downsampling factor >= 2 (tagged blk_ds* in models/unet.py)
            # and recompute the large full-resolution activations — the
            # cheapest memory/recompute point for batches past the
            # no-remat HBM ceiling.
            "save_lowres": jax.checkpoint_policies.save_only_these_names(
                "blk_ds2", "blk_ds4", "blk_ds8", "blk_ds16", "blk_ds32"),
        }[remat_policy]
        loss_fn = jax.checkpoint(loss_fn, policy=policy)

    constrain = _state_constrainer(mesh, param_sharding, fsdp_min_size)

    def train_step(state: TrainState, z, neighbors, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, z, neighbors, rng)
        inner = "params" in state.params
        g = grads["params"] if inner else grads
        p = state.params["params"] if inner else state.params
        updates, opt_state = tx.update(g, state.opt_state, p)
        new_p = optax.apply_updates(p, updates)
        new_params = {**state.params, "params": new_p} if inner else new_p
        ema = ema_update(state.ema, new_params, decay=ema_decay)
        new_state = constrain(TrainState(
            step=state.step + 1, params=new_params,
            opt_state=opt_state, ema=ema))
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(g)
        return new_state, metrics

    return _jit_step(train_step, mesh, param_sharding)


def make_rarm_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    mesh: Optional[Mesh] = None,
    ema_decay: float = 0.9999,
    p_mask_max: float = 0.0,
    param_sharding: str = "replicated",
    fsdp_min_size: int = 16384,
):
    """Train step for the RARM transformer: teacher-forced cross-entropy
    over VQ code indices (reference transformer.py:46-57, 207-222), same
    DP sharding/EMA plumbing as the diffusion step (incl. the "fsdp"
    param_sharding mode — see make_train_step).

    step(state, z_indices[B,S] int32, neighbors[B,S_ctx,D], rng)."""
    from rdm_tpu.models.rarm import RARM

    def loss_fn(params, z_indices, neighbors, rng):
        p_mask = None
        if p_mask_max > 0.0:
            p_mask = jax.random.uniform(jax.random.fold_in(rng, 2),
                                        maxval=p_mask_max)
        return model.apply(params, z_indices, neighbors,
                           jax.random.fold_in(rng, 3), p_mask,
                           method=RARM.training_loss)

    constrain = _state_constrainer(mesh, param_sharding, fsdp_min_size)

    def train_step(state: TrainState, z_indices, neighbors, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, z_indices, neighbors, rng)
        inner = "params" in state.params
        g = grads["params"] if inner else grads
        p = state.params["params"] if inner else state.params
        updates, opt_state = tx.update(g, state.opt_state, p)
        new_p = optax.apply_updates(p, updates)
        new_params = {**state.params, "params": new_p} if inner else new_p
        ema = ema_update(state.ema, new_params, decay=ema_decay)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(g)
        return constrain(TrainState(state.step + 1, new_params, opt_state,
                                    ema)), metrics

    return _jit_step(train_step, mesh, param_sharding)
