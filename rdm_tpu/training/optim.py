"""Optimizer + LR schedule factory.

Reference semantics: AdamW over unet + retrieval encoder (+ logvar)
(/root/reference/rdm/models/diffusion/ddpm.py:1013-1042) with
LambdaLinearScheduler (ldm.lr_scheduler, config
models/rdm/imagenet/config.yaml:24-35): linear warmup from f_start to f_max
over warm_up_steps, then linear interpolation toward f_min across the cycle
(cycle_lengths=1e13 in released configs => constant f_max after warmup).
LR scaling rule: lr = accumulate_grad_batches * n_devices * batch_size *
base_lr (main.py:992-1000), applied by the caller.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def lambda_linear_schedule(
    base_lr: float,
    warm_up_steps: int = 100,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
) -> optax.Schedule:
    def schedule(step):
        warm = f_start + (f_max - f_start) * (step / max(warm_up_steps, 1))
        frac = (step - warm_up_steps) / cycle_length
        decay = f_min + (f_max - f_min) * (1.0 - frac)
        return base_lr * jnp.where(step < warm_up_steps, warm, decay)

    return schedule


def lambda_warmup_cosine_schedule(
    base_lr: float,
    warm_up_steps: int,
    lr_max: float = 1.0,
    lr_min: float = 0.0,
    lr_start: float = 0.0,
    cycle_length: float = 1e12,
) -> optax.Schedule:
    """ldm LambdaWarmUpCosineScheduler: linear warmup lr_start→lr_max, then
    cosine decay toward lr_min over the cycle."""

    def schedule(step):
        warm = lr_start + (lr_max - lr_start) * (
            step / max(warm_up_steps, 1))
        t = jnp.clip((step - warm_up_steps) / cycle_length, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(jnp.pi * t))
        return base_lr * jnp.where(step < warm_up_steps, warm, cos)

    return schedule


SCHEDULES = {
    "lambda_linear": lambda_linear_schedule,
    "lambda_warmup_cosine": lambda_warmup_cosine_schedule,
}


def make_optimizer(
    base_lr: float,
    *,
    warm_up_steps: int = 100,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
    schedule_name: str = "lambda_linear",
    mu_dtype: Optional[str] = None,
    fused_update: bool = False,
) -> optax.GradientTransformation:
    """mu_dtype="bfloat16" stores the Adam FIRST moment in bf16 (halving
    its HBM: ~0.8 GB on the 395M flagship). The second moment stays f32 —
    v's magnitude spans grad^2 scales where bf16's 8 mantissa bits inject
    visible LR noise, while m is a smoothed gradient average that
    tolerates them (standard large-model practice).

    fused_update=True runs the Adam/EMA math over ONE flattened
    parameter vector (optax.flatten). Motivation: the round-4 train-step
    trace attributed 51 ms/step (~21%) to 652 per-leaf pointwise update
    ops. MEASURED NO-GO on v5e (flagship b32 no-remat pipelined): 94.5
    samples/s vs 120.7 per-leaf — the grad concat + update re-slice
    copies (2x ~1.6 GB each way) cost more than the per-leaf dispatch
    overhead they remove. Kept default-off for A/B on other op points
    (mathematically identical, parity-tested; NOTE the optimizer STATE
    layout becomes a flat vector, so checkpoints are not interchangeable
    with the per-leaf layout).

    Round-4 follow-up KILLED the whole leaf-packing direction with an
    isolated microbench over the real 689-leaf flagship distribution
    (Adam+EMA, m bf16, amortized in one donated fori_loop on v5e):
    per-leaf 22.26 ms/step = ~78% of the ~17.4 ms HBM roofline for the
    update's 14.2 GB of state traffic (36 B/param x 395M); packing
    leaves <1 MB into persistent flat vectors 21.1-21.3 ms, <4 MB
    (621 leaves, 390 MB) 20.6-21.9 ms, fully flat 20.21 ms — best case
    9% of a ~22 ms phase, <1% end-to-end, and forcing the unpacked
    views to materialize (the pessimistic forward-consumption model)
    erases even that. Per-leaf dispatch is NOT a training bottleneck;
    the trace's 51 ms over-attribution counted backward-pass pointwise
    fusions that share op names with the update. A Pallas multi-buffer
    update kernel could at best recover ~5 ms/step (~2%) — not worth
    the surface."""
    schedule = SCHEDULES[schedule_name](base_lr,
                                        warm_up_steps=warm_up_steps)
    tx = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay,
                     mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None)
    if fused_update:
        tx = optax.flatten(tx)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
