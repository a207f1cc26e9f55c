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


def make_optimizer(
    base_lr: float,
    *,
    warm_up_steps: int = 100,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    schedule = lambda_linear_schedule(base_lr, warm_up_steps=warm_up_steps)
    tx = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
