"""Exponential moving average of a parameter pytree.

Replaces LitEma (used at /root/reference/rdm/models/diffusion/ddpm.py:161-164
and swapped in for sampling via `ema_scope` ddpm.py:836,977) with a pure
functional pytree average — no buffer mutation, jit/pjit-friendly. The decay
warmup `min(decay, (1+n)/(10+n))` matches LitEma's schedule.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any  # shadow pytree (float32)
    count: jnp.ndarray  # int32 scalar


def ema_init(params) -> EmaState:
    # jnp.array(copy=True): the shadow must NOT alias the live params —
    # aliased buffers break XLA donation (donate-same-buffer-twice).
    shadow = jax.tree.map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)
    return EmaState(params=shadow, count=jnp.zeros((), dtype=jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    count = state.count + 1
    d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
    new_shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p.astype(jnp.float32)),
        state.params, params)
    return EmaState(params=new_shadow, count=count)
