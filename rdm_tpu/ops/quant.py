"""Post-training int8 quantization for the RDM U-Net serving path.

v5e's int8 MXU rate is 2x bf16 and ~85% of the flagship DDIM forward is
convolution time (round-2 HLO-mapped trace), so weight+activation int8
convs are the remaining big serving lever. Recipe (same family as the
RARM `--int8_weights` mode in models/rarm.py, extended to activations):

- weights: symmetric per-output-channel int8, quantized once from the
  serving kernels (scales computed in f32);
- activations: symmetric per-tensor int8 with a STATIC scale calibrated
  on a real sampling trajectory. Measured on v5e (round-4 probe): bare
  int8 convs run 1.6-2.3x bf16, but DYNAMIC per-call max-abs requant
  eats nearly all of it (1.0-1.36x) — the reduction+rescale cannot fuse
  into the conv. Static scales keep the quantize a cheap pointwise op.
- dequant on the conv OUTPUT: y = conv_int8(x_q, w_q) * (a_s * w_s[o])
  + bias, bias in f32.

Calibration inputs come from the forward-diffusion marginal: noise the
final bf16 sample back to a spread of DDIM timesteps with q_sample —
exactly the x_t distribution the eps-model was trained on — and run the
serving-form forward (shared-prefix CFG context) with
`with calibrate():` so every QuantizableConv sows its input max-abs
(layers.QuantizableConv). One compile, n_points executions.

The input conv (`conv_in`) and the eps head (`out_conv`) stay in bf16 by
default: together they are <0.5% of the FLOPs and the head directly sets
pred_x0 accuracy.

Reference being beaten: the torch reference serves the DDIM loop in
fp32/TF32 eager (/root/reference/rdm/models/diffusion/ddim.py:217-268)
with no quantized mode at all.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Trace-time flag: QuantizableConv sows its input max-abs under
# intermediates/<path>/act_absmax while this is True. Set it around the
# TRACE (first call of a fresh jit), not the execution.
CALIBRATE = False

# modules kept in bf16 (leaf module names in the U-Net param tree)
DEFAULT_EXCLUDE = ("conv_in", "out_conv")


@contextlib.contextmanager
def calibrate():
    """Enable act_absmax sowing for code traced inside this block."""
    global CALIBRATE
    prev = CALIBRATE
    CALIBRATE = True
    try:
        yield
    finally:
        CALIBRATE = prev


def merge_absmax(a, b):
    """Elementwise max of two calibration trees (same structure)."""
    if a is None:
        return b
    if b is None:
        return a
    return jax.tree.map(jnp.maximum, a, b)


def _is_mapping(x) -> bool:
    return hasattr(x, "items") and hasattr(x, "get")


def _quantize_node(node: Dict[str, Any], absmax) -> Dict[str, Any]:
    """One conv param node {kernel [kh,kw,I,O], bias} → int8 serving node
    {kernel int8, kernel_scale [O] f32, act_scale scalar f32, bias}."""
    k = node["kernel"].astype(jnp.float32)
    w_s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)),
                      jnp.float32(1e-12)) / 127.0
    kq = jnp.clip(jnp.round(k / w_s), -127.0, 127.0).astype(jnp.int8)
    a_s = jnp.maximum(jnp.asarray(absmax, jnp.float32),
                      jnp.float32(1e-12)) / 127.0
    out = dict(node)
    out["kernel"] = kq
    out["kernel_scale"] = w_s
    out["act_scale"] = a_s
    return out


def quantize_conv_tree(variables, calib, *,
                       exclude: Iterable[str] = DEFAULT_EXCLUDE):
    """Build the int8 serving param tree from bf16/f32 params + a
    calibration tree.

    variables: the full flax variables dict ({"params": ...}).
    calib: the intermediates returned by apply(..., mutable=
      ["intermediates"]) under `calibrate()` (optionally max-merged over
      several calls) — either the {"intermediates": ...} dict or its
      inner tree. Only conv nodes with a calibrated `act_absmax` AND a
      4D `kernel` are quantized; everything else passes through, so
      Dense/norm/embedding leaves (and the fused Pallas block weights)
      are untouched.
    exclude: leaf module names to keep unquantized.
    """
    exclude = frozenset(exclude)
    inter = calib.get("intermediates", calib) if _is_mapping(calib) \
        else calib

    def walk(p, i, name):
        if not _is_mapping(p):
            return p
        quantizable = (
            _is_mapping(i) and "act_absmax" in i and "kernel" in p
            and name not in exclude
            and getattr(p["kernel"], "ndim", 0) == 4)
        if quantizable:
            return _quantize_node(p, i["act_absmax"])
        return {k: walk(v, i.get(k) if _is_mapping(i) else None, k)
                for k, v in p.items()}

    def build(v, i):
        # the variables dict has a top-level "params" collection that the
        # intermediates tree (pure module paths) does not — align them.
        # The calibration tree itself rides along as a "quant" collection:
        # the fused Pallas block path reads its attention/FF act absmax
        # to quantize the transformer-block matmuls on the fly (weight
        # quantization there is loop-invariant, so XLA hoists it out of
        # the DDIM scan).
        if _is_mapping(v) and "params" in v \
                and not (_is_mapping(i) and "params" in i):
            out = {k: (walk(val, i, "") if k == "params" else val)
                   for k, val in v.items()}
            out["quant"] = i
            return out
        return walk(v, i, "")

    # one jit for the whole tree: leaf-by-leaf dispatch costs a remote
    # round-trip per unique shape through the axon tunnel (pipeline
    # cast_params_for_inference has the same rationale)
    leaves = jax.tree_util.tree_leaves(inter)
    if not leaves:
        raise ValueError(
            "calibration tree has no act_absmax leaves — run the forward "
            "inside quant.calibrate() with mutable=['intermediates']")
    return jax.jit(build)(variables, inter)


def num_quantized(variables) -> int:
    """Count int8 conv kernels in a (possibly quantized) param tree."""
    return sum(1 for leaf in jax.tree_util.tree_leaves(variables)
               if getattr(leaf, "dtype", None) == jnp.int8
               and getattr(leaf, "ndim", 0) == 4)


def ddim_trajectory_absmax(
    apply_fn,
    params,
    z: jnp.ndarray,
    schedule,
    num_steps: int,
    context: Optional[jnp.ndarray],
    seed: int = 0,
    n_points: int = 8,
):
    """Calibrate conv input max-abs over a DDIM trajectory.

    apply_fn(params, x, t, ctx) must run the model forward and return
    (out, {"intermediates": ...}) — i.e. close over
    mutable=["intermediates"]. `z` is a batch of final latents in MODEL
    scale (the sampler's x_0); x_t calibration inputs are q_sample(z, t)
    at `n_points` timesteps spread over the DDIM ladder, which is the
    forward-diffusion marginal the eps-model was trained on. `context`
    must be in the exact serving form (e.g. the shared-prefix CFG
    (cond, uncond) stack) so every conv sees its serving batch shape.
    """
    from rdm_tpu.ops.schedules import DDIMSchedule, q_sample

    ddim = DDIMSchedule.create(schedule, num_steps)
    steps = np.asarray(ddim.timesteps)
    pick = np.unique(np.linspace(0, len(steps) - 1,
                                 min(n_points, len(steps))).astype(int))
    rng = jax.random.PRNGKey(seed)

    calib_step = jax.jit(
        lambda p, x, t, c: apply_fn(p, x, t, c)[1])
    absmax = None
    with calibrate():
        for j, idx in enumerate(pick):
            rng, nrng = jax.random.split(rng)
            t = jnp.full((z.shape[0],), int(steps[idx]), dtype=jnp.int32)
            x_t = q_sample(schedule, z, t,
                           jax.random.normal(nrng, z.shape, jnp.float32))
            inter = calib_step(params, x_t, t, context)
            absmax = merge_absmax(absmax, inter)
    return absmax
