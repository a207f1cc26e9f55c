"""High-level inference pipelines: model + first stage + retrieval + CLIP.

The orchestration layer behind scripts/rdm_sample.py and
scripts/rarm_sample.py — the TPU-native counterpart of the reference's
`sample_from_rdata` / `sample_with_query` driver logic
(/root/reference/rdm/models/diffusion/ddpm.py:688-984,
/root/reference/rdm/models/autoregression/transformer.py:296-391).

Semantics kept:
- unconditional sampling draws query ids from the nn-memory top-M
  (frequency-weighted optionally), looks their embeddings up in the pool,
  retrieves k_nn neighbors, and conditions on them.
- query sampling inserts the (CLIP text/image) query embedding as neighbor
  #0 (ddpm.py:775); --omit_query drops it; --only_caption uses the query as
  the single pseudo-neighbor.
- the CFG null context is the guidance vector rescaled to the given label
  norm — both reference CLIs pass 0.0, i.e. a zero vector (ddpm.py:673-680,
  rdm_sample.py:251 / rarm_sample.py).
- EMA weights are used for sampling when available (ema_scope equivalent).

Everything device-side is jitted once per (batch, k, steps) shape; retrieval
and the DDIM loop run inside a single program so kNN overlaps the previous
batch's decode via XLA async dispatch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.config import (
    first_stage_config_from_yaml,
    load_config,
    model_config_from_yaml,
)
from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
from rdm_tpu.models.clip import CLIP, ClipConfig
from rdm_tpu.models.rarm import RARM, RARMConfig, sample_tokens
from rdm_tpu.models.rdm import RDM, RDMConfig, sample_with_neighbors
from rdm_tpu.ops.schedules import DiffusionSchedule
from rdm_tpu.retrieval.database import DataPool, NNMemory
from rdm_tpu.retrieval.engine import RetrievalEngine
from rdm_tpu.sampling import DDIMSamplerConfig
from rdm_tpu.utils.tokenizer import tokenize


def to_uint8(images: np.ndarray) -> np.ndarray:
    """float [-1,1] NHWC → uint8."""
    x = np.clip((np.asarray(images) + 1.0) / 2.0, 0.0, 1.0)
    return (x * 255).astype(np.uint8)


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Cast >=2D weight leaves to the compute dtype ONCE.

    Modules declare param_dtype=fp32 and cast at use; inside a sampling
    lax.scan that cast re-reads the full fp32 weight set from HBM every
    step. Pre-cast weights make it a no-op. 1D leaves (biases, norm
    scales) stay fp32 — norms recast to fp32 internally anyway.

    The whole tree is cast inside ONE jit: leaf-by-leaf .astype dispatches
    a separate remote compile per unique shape (~0.4 s each through the
    axon tunnel x hundreds of leaves = minutes of wall time before the
    real compile even starts).
    """
    return jax.jit(
        lambda tree: jax.tree.map(
            lambda p: p.astype(dtype) if getattr(p, "ndim", 0) >= 2 else p,
            tree)
    )(params)


def _load_clip_weights(clip_ckpt):
    """CLIP weights from a pre-converted npz (torch-free) or an OpenAI
    torch checkpoint. Returns (params, config) or (None, None)."""
    if not clip_ckpt or not os.path.isfile(clip_ckpt):
        return None, None
    if clip_ckpt.endswith(".npz"):
        from rdm_tpu.models.clip import ClipConfig
        from rdm_tpu.utils.params_io import load_params_npz

        return load_params_npz(clip_ckpt), ClipConfig.vit_b32()
    from rdm_tpu.utils.torch_convert import (
        convert_clip,
        load_torch_state_dict,
    )

    return convert_clip(load_torch_state_dict(clip_ckpt))


def _maybe_data_parallel(run, mesh, batch: int):
    """Shard a `(params, batch_input, rng) -> batch_output` sampler over
    the mesh's `data` axis (params replicated, batch sharded) — the
    serving-side counterpart of the DP train step (SURVEY.md §2.5). A
    plain jit when no multi-device data axis is available: the jitted
    closure lives in the pipeline's runner cache, so repeated calls
    skip re-tracing the whole sampling program."""
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return jax.jit(run)
    ndata = mesh.shape["data"]
    if batch % ndata:
        raise ValueError(
            f"batch {batch} not divisible by the data axis ({ndata})")
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    return jax.jit(run, in_shardings=(repl, batch_sh, repl),
                   out_shardings=batch_sh)


@dataclasses.dataclass
class _Retrieval:
    engine: RetrievalEngine
    memory: Optional[NNMemory]

    def sample_query_embeddings(self, n: int, memsize, use_weights: bool,
                                rng: np.random.Generator,
                                qids: Optional[np.ndarray] = None
                                ) -> np.ndarray:
        if qids is None:
            if self.memory is not None:
                qids = self.memory.sample_qids(
                    n, memsize=memsize, use_weights=use_weights, rng=rng)
            else:
                qids = rng.integers(0, self.engine.size, size=n)
        return self.engine.pool.embeddings[np.asarray(qids)]


class RDMPipeline:
    """Retrieval-augmented diffusion sampling, end to end."""

    def __init__(self, config: RDMConfig, params,
                 first_stage_config: AutoencoderConfig, first_stage_params,
                 pool: Optional[DataPool] = None,
                 memory: Optional[NNMemory] = None,
                 clip_params=None, clip_config: Optional[ClipConfig] = None,
                 dtype=jnp.bfloat16, mesh=None, int8_weights: bool = False):
        self.config = config
        self.model = RDM(config, dtype=dtype)
        self.params = cast_params_for_inference(params, dtype)
        # int8 serving mode (ops/quant.py): the U-Net convs run int8 MXU
        # (2x bf16 rate on v5e). Calibrated lazily on the first sampling
        # call (it needs a real neighbor batch); approximate — opt-in.
        self.int8_weights = int8_weights
        self._params_int8 = None
        self._fs_params_int8 = None
        self.first_stage = VQModel(first_stage_config, dtype=dtype)
        self.first_stage_params = cast_params_for_inference(
            first_stage_params, dtype)
        self.schedule = DiffusionSchedule.create(
            config.timesteps, config.beta_schedule, config.linear_start,
            config.linear_end)
        self.retrieval = None
        self.mesh = mesh
        if pool is not None:
            self.retrieval = _Retrieval(
                RetrievalEngine(pool, mesh=mesh), memory)
        self.clip = CLIP(clip_config or ClipConfig.vit_b32(), dtype=dtype) \
            if clip_params is not None else None
        self.clip_params = clip_params
        self._runners: Dict[Any, Any] = {}
        self._decode = jax.jit(lambda p, z: self.first_stage.apply(
            p, z, force_not_quantize=False, method=VQModel.decode))

    # ---------- loading ----------

    @classmethod
    def from_model_dir(cls, model_dir: str, *,
                       database: Optional[str] = None,
                       nn_memory: Optional[str] = None,
                       clip_ckpt: Optional[str] = None,
                       random_init: bool = False,
                       seed: int = 0, **kw) -> "RDMPipeline":
        """model_dir holds config.yaml (+ model.ckpt, torch or orbax)."""
        cfg_yaml = load_config([os.path.join(model_dir, "config.yaml")])
        config = model_config_from_yaml(cfg_yaml)
        fs_config = first_stage_config_from_yaml(cfg_yaml)
        params = fs_params = None
        npz = os.path.join(model_dir, "params.npz")
        fs_npz = os.path.join(model_dir, "first_stage_params.npz")
        ckpt = os.path.join(model_dir, "model.ckpt")
        clip_params = clip_config = None
        if (os.path.isfile(npz) and os.path.isfile(fs_npz)
                and not random_init):
            # torch-free path: pre-converted via scripts/convert_checkpoint
            from rdm_tpu.utils.params_io import load_params_npz
            params = load_params_npz(npz)
            fs_params = load_params_npz(fs_npz)
        elif os.path.isfile(ckpt) and not random_init:
            from rdm_tpu.utils.torch_convert import (
                convert_rdm, load_torch_state_dict)
            sd = load_torch_state_dict(ckpt)
            params, fs_params = convert_rdm(sd, config.unet, fs_config,
                                            use_ema=True)
        else:
            params, fs_params = cls._random_params(config, fs_config, seed)
        clip_params, clip_config = _load_clip_weights(clip_ckpt)
        pool = DataPool.load(database) if database else None
        memory = NNMemory.load(nn_memory) if nn_memory else None
        return cls(config, params, fs_config, fs_params, pool=pool,
                   memory=memory, clip_params=clip_params,
                   clip_config=clip_config, **kw)

    @staticmethod
    def _random_params(config: RDMConfig, fs_config: AutoencoderConfig,
                       seed: int):
        model = RDM(config)
        x = jnp.zeros((1, config.image_size, config.image_size,
                       config.channels))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(seed), x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, config.k_nn, config.context_dim)))
        fs = VQModel(fs_config)
        # full roundtrip init so encoder AND decoder params exist
        # (inpainting/training encode; sampling decodes)
        px = config.image_size * fs_config.downsample_factor
        x_px = jnp.zeros((1, px, px, fs_config.in_channels))
        fs_params = jax.jit(fs.init)(jax.random.PRNGKey(seed + 1), x_px)
        return params, fs_params

    # ---------- conditioning assembly ----------

    def embed_caption(self, caption: str, batch_size: int) -> np.ndarray:
        if self.clip is None or self.clip_params is None:
            raise ValueError("caption sampling requires CLIP weights "
                             "(clip_ckpt)")
        toks = jnp.asarray(tokenize([caption] * batch_size))
        return np.asarray(self.clip.apply(self.clip_params, toks,
                                          method=CLIP.encode_text))

    # ---------- sampling ----------

    def sample_unconditional(
            self, batch_size: int, *, k_nn: Optional[int] = None,
            steps: int = 100, guidance_scale: float = 2.0,
            memsize=0.01, use_weights: bool = False,
            qids: Optional[np.ndarray] = None, seed: int = 0,
            return_nns: bool = False,
            encoder_reuse: int = 1) -> Dict[str, Any]:
        """sample_from_rdata equivalent (ddpm.py:877-984)."""
        if self.retrieval is None:
            raise ValueError("unconditional sampling requires a database")
        k_nn = k_nn or self.config.k_nn
        rng = np.random.default_rng(seed)
        q_emb = self.retrieval.sample_query_embeddings(
            batch_size, memsize, use_weights, rng, qids=qids)
        found = self.retrieval.engine.search(jnp.asarray(q_emb), k=k_nn)
        neighbors = jnp.asarray(found["embeddings"], dtype=jnp.float32)
        images = self._run_ddim(neighbors, steps, guidance_scale, seed,
                                encoder_reuse)
        out = {"samples_with_sampled_nns": images}
        if return_nns:
            out["nn_embeddings"] = np.asarray(found["embeddings"])
            out["nn_ids"] = np.asarray(found["nns"])
        return out

    def sample_with_query(
            self, query_embeddings: np.ndarray, *,
            k_nn: Optional[int] = None, steps: int = 100,
            guidance_scale: float = 2.0, omit_query: bool = False,
            only_query: bool = False, seed: int = 0,
            encoder_reuse: int = 1) -> Dict[str, Any]:
        """sample_with_query equivalent (ddpm.py:688-844): query embedding
        becomes neighbor #0 unless omitted; only_query skips retrieval."""
        k_nn = k_nn or self.config.k_nn
        q = np.asarray(query_embeddings, dtype=np.float32)
        if only_query:
            neighbors = q[:, None]
        else:
            if self.retrieval is None:
                raise ValueError("query sampling with retrieval requires a "
                                 "database")
            found = self.retrieval.engine.search(jnp.asarray(q), k=k_nn)
            r_emb = np.asarray(found["embeddings"], dtype=np.float32)
            if omit_query:
                neighbors = r_emb
            else:
                neighbors = np.concatenate(
                    [q[:, None], r_emb[:, :k_nn - 1]], axis=1)
        images = self._run_ddim(jnp.asarray(neighbors), steps,
                                guidance_scale, seed, encoder_reuse)
        return {"query_samples": images}

    def sample_with_caption(self, caption: str, batch_size: int,
                            **kw) -> Dict[str, Any]:
        q = self.embed_caption(caption, batch_size)
        return self.sample_with_query(q, **kw)

    def sample_inpaint(
            self, images: np.ndarray, mask: np.ndarray,
            neighbors: Optional[np.ndarray] = None, *,
            k_nn: Optional[int] = None, steps: int = 100,
            guidance_scale: float = 2.0, seed: int = 0) -> Dict[str, Any]:
        """Inpainting: keep `images` where mask==1, regenerate the rest
        (the reference's DDIM mask blend, ddim.py:187-190, exposed through
        log_images' inpainting diagnostics).

        images: [B, H, W, 3] float [-1,1] pixels; mask: [B, h, w, 1] (or
        broadcastable) in LATENT resolution, 1 = keep. neighbors default to
        retrieval by the image's own CLIP embedding when available, else
        must be provided [B, k, D].
        """
        from rdm_tpu.sampling import ddim_sample

        cfg = self.config
        x = jnp.asarray(images, dtype=jnp.float32)
        z0 = self.first_stage.apply(
            self.first_stage_params, x,
            method=VQModel.encode_prequant) * cfg.scale_factor
        if neighbors is None:
            if self.clip is None or self.retrieval is None:
                raise ValueError("provide neighbors, or CLIP weights + a "
                                 "database for auto-retrieval")
            from rdm_tpu.models.clip import preprocess
            emb = np.asarray(self.clip.apply(
                self.clip_params, preprocess(x),
                method=CLIP.encode_image))
            k = k_nn or cfg.k_nn
            neighbors = self.retrieval.engine.search(
                jnp.asarray(emb), k=k)["embeddings"]
        ctx = jnp.asarray(neighbors, dtype=jnp.float32)
        if ctx.ndim == 4:
            ctx = ctx.reshape(ctx.shape[0], -1, ctx.shape[-1])
        sampler = DDIMSamplerConfig(num_steps=steps,
                                    guidance_scale=guidance_scale,
                                    cfg_mode="shared")
        uncond = None
        if guidance_scale != 1.0:
            uncond = self.model.apply(
                self.params, ctx.shape[0], ctx.shape[1], 0.0,
                method=RDM.uncond_context)
        m = jnp.broadcast_to(jnp.asarray(mask, dtype=jnp.float32),
                             z0.shape)
        z, _ = ddim_sample(
            lambda xt, t, c: self.model.apply(self.params, xt, t, c),
            self.schedule, sampler, z0.shape, ctx,
            jax.random.PRNGKey(seed), uncond_context=uncond,
            mask=m, x0=z0)
        images_out = self._decode(self.first_stage_params,
                                  z / cfg.scale_factor)
        return {"inpaint_samples": to_uint8(images_out)}

    def sample_retro_adaptive(
            self, batch_size: int, *, k_nn: Optional[int] = None,
            steps: int = 100, guidance_scale: float = 2.0,
            retro_every: int = 10, memsize=0.01,
            use_weights: bool = False, seed: int = 0) -> Dict[str, Any]:
        """Iterative re-retrieval sampling (DDIMRetroSampler equivalent,
        reference ddim.py:270-415): every `retro_every` DDIM steps the
        current pred_x0 is decoded, CLIP-embedded, and fresh neighbors are
        gathered — all inside one compiled program. Requires CLIP weights
        and a database."""
        from rdm_tpu.models.clip import CLIP, preprocess
        from rdm_tpu.retrieval.engine import (gather_unnormalized,
                                              knn_search, l2_normalize)
        from rdm_tpu.sampling import ddim_retro_sample

        if self.retrieval is None:
            raise ValueError("retro sampling requires a database")
        if self.clip is None:
            raise ValueError("retro sampling requires CLIP weights")
        k_nn = k_nn or self.config.k_nn
        cfg = self.config
        rng_np = np.random.default_rng(seed)
        q_emb = self.retrieval.sample_query_embeddings(
            batch_size, memsize, use_weights, rng_np)
        found = self.retrieval.engine.search(jnp.asarray(q_emb), k=k_nn)
        init_ctx = jnp.asarray(found["embeddings"], dtype=jnp.float32)
        db_norm = self.retrieval.engine.db_norm
        row_norms = self.retrieval.engine.row_norms
        clip_params = self.clip_params
        fs_params = self.first_stage_params

        def reembed(pred_x0):
            img = self.first_stage.apply(
                fs_params, pred_x0 / cfg.scale_factor,
                force_not_quantize=False, method=VQModel.decode)
            emb = self.clip.apply(
                clip_params, preprocess(img), method=CLIP.encode_image)
            _, nns = knn_search(db_norm, l2_normalize(emb), k_nn)
            # condition on UNNORMALIZED pool-scale embeddings, as in
            # training (reference dsetbuilder.py:510) — raw db_norm rows
            # would be out-of-distribution unit-norm contexts
            return gather_unnormalized(db_norm, row_norms, nns)

        sampler = DDIMSamplerConfig(num_steps=steps,
                                    guidance_scale=guidance_scale,
                                    cfg_mode="shared")
        uncond = None
        if guidance_scale != 1.0:
            uncond = self.model.apply(
                self.params, batch_size, k_nn, 0.0,
                method=RDM.uncond_context)
        z = ddim_retro_sample(
            lambda x, t, c: self.model.apply(self.params, x, t, c),
            self.schedule, sampler,
            (batch_size, cfg.image_size, cfg.image_size, cfg.channels),
            init_ctx, jax.random.PRNGKey(seed),
            reembed_fn=reembed, retro_every=retro_every,
            uncond_context=uncond)
        images = self._decode(self.first_stage_params, z / cfg.scale_factor)
        return {"retro_adaptive_samples": to_uint8(images)}

    def _get_ddim_runner(self, steps: int, guidance_scale: float,
                         batch: int, encoder_reuse: int = 1):
        # runners are cached per static config: jit caches by function
        # identity, so rebuilding the closure every call would recompile
        # the whole DDIM program each time under a mesh
        key = ("ddim", steps, guidance_scale, batch, encoder_reuse)
        run = self._runners.get(key)
        if run is None:
            sampler = DDIMSamplerConfig(num_steps=steps,
                                        guidance_scale=guidance_scale,
                                        cfg_mode="shared",
                                        encoder_reuse=encoder_reuse)

            # reference CLIs pass unconditional_retro_guidance_label=0.0:
            # the null context is the guidance vector scaled to norm zero
            def run(params, nbrs, rng):
                return sample_with_neighbors(
                    self.model, params, nbrs, self.schedule, sampler, rng,
                    guidance_label=0.0)

            run = _maybe_data_parallel(run, self.mesh, batch)
            self._runners[key] = run
        return run

    def serving_params(self, neighbors=None, *, steps: int = 50,
                       guidance_scale: float = 2.0, seed: int = 0):
        """The param tree sampling runs with: int8-quantized (calibrated
        lazily on `neighbors`) when int8_weights is on, else bf16."""
        if not self.int8_weights:
            return self.params
        if neighbors is None and self._params_int8 is None:
            raise ValueError("int8 calibration needs a neighbor batch")
        return self.quantized_params(neighbors, steps=steps,
                                     guidance_scale=guidance_scale,
                                     seed=seed)

    def quantized_params(self, neighbors, *, steps: int = 50,
                         guidance_scale: float = 2.0, seed: int = 0):
        """The int8 U-Net param tree, calibrated once (cached) on a real
        sampling trajectory for `neighbors`. Usable directly (e.g. the
        quality harness) whether or not int8_weights is set."""
        if self._params_int8 is None:
            self._params_int8 = self._calibrate_int8(
                jnp.asarray(neighbors), steps, guidance_scale, seed)
        return self._params_int8

    def _calibrate_int8(self, neighbors, steps, guidance_scale, seed):
        """Build the int8 U-Net param tree (ops/quant.py): one bf16
        sampling run supplies trajectory-marginal calibration inputs, a
        single extra forward compile collects per-conv act max-abs in the
        exact serving form (shared-prefix CFG context). The VQ decoder is
        calibrated on the same run's final latents (int8 phase 3 —
        the decode is the non-U-Net conv compute of the int8 program);
        its conv_in/conv_out/post_quant_conv stay bf16."""
        from rdm_tpu.models.rdm import RDM as _RDM
        from rdm_tpu.ops import quant

        run = self._get_ddim_runner(steps, guidance_scale,
                                    neighbors.shape[0])
        z_raw = run(self.params, neighbors, jax.random.PRNGKey(seed))
        with quant.calibrate():
            fs_calib = jax.jit(lambda p, zz: self.first_stage.apply(
                p, zz, force_not_quantize=False, method=VQModel.decode,
                mutable=["intermediates"])[1])(
                self.first_stage_params, z_raw)
        self._fs_params_int8 = quant.quantize_conv_tree(
            self.first_stage_params, fs_calib,
            exclude=("conv_in", "conv_out", "post_quant_conv"))
        z = jnp.asarray(z_raw) * self.config.scale_factor  # model scale
        ctx = self.model.apply(self.params, neighbors,
                               method=_RDM.encode_neighbors)
        if guidance_scale != 1.0:
            uncond = self.model.apply(self.params, ctx.shape[0],
                                      ctx.shape[1], 0.0,
                                      method=_RDM.uncond_context)
            ctx = jnp.concatenate([ctx, uncond], axis=0)
        absmax = quant.ddim_trajectory_absmax(
            lambda p, x, t, c: self.model.apply(
                p, x, t, c, mutable=["intermediates"]),
            self.params, z, self.schedule, steps, ctx, seed=seed)
        return quant.quantize_conv_tree(self.params, absmax)

    def fidelity_run(self, neighbors, *, steps: int = 50,
                     guidance_scale: float = 2.0, seed: int = 0,
                     encoder_reuse: int = 1,
                     int8: bool = False) -> Dict[str, np.ndarray]:
        """One sampling run instrumented for the fidelity harness
        (eval/fidelity.py): returns {"z" final latents, "images" uint8
        pixels, "traj" per-step pred_x0}. All modes consume rng
        identically, so runs with the same seed differ ONLY by the
        serving approximation under test (int8 / encoder-reuse)."""
        neighbors = jnp.asarray(neighbors)
        params = (self.quantized_params(neighbors, steps=steps,
                                        guidance_scale=guidance_scale,
                                        seed=seed)
                  if int8 else self.params)
        key = ("fid", steps, guidance_scale, neighbors.shape[0],
               encoder_reuse)
        run = self._runners.get(key)
        if run is None:
            sampler = DDIMSamplerConfig(num_steps=steps,
                                        guidance_scale=guidance_scale,
                                        cfg_mode="shared", log_every_t=1,
                                        encoder_reuse=encoder_reuse)

            def run(params, nbrs, rng):
                return sample_with_neighbors(
                    self.model, params, nbrs, self.schedule, sampler, rng,
                    guidance_label=0.0, return_intermediates=True)

            run = jax.jit(run)
            self._runners[key] = run
        z, traj = run(params, neighbors, jax.random.PRNGKey(seed))
        fs = (self._fs_params_int8
              if int8 and self._fs_params_int8 is not None
              else self.first_stage_params)
        images = to_uint8(self._decode(fs, z))
        return {"z": np.asarray(z), "images": images,
                "traj": np.asarray(traj)}

    def serving_fs_params(self):
        """First-stage params the decode runs with (int8 decoder when
        int8_weights is on and calibration has run, else bf16)."""
        if self.int8_weights and self._fs_params_int8 is not None:
            return self._fs_params_int8
        return self.first_stage_params

    def _run_ddim(self, neighbors: jnp.ndarray, steps: int,
                  guidance_scale: float, seed: int,
                  encoder_reuse: int = 1) -> np.ndarray:
        run = self._get_ddim_runner(steps, guidance_scale,
                                    neighbors.shape[0], encoder_reuse)
        params = self.serving_params(neighbors, steps=steps,
                                     guidance_scale=guidance_scale,
                                     seed=seed)
        z = run(params, neighbors, jax.random.PRNGKey(seed))
        images = self._decode(self.serving_fs_params(), z)
        return to_uint8(images)


class RARMPipeline:
    """Retrieval-augmented autoregressive sampling (KV-cached)."""

    def __init__(self, config: RARMConfig, params,
                 first_stage_config: AutoencoderConfig, first_stage_params,
                 pool: Optional[DataPool] = None,
                 memory: Optional[NNMemory] = None,
                 clip_params=None, clip_config: Optional[ClipConfig] = None,
                 dtype=jnp.bfloat16, mesh=None):
        self.config = config
        self.model = RARM(config, dtype=dtype)
        self.params = cast_params_for_inference(params, dtype)
        self.first_stage = VQModel(first_stage_config, dtype=dtype)
        self.first_stage_params = cast_params_for_inference(
            first_stage_params, dtype)
        self.retrieval = None
        self.mesh = mesh
        if pool is not None:
            self.retrieval = _Retrieval(
                RetrievalEngine(pool, mesh=mesh), memory)
        self.clip = CLIP(clip_config or ClipConfig.vit_b32(), dtype=dtype) \
            if clip_params is not None else None
        self.clip_params = clip_params
        self._runners: Dict[Any, Any] = {}
        self._decode_code = jax.jit(lambda p, idx: self.first_stage.apply(
            p, idx, method=VQModel.decode_code))

    @classmethod
    def from_model_dir(cls, model_dir: str, *,
                       database: Optional[str] = None,
                       nn_memory: Optional[str] = None,
                       clip_ckpt: Optional[str] = None,
                       random_init: bool = False, seed: int = 0,
                       **kw) -> "RARMPipeline":
        cfg_yaml = load_config([os.path.join(model_dir, "config.yaml")])
        config = model_config_from_yaml(cfg_yaml)
        fs_config = first_stage_config_from_yaml(cfg_yaml)
        npz = os.path.join(model_dir, "params.npz")
        fs_npz = os.path.join(model_dir, "first_stage_params.npz")
        ckpt = os.path.join(model_dir, "model.ckpt")
        if (os.path.isfile(npz) and os.path.isfile(fs_npz)
                and not random_init):
            from rdm_tpu.utils.params_io import load_params_npz
            params = load_params_npz(npz)
            fs_params = load_params_npz(fs_npz)
        elif os.path.isfile(ckpt) and not random_init:
            from rdm_tpu.utils.torch_convert import (
                convert_rarm, load_torch_state_dict)
            sd = load_torch_state_dict(ckpt)
            params, fs_params = convert_rarm(sd, config, fs_config)
        else:
            params, fs_params = cls._random_params(config, fs_config, seed)
        clip_params, clip_config = _load_clip_weights(clip_ckpt)
        pool = DataPool.load(database) if database else None
        memory = NNMemory.load(nn_memory) if nn_memory else None
        return cls(config, params, fs_config, fs_params, pool=pool,
                   memory=memory, clip_params=clip_params,
                   clip_config=clip_config, **kw)

    @staticmethod
    def _random_params(config: RARMConfig, fs_config: AutoencoderConfig,
                       seed: int):
        model = RARM(config)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, config.seq_len, config.context_dim)))
        fs = VQModel(fs_config)
        idx = jnp.zeros((1, config.code_side, config.code_side), jnp.int32)
        fs_params = jax.jit(lambda r: fs.init(
            r, idx, method=VQModel.decode_code))(jax.random.PRNGKey(seed + 1))
        return params, fs_params

    def sample_unconditional(
            self, batch_size: int, *, k_nn: int = 4, top_k: int = 256,
            temperature: float = 1.0, guidance_scale: float = 1.0,
            memsize=100, use_weights: bool = False,
            qids: Optional[np.ndarray] = None, seed: int = 0,
            approx_top_k: bool = False, int8_weights: bool = False,
            int8_kv: bool = False
    ) -> Dict[str, Any]:
        """sample_from_rdata equivalent (transformer.py:296-391)."""
        if self.retrieval is None:
            raise ValueError("unconditional sampling requires a database")
        rng = np.random.default_rng(seed)
        q_emb = self.retrieval.sample_query_embeddings(
            batch_size, memsize, use_weights, rng, qids=qids)
        found = self.retrieval.engine.search(jnp.asarray(q_emb), k=k_nn)
        neighbors = jnp.asarray(found["embeddings"], dtype=jnp.float32)
        return {"samples_with_sampled_nns": self._generate(
            neighbors, top_k, temperature, guidance_scale, seed,
            approx_top_k=approx_top_k, int8_weights=int8_weights,
            int8_kv=int8_kv)}

    def sample_with_query(self, query_embeddings: np.ndarray, *,
                          k_nn: int = 4, top_k: int = 256,
                          temperature: float = 1.0,
                          guidance_scale: float = 1.0,
                          only_query: bool = False,
                          unconditional: bool = False,
                          seed: int = 0,
                          approx_top_k: bool = False,
                          int8_weights: bool = False,
                          int8_kv: bool = False) -> Dict[str, Any]:
        q = np.asarray(query_embeddings, dtype=np.float32)
        if unconditional:
            neighbors = np.zeros_like(q)[:, None]
        elif only_query:
            neighbors = q[:, None]
        else:
            if self.retrieval is None:
                raise ValueError("query sampling with retrieval requires a "
                                 "database (use only_query/unconditional "
                                 "otherwise)")
            found = self.retrieval.engine.search(jnp.asarray(q), k=k_nn)
            r_emb = np.asarray(found["embeddings"], dtype=np.float32)
            neighbors = np.concatenate([q[:, None], r_emb[:, :k_nn - 1]],
                                       axis=1)
        return {"query_samples": self._generate(
            jnp.asarray(neighbors), top_k, temperature, guidance_scale,
            seed, approx_top_k=approx_top_k, int8_weights=int8_weights,
            int8_kv=int8_kv)}

    def embed_caption(self, caption: str, batch_size: int) -> np.ndarray:
        if self.clip is None:
            raise ValueError("caption sampling requires CLIP weights")
        toks = jnp.asarray(tokenize([caption] * batch_size))
        return np.asarray(self.clip.apply(self.clip_params, toks,
                                          method=CLIP.encode_text))

    def _generate(self, neighbors, top_k, temperature, guidance_scale,
                  seed, approx_top_k: bool = False,
                  int8_weights: bool = False,
                  int8_kv: bool = False) -> np.ndarray:
        # cached per static config — see RDMPipeline._run_ddim
        key = ("ar", top_k, temperature, guidance_scale, approx_top_k,
               int8_weights, int8_kv, neighbors.shape[0])
        run = self._runners.get(key)
        if run is None:
            from rdm_tpu.models.rarm import (sample_tokens_fused,
                                             use_fused_decode_default)

            # fused Pallas decode kernels on TPU. Under a DP mesh the
            # kernels run with partition=True: batch-partitioned via
            # custom_partitioning, KV commits forced to caller-side
            # dynamic_update_slice (in-kernel aliased commits don't
            # survive the wrap) — each chip decodes its local batch
            # shard with the full fused speedup
            # (tests/test_partitioning.py: bit-exact vs single-device).
            fused = use_fused_decode_default()
            dp = (self.mesh is not None
                  and self.mesh.shape.get("data", 1) > 1)
            if (int8_weights or int8_kv) and not fused:
                raise ValueError("int8_weights/int8_kv require the fused "
                                 "TPU decode path")
            sampler = sample_tokens_fused if fused else sample_tokens
            extra = {}
            if int8_weights:
                extra["int8_weights"] = True
            if int8_kv:
                extra["int8_kv"] = True
            if fused and dp:
                extra["partition"] = True

            def run(params, nbrs, rng):
                return sampler(
                    self.model, params, nbrs, rng,
                    temperature=temperature, top_k=top_k,
                    guidance_scale=guidance_scale,
                    approx_top_k=approx_top_k, **extra)

            run = _maybe_data_parallel(run, self.mesh, neighbors.shape[0])
            self._runners[key] = run
        tokens = run(self.params, jnp.asarray(neighbors),
                     jax.random.PRNGKey(seed))
        side = self.config.code_side
        grid = tokens.reshape(-1, side, side)
        images = self._decode_code(self.first_stage_params, grid)
        return to_uint8(images)
