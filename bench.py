"""Headline benchmark: end-to-end RDM sampling throughput on one chip.

Measures 256x256 images/sec for the BASELINE.json operating point:
exact kNN retrieval (k=4) over an ImageNet-sized CLIP database (1.28M x 512)
+ DDIM-50 reverse diffusion with CFG (batch doubled through the 395M-param
U-Net, /root/reference equivalent: rdm_sample.py + ddim.py:229-238)
+ VQ-f4 decode to 256x256 RGB.

`vs_baseline` compares against an analytic A100 estimate of the REFERENCE
implementation on the same workload (it publishes no throughput numbers —
BASELINE.md): the reference samples in float32 (released configs never set
use_fp16; rdm_sample.py loads fp32 weights), so its A100 ceiling is the
TF32 tensor-core path: 156 TFLOP/s peak at 25% MFU — the upper end of
measured eager-PyTorch diffusion sampling efficiency (per-step Python
dispatch, unfused attention). Per-image FLOPs come from XLA cost analysis
with the DDIM scan body counted once per step (cost_analysis reports scan
bodies once). North-star: vs_baseline >= 2.0.

Measurement robustness (round 3): the axon TPU tunnel has degraded windows
(BENCH_r02 recorded 2.82 img/s for a machine that does 5.25 — a 1.9x
understatement from ONE noisy capture). Defenses, in order:
  1. device-health probe — an amortized fixed matmul loop whose good-state
     time is a recorded constant; on >1.5x deviation we sleep and retry,
     and mark the capture degraded if health never returns;
  2. >=3 independent timed windows; the reported value is the BEST window
     (the metric is peak device capability, not tunnel luck). A transient
     sag in ONE window retries with extra windows (bounded) and the
     degraded/spread verdict is computed over the best N windows — a
     single tunnel hiccup must not flag an otherwise-healthy peak;
  3. the JSON line self-describes: trials, spread, degraded flag, flops
     source (measured cost-analysis vs recorded constant), compile time;
  4. the pipeline is AOT-lowered from ShapeDtypeStructs and run through
     the compiled executable: tracing a jit CALL with 800+ concrete
     remote arrays costs ~0.75 s of tunnel RPC per leaf (measured 613 s
     round-2 "compile" wall, of which the actual XLA compile was a 14 s
     persistent-cache hit; abstract tracing takes 8 s on this host).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeated bench runs skip the ~minutes-long
# first compile of the 395M-param U-Net pipeline
_cache = os.environ.get("JAX_COMPILE_CACHE_DIR", "/tmp/rdm_tpu_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_last_good.json")

BATCH = int(os.environ.get("BENCH_BATCH", 16))
# "shared" runs the context-independent U-Net prefix once per CFG pair
# (exact same math as the reference's batch doubling — parity-tested;
# measured 5.26 vs 5.10 img/s) and is the RDMPipeline default; "double"
# is the reference-shaped path (ddim.py:229-238).
CFG_MODE = os.environ.get("BENCH_CFG_MODE", "shared")
# >1 measures the APPROXIMATE encoder-reuse serving mode (never the
# headline: the recorded-FLOPs key below stays the exact op point)
ENCODER_REUSE = int(os.environ.get("BENCH_ENCODER_REUSE", 1))
# BENCH_INT8=1 measures the int8 U-Net serving mode (ops/quant.py:
# weight+activation int8 convs, 2x MXU rate on v5e). APPROXIMATE and
# never the headline; the calibration here is a single-forward absmax
# pass (speed is scale-independent — the quality gate lives in
# scripts/quality_eval.py).
INT8 = os.environ.get("BENCH_INT8", "0") == "1"
DDIM_STEPS = 50
K_NN = 4
GUIDANCE = 2.0
DB_ROWS = 1_281_280  # ImageNet database size, 128-aligned
A100_TF32_PEAK = 156e12  # the reference's fp32/TF32 operating point
A100_MFU_EST = 0.25

# --- health probe constants (recorded on this v5e via the axon tunnel) ---
# 40x (4096x4096x4096 bf16 matmul) chained inside one jit fori_loop
# = 5.50 TFLOP; good-state wall time measured 2026-08-17: 0.072 s
# (~76 TFLOP/s effective incl. dispatch). >1.5x that means the
# tunnel/device window is degraded and a throughput capture would
# understate the machine.
PROBE_GOOD_S = float(os.environ.get("BENCH_PROBE_GOOD_S", 0.072))
PROBE_MAX_RATIO = 1.5
PROBE_RETRIES = int(os.environ.get("BENCH_PROBE_RETRIES", 10))
PROBE_RETRY_SLEEP_S = 30.0

# last-measured XLA cost-analysis FLOPs/img keyed by the FULL op point
# (batch, steps, k_nn, guidance, cfg_mode) — fallback for transient remote
# cost-analysis failures; any other op point gets vs_baseline=None instead
# of silently wrong constants (round-2 advisor fix).
RECORDED_FLOPS = {
    (16, 50, 4, 2.0, "shared"): (2.052e13, 2.131e13),
    (16, 50, 4, 2.0, "double"): (2.131e13, 2.131e13),
}


def synth_params(shapes, seed: int = 0):
    """Host-side random param synthesis from an eval_shape tree.

    jit(model.init) of the 395M-param U-Net builds an enormous RNG graph
    that takes minutes to compile; throughput benching only needs params
    with realistic magnitudes, so fill leaves on the host instead.
    """
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(shapes)
    out = []
    for leaf in leaves:
        if leaf.ndim >= 2:
            # uniform f32 is ~20x cheaper to generate than f64 normals on
            # a weak host core; magnitude is all that matters here
            arr = (rng.random(leaf.shape, dtype=np.float32) - 0.5) * 0.05
        else:
            arr = np.zeros(leaf.shape, dtype=np.float32)
        out.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree.unflatten(treedef, out)


def make_health_probe():
    """Amortized fixed-matmul probe; returns a callable -> wall seconds."""
    n = 4096

    @jax.jit
    def probe(a, b):
        def body(_, x):
            return jnp.tanh(a @ x)  # tanh breaks A@A@... simplification

        return jax.lax.fori_loop(0, 40, body, b)

    a = jnp.full((n, n), 0.001, dtype=jnp.bfloat16)
    b = jnp.full((n, n), 0.001, dtype=jnp.bfloat16)
    np.asarray(probe(a, b)[0, 0])  # compile + warm

    def run():
        t0 = time.perf_counter()
        np.asarray(probe(a, b)[0, 0])  # host copy forces a true sync
        return time.perf_counter() - t0

    return run


def wait_for_healthy_device(probe):
    """Probe device health; sleep/retry through degraded windows.

    Returns (healthy: bool, probe_times: list[float])."""
    times = []
    for attempt in range(PROBE_RETRIES):
        t = min(probe(), probe())  # best of 2: single dispatch can hiccup
        times.append(round(t, 4))
        if t <= PROBE_GOOD_S * PROBE_MAX_RATIO:
            return True, times
        print(f"# device degraded: probe {t:.3f}s vs good "
              f"{PROBE_GOOD_S:.3f}s (attempt {attempt + 1}/{PROBE_RETRIES});"
              f" sleeping {PROBE_RETRY_SLEEP_S:.0f}s", flush=True)
        time.sleep(PROBE_RETRY_SLEEP_S)
    return False, times


def main():
    # total-outage gate BEFORE any in-process device op: the axon tunnel
    # can be fully down for hours (observed 3 h 2026-08-17) and a failed
    # in-process backend init is cached by jax — probe in a subprocess
    # and wait, instead of dying with a traceback and recording nothing.
    from rdm_tpu.utils.device_gate import wait_for_backend
    # first wait for a HEALTHY window (tunnel up AND transfers fast —
    # degraded windows wedge long captures for minutes per sync), bounded
    # to half the outage budget; if health never returns but the backend
    # is at least up, proceed anyway and let the in-process probe loop
    # mark the capture degraded.
    budget = float(os.environ.get("BENCH_BACKEND_WAIT_S", 7200))
    gate = wait_for_backend(
        max_wait_s=budget / 2,
        max_op_s=float(os.environ.get("BENCH_MAX_PROBE_OP_S", 2.0)))
    if not gate["ok"]:
        avail = wait_for_backend(max_wait_s=budget / 2)
        avail["waited_s"] = round(avail["waited_s"] + gate["waited_s"], 1)
        avail["attempts"] += gate["attempts"]
        gate = avail
    if not gate["ok"]:
        # attach the most recent NON-degraded capture (written by every
        # successful run below) so an outage at capture time still
        # records what the machine measured last — clearly labeled, the
        # headline value stays null
        last_good = None
        try:
            with open(_LAST_GOOD_PATH) as f:
                last_good = json.load(f)
        except (OSError, ValueError):
            pass
        print(json.dumps({
            "metric": "rdm_ddim50_256px_images_per_sec_per_chip",
            "value": None,
            "unit": "images/sec",
            "vs_baseline": None,
            "degraded": True,
            "error": "tpu backend unavailable",
            "backend_wait_s": gate["waited_s"],
            "backend_attempts": gate["attempts"],
            "last_good": last_good,
        }))
        return
    if gate["attempts"] > 1:
        print(f"# backend recovered after {gate['waited_s']}s "
              f"({gate['attempts']} probes)", flush=True)

    from rdm_tpu.models.autoencoder import AutoencoderConfig, VQModel
    from rdm_tpu.models.rdm import RDM, RDMConfig, sample_with_neighbors
    from rdm_tpu.ops.schedules import DiffusionSchedule
    from rdm_tpu.sampling import DDIMSamplerConfig

    cfg = RDMConfig.imagenet()
    model = RDM(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    x0 = jnp.zeros((BATCH, cfg.image_size, cfg.image_size, cfg.channels))
    t0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    c0 = jnp.zeros((BATCH, K_NN, cfg.context_dim))
    print("synthesizing params...", flush=True)
    params = synth_params(
        jax.eval_shape(model.init, rng, x0, t0, c0), seed=0)
    print("unet params ready", flush=True)

    vq_cfg = AutoencoderConfig.vq_f4()
    vq = VQModel(vq_cfg, dtype=jnp.bfloat16)
    z0 = jnp.zeros((BATCH, 64, 64, 3))
    vq_params = synth_params(
        jax.eval_shape(
            lambda r: vq.init(r, z0, force_not_quantize=False,
                              method=VQModel.decode),
            jax.random.PRNGKey(1)),
        seed=1)

    schedule = DiffusionSchedule.create(
        cfg.timesteps, cfg.beta_schedule, cfg.linear_start, cfg.linear_end)
    sampler = DDIMSamplerConfig(num_steps=DDIM_STEPS,
                                guidance_scale=GUIDANCE,
                                cfg_mode=CFG_MODE,
                                encoder_reuse=ENCODER_REUSE)

    # synthetic CLIP database generated ON DEVICE (host RNG for 656M values
    # takes minutes on a weak core; compute cost is identical either way)
    print("building device-side database...", flush=True)
    from rdm_tpu.retrieval.engine import knn_search, l2_normalize

    @jax.jit
    def make_db(key):
        db = jax.random.normal(key, (DB_ROWS, 512), dtype=jnp.bfloat16)
        return l2_normalize(db.astype(jnp.float32)).astype(jnp.bfloat16)

    db_norm = make_db(jax.random.PRNGKey(7))
    jax.block_until_ready(db_norm)
    print("database ready", flush=True)

    @jax.jit
    def pipeline(params, vq_params, db_norm, query_emb, rng):
        # db_norm MUST be an argument: a closed-over 1.3 GB array would be
        # baked into the HLO as a constant and choke compilation
        q = l2_normalize(query_emb)
        _, nns = knn_search(db_norm, q, K_NN)
        neighbors = jnp.take(db_norm, nns, axis=0).astype(jnp.float32)
        z = sample_with_neighbors(model, params, neighbors, schedule,
                                  sampler, rng)
        img = vq.apply(vq_params, z, force_not_quantize=False,
                       method=VQModel.decode)
        return img

    q = db_norm[:BATCH].astype(jnp.float32)

    # pre-cast weights to bf16 once — otherwise XLA re-reads the fp32
    # weight set from HBM on every scan step just to cast it
    from rdm_tpu.pipeline import cast_params_for_inference
    params = cast_params_for_inference(params)
    vq_params = cast_params_for_inference(vq_params)

    if INT8:
        # quantize the U-Net convs through the production code path; a
        # single forward collects the act absmax (throughput does not
        # depend on scale values, only on the int8 program structure)
        from rdm_tpu.ops import quant
        print("quantizing unet convs to int8...", flush=True)
        kx = jax.random.PRNGKey(11)
        x_c = jax.random.normal(kx, x0.shape, jnp.float32)
        t_c = jnp.full((BATCH,), 500, jnp.int32)
        ctx_b = 2 * BATCH if (GUIDANCE != 1.0 and CFG_MODE == "shared") \
            else BATCH
        c_c = jax.random.normal(jax.random.PRNGKey(12),
                                (ctx_b, K_NN, cfg.context_dim),
                                jnp.float32)
        with quant.calibrate():
            calib = jax.jit(lambda p, x, t, c: model.apply(
                p, x, t, c, mutable=["intermediates"])[1])(
                params, x_c, t_c, c_c)
        params = quant.quantize_conv_tree(params, calib)
        # VQ decoder convs too (int8 phase 3): calibrated on a latent
        # batch through the production decode path
        with quant.calibrate():
            fs_calib = jax.jit(lambda p, zz: vq.apply(
                p, zz, force_not_quantize=False, method=VQModel.decode,
                mutable=["intermediates"])[1])(
                vq_params, jax.random.normal(jax.random.PRNGKey(13),
                                             z0.shape, jnp.float32))
        vq_params = quant.quantize_conv_tree(
            vq_params, fs_calib,
            exclude=("conv_in", "conv_out", "post_quant_conv"))
        print(f"# int8 conv kernels: {quant.num_quantized(params)} unet "
              f"+ {quant.num_quantized(vq_params)} vq-decoder",
              flush=True)

    # device health gate BEFORE the expensive compile: a degraded tunnel
    # window both lengthens the compile and poisons the capture
    print("probing device health...", flush=True)
    probe = make_health_probe()
    healthy, probe_times = wait_for_healthy_device(probe)
    print(f"# health probe: {probe_times} (good={PROBE_GOOD_S}s, "
          f"healthy={healthy})", flush=True)

    # BENCH_LATENCY=1: interactive-serving latency op point (VERDICT r4
    # #6) — end-to-end DDIM-50 wall latency at bs=1 and bs=4, forced
    # sync per run, with the ~28 ms tunnel dispatch overhead measured
    # and reported separately (CLAUDE.md tunnel-timing note: it is a
    # fixed axon RPC cost, not device time). Opt-in; never the headline.
    if os.environ.get("BENCH_LATENCY", "0") == "1":
        @jax.jit
        def _tiny(a):
            return a + 1.0

        _t = jnp.zeros((8, 128), jnp.bfloat16)
        np.asarray(_tiny(_t))  # compile
        disp = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(_tiny(_t))
            disp.append(time.perf_counter() - t0)
        dispatch_ms = round(float(np.median(disp)) * 1e3, 2)

        from rdm_tpu.utils.aot import abstract
        per_bs = {}
        for b in (1, 4):
            qb = db_norm[:b].astype(jnp.float32)
            keyb = jax.random.PRNGKey(2)
            print(f"compiling latency pipeline bs={b}...", flush=True)
            exe = pipeline.lower(
                abstract(params), abstract(vq_params), abstract(db_norm),
                abstract(qb), abstract(keyb)).compile()
            np.asarray(exe(params, vq_params, db_norm, qb, keyb)[0, 0, 0])
            lats = []
            for i in range(15):
                kb = jax.random.PRNGKey(100 + i)
                t0 = time.perf_counter()
                np.asarray(exe(params, vq_params, db_norm, qb, kb)
                           [0, 0, 0])
                lats.append((time.perf_counter() - t0) * 1e3)
            lats = sorted(lats)
            per_bs[b] = {
                "median_ms": round(float(np.median(lats)), 1),
                "best_ms": round(lats[0], 1),
                "net_of_dispatch_ms": round(
                    float(np.median(lats)) - dispatch_ms, 1),
            }
            print(f"# bs={b}: {per_bs[b]}", flush=True)
        print(json.dumps({
            "metric": "rdm_ddim50_256px_latency_ms",
            "value": per_bs[1]["median_ms"],
            "unit": "ms (bs=1 end-to-end, forced sync)",
            "dispatch_overhead_ms": dispatch_ms,
            "bs1": per_bs[1], "bs4": per_bs[4],
            "steps": DDIM_STEPS, "guidance": GUIDANCE,
            "cfg_mode": CFG_MODE,
            "healthy": healthy,
        }))
        return

    # AOT lower from abstract shapes (8 s host-side) + compile (persistent
    # cache hit ~15 s), then warm the compiled executable once
    _c0 = time.perf_counter()
    print("compiling pipeline...", flush=True)

    from rdm_tpu.utils.aot import abstract

    key0 = jax.random.PRNGKey(2)
    pipeline_exe = pipeline.lower(
        abstract(params), abstract(vq_params), abstract(db_norm),
        abstract(q), abstract(key0)).compile()
    img = pipeline_exe(params, vq_params, db_norm, q, key0)
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - _c0
    print(f"compile+warmup done in {compile_s:.1f}s", flush=True)

    # BENCH_DUMP_HLO=<path>: write the compiled (post-optimization) HLO of
    # the exact headline executable so trace fusion ids (fusion.NNN) can be
    # mapped back to source ops when profiling.
    hlo_path = os.environ.get("BENCH_DUMP_HLO")
    if hlo_path:
        # never let a bad dump path kill the capture after the compile —
        # the one-JSON-line contract outranks the debug artifact
        try:
            with open(hlo_path, "w") as f:
                f.write(pipeline_exe.as_text())
            print(f"# compiled HLO -> {hlo_path}", flush=True)
        except OSError as e:
            print(f"# BENCH_DUMP_HLO write failed ({e}); continuing",
                  flush=True)

    # BENCH_PROFILE_DIR: trace ONE warm pipeline run and print the per-op
    # device-time breakdown (utils.profiling.trace_op_breakdown). Runs on
    # the exact headline path — standalone forward-only profile scripts
    # have wedged through the tunnel where this pipeline runs fine.
    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            img = pipeline_exe(params, vq_params, db_norm, q, key0)
            np.asarray(img[0, 0, 0])
        from rdm_tpu.utils.profiling import trace_op_breakdown
        res = trace_op_breakdown(profile_dir, top=30)
        print(f"# trace total_ms={res['total_ms']} -> {profile_dir}",
              flush=True)

    # >=3 independent timed windows; report the BEST (peak capability).
    # a tiny device->host copy per run forces a true sync
    # (block_until_ready has been observed to return early through the
    # remote-dispatch tunnel)
    windows = int(os.environ.get("BENCH_WINDOWS", 3))
    max_extra = int(os.environ.get("BENCH_EXTRA_WINDOWS", 3))
    runs = 3
    trials = []
    keys = [jax.random.PRNGKey(3 + j)
            for j in range((windows + max_extra) * runs)]

    def time_window(w):
        start = time.perf_counter()
        for i in range(runs):
            img = pipeline_exe(params, vq_params, db_norm, q,
                               keys[w * runs + i])
            np.asarray(img[0, 0, 0])
        elapsed = time.perf_counter() - start
        trials.append(round(BATCH * runs / elapsed, 4))
        print(f"# window {w + 1}: {trials[-1]} img/s", flush=True)

    def best_n_spread():
        # spread over the best `windows` trials: the reported value is the
        # BEST window, so its error bar is the stability of the top
        # windows, not the depth of a transient tunnel sag. With
        # BENCH_WINDOWS=1 a single-trial spread would always be 0 (and
        # disable the retry + degraded verdict), so use the top 2.
        top = sorted(trials, reverse=True)[:max(windows, 2)]
        return round((max(top) - min(top)) / max(top), 4)

    def full_spread():
        # full-range spread over ALL trials: self-describes total capture
        # variance (best-N spread alone understates it by construction)
        return round((max(trials) - min(trials)) / max(trials), 4)

    for w in range(windows):
        time_window(w)
        # between-window health re-probe: if the device sagged mid-capture,
        # give it a chance to recover before the next window
        if w + 1 < windows and probe() > PROBE_GOOD_S * PROBE_MAX_RATIO:
            ok, extra = wait_for_healthy_device(probe)
            probe_times += extra
            healthy = healthy and ok
    # transient-sag retry: one slow window must not poison the capture
    # (observed: window 1 at 3.28 img/s, windows 2-3 at 6.26 — a tunnel
    # hiccup, not the machine). Time extra windows until the best-N are
    # stable or the budget runs out; ALL trials stay in the JSON.
    extra_used = 0
    while best_n_spread() > 0.25 and extra_used < max_extra:
        print(f"# spread {best_n_spread()} > 0.25; timing extra window",
              flush=True)
        # same recovery step as the main window loop: without it the extra
        # windows fire back-to-back into a still-degraded tunnel window and
        # burn the retry budget with no chance to recover (advisor fix)
        if probe() > PROBE_GOOD_S * PROBE_MAX_RATIO:
            ok, extra_probes = wait_for_healthy_device(probe)
            probe_times += extra_probes
            healthy = healthy and ok
        time_window(windows + extra_used)
        extra_used += 1
    imgs_per_sec = max(trials)
    spread = best_n_spread()
    degraded = (not healthy) or spread > 0.25

    # analytic A100 estimate over identical FLOPs. XLA cost analysis counts
    # a lax.scan body ONCE, so measure the denoiser separately and scale by
    # steps (CFG batch doubling is inside the measured forward).
    def cost_analysis_flops():
        def unet_flops_at(x_batch, ctx_batch):
            xc = jax.ShapeDtypeStruct(
                (x_batch, cfg.image_size, cfg.image_size, cfg.channels),
                jnp.float32)
            tc = jax.ShapeDtypeStruct((x_batch,), jnp.int32)
            cc = jax.ShapeDtypeStruct(
                (ctx_batch, K_NN * 1, cfg.context_dim), jnp.float32)
            comp = jax.jit(
                lambda p, x, t, c: model.apply(p, x, t, c)).lower(
                abstract(params), xc, tc, cc).compile()
            return comp.cost_analysis()["flops"]

        cfg_batch = 2 * BATCH if GUIDANCE != 1.0 else BATCH
        # the reference's workload (full batch doubling) anchors the A100
        # estimate regardless of our cfg_mode
        unet_flops_ref = unet_flops_at(cfg_batch, cfg_batch)
        unet_flops_actual = (
            unet_flops_at(BATCH, cfg_batch)
            if (GUIDANCE != 1.0 and CFG_MODE == "shared")
            else unet_flops_ref)
        rest_flops = pipeline_exe.cost_analysis()["flops"]  # knn+decode+1 body
        flops_img = (DDIM_STEPS * unet_flops_actual + rest_flops) / BATCH
        ref_flops_img = (DDIM_STEPS * unet_flops_ref + rest_flops) / BATCH
        return flops_img, ref_flops_img

    flops_per_img = ref_flops_per_img = None
    flops_source = "measured"
    for attempt in range(3):  # remote compile can transiently drop
        try:
            flops_per_img, ref_flops_per_img = cost_analysis_flops()
            break
        except Exception as e:
            print(f"# cost analysis attempt {attempt + 1} failed: {e}",
                  flush=True)
    op_point = (BATCH, DDIM_STEPS, K_NN, GUIDANCE, CFG_MODE)
    if ENCODER_REUSE != 1 or INT8:
        op_point = None  # recorded constants are for the exact op point
    if flops_per_img is None and op_point in RECORDED_FLOPS:
        # recorded constants keyed on the FULL op point so a non-default
        # configuration can never silently reuse them (advisor fix)
        flops_per_img, ref_flops_per_img = RECORDED_FLOPS[op_point]
        flops_source = "recorded"
        print("# cost analysis unavailable; using recorded constants",
              flush=True)
    if flops_per_img is not None:
        a100_imgs_per_sec = (A100_TF32_PEAK * A100_MFU_EST) / ref_flops_per_img
        vs_baseline = imgs_per_sec / a100_imgs_per_sec
        mfu = imgs_per_sec * flops_per_img / 197e12  # v5e bf16 peak
        print(f"# flops/img={flops_per_img:.3e} v5e_mfu={mfu:.2%} "
              f"a100_est={a100_imgs_per_sec:.2f} img/s "
              f"cfg_mode={CFG_MODE}", flush=True)
    else:
        vs_baseline = float("nan")
        flops_source = "unavailable"

    line = {
        "metric": "rdm_ddim50_256px_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 4)
        if np.isfinite(vs_baseline) else None,
        "trials": trials,
        "spread": spread,
        "spread_all": full_spread(),
        "degraded": degraded,
        "flops_source": flops_source,
        "compile_s": round(compile_s, 1),
    }
    if ENCODER_REUSE != 1:
        line["encoder_reuse"] = ENCODER_REUSE
    if INT8:
        line["int8"] = True
    print(json.dumps(line))
    if not degraded and ENCODER_REUSE == 1 and not INT8:
        try:
            with open(_LAST_GOOD_PATH, "w") as f:
                json.dump({**line, "measured_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
        except OSError:
            pass


if __name__ == "__main__":
    main()
