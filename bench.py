"""Benchmark: single-chip amodal-depth pipeline throughput at ~1024 px.

Measures the BASELINE.json north-star metric — end-to-end amodal-depth
images/sec/chip (frozen ViT-G base-depth forward + guided ViT-L amodal
forward + fused preprocessing/blend, all one XLA program) at 1022 px
(73x73 patch grid; 1024 is not a multiple of patch 14), bf16 activations,
Pallas flash attention on TPU.

`vs_baseline` compares against an engineering estimate of the PyTorch
reference on A100: ~27-30 TFLOP per image (ViT-G trunk ~18, ViT-L ~6,
DPT heads ~4) at fp16/xformers with ~40% utilization of 312 TFLOP/s
=> ~4.3 images/sec. The reference publishes no numbers (BASELINE.md), so
this anchor is documented here rather than measured.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

_BENCH_T0 = time.perf_counter()  # process-start anchor for first-pixel
# wall measurements (heuristics demo usability)

# Single-core CPU runs (no TPU): avoid XLA:CPU parallel-codegen stalls.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "parallel_codegen" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_parallel_codegen_split_count=1").strip()

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon TPU plugin ignores JAX_PLATFORMS; force it (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

# The axon TPU tunnel can wedge for hours (CLAUDE.md): a hung backend
# init would stall the caller forever, and signal-based deadlines can't
# interrupt a blocking C call. Probe the device in a SUBPROCESS under a
# hard per-attempt timeout — and keep probing inside a WINDOW rather
# than fail-fast. Round 4's bench of record hit a tunnel outage that a
# later re-probe would have ridden out, and the single-probe abort
# turned a recoverable outage into a permanently empty round
# (BENCH_r04.json rc=1). A late number beats no number, so the probe
# now retries every ~3 min (the runbook_lib.sh pattern) until
# AMODAL_BENCH_PROBE_WINDOW (default 2700 s) elapses, then aborts with
# nonzero exit and NO JSON line (a zero-value line would be recorded as
# a real measurement). Skipped on forced-CPU runs.
#   AMODAL_BENCH_NO_PROBE=1        disable entirely
#   AMODAL_BENCH_PROBE_TIMEOUT     per-attempt deadline, default 420 s
#     (the tunnel has measured 95 s first-op roundtrips while
#     UP-but-degraded, so short attempts misread degraded-up as down)
#   AMODAL_BENCH_PROBE_WINDOW      total wall budget, default 2700 s
#   AMODAL_BENCH_PROBE_FORCE_FAIL_S  rehearsal-only: treat every attempt
#     inside the first N s of process wall as a failed probe, to
#     demonstrate recovery through a forced-late probe without needing
#     a real outage (runbook evidence for the probe-window design).
if (os.environ.get("JAX_PLATFORMS", "") != "cpu"
        and os.environ.get("AMODAL_BENCH_NO_PROBE", "") != "1"):
    import subprocess
    import sys
    _attempt_s = float(os.environ.get("AMODAL_BENCH_PROBE_TIMEOUT", "420"))
    _window_s = float(os.environ.get("AMODAL_BENCH_PROBE_WINDOW", "2700"))
    _force_fail_s = float(
        os.environ.get("AMODAL_BENCH_PROBE_FORCE_FAIL_S", "0"))
    _deadline = _BENCH_T0 + _window_s
    _attempt = 0
    while True:
        _attempt += 1
        _remaining = _deadline - time.perf_counter()
        if _remaining <= 0:
            raise SystemExit(
                f"bench: TPU probe window ({_window_s:.0f} s) exhausted "
                f"after {_attempt - 1} attempts (tunnel down?) — "
                "aborting without a number")
        if time.perf_counter() - _BENCH_T0 < _force_fail_s:
            print(f"bench: probe attempt {_attempt} FORCED-FAIL "
                  "(rehearsal), retrying in 30 s", file=sys.stderr,
                  flush=True)
            time.sleep(min(30.0, max(_remaining, 0.0)))
            continue
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.sum(jnp.ones((8,)))))"],
                timeout=min(_attempt_s, _remaining), check=True,
                capture_output=True)
            break
        except subprocess.TimeoutExpired:
            # the attempt itself consumed its slice of the window; go
            # straight to the next one (measured outages end — the
            # window, not the attempt, is the abort authority)
            print(f"bench: probe attempt {_attempt} timed out "
                  f"({_attempt_s:.0f} s), re-probing", file=sys.stderr,
                  flush=True)
        except subprocess.CalledProcessError as e:
            # transient UNAVAILABLE from backend init (CLAUDE.md): quick
            # failure — wait the runbook cadence before the next attempt
            print(f"bench: probe attempt {_attempt} failed: "
                  + e.stderr.decode(errors="replace")[-200:].strip()
                  + " — retrying in 180 s", file=sys.stderr, flush=True)
            time.sleep(min(180.0, max(_deadline - time.perf_counter(),
                                      0.0)))

# Persistent compile cache for TPU runs — ON by default (disable with
# AMODAL_TPU_CACHE=0). Unlike the XLA:CPU cache (AOT host-feature-
# fragile across driver hosts — see __graft_entry__), TPU executables
# key on the TPU target, so same-box re-runs hit. Two reasons it is now
# default rather than opt-in (round-4 VERDICT item 1): (a) the calib
# chain's ~2 extra large jit programs compile once per box instead of
# once per process (~65 min cold -> minutes warm, runbook v7); (b) the
# bench of record must produce a number even after riding out a tunnel
# outage inside the probe window — with the exact path pre-seeded
# (runbook v22), time-to-number after recovery is minutes, not a cold
# ~30-min compile.
if (os.environ.get("AMODAL_TPU_CACHE", "1") != "0"
        and os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchmarks", ".jax_cache_tpu"))
    # 2 s (not the 10 s default): the warm-start breakdown shows param-
    # INIT programs (many, individually small-ish) dominate first-pixel
    # wall — persist them too, not just the big forward programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

A100_PYTORCH_EST_IMG_PER_SEC = 4.3
# DepthFM anchor: SD-1.5-size UNet x4 steps + VAE encode/decode at 512px
# on A100 fp16/diffusers runs ~3 img/s (UNet ~40-65 ms/step + VAE); the
# reference's torchdiffeq Euler path is the same compute.
A100_DEPTHFM_EST_IMG_PER_SEC = 3.0


def _amortized_p50_ms(run, sync, n=20, repeats=3):
    """Tunnel-robust single-image latency.

    Round 2 regression post-mortem (VERDICT r2): timing each batch-1 call
    individually pays a full tunnel-roundtrip scalar sync per sample; on a
    degraded tunnel the sync dominates and the recorded p50 tripled (1263
    vs 370 ms for identical code). Instead: dispatch n calls back-to-back
    (async dispatch queues them; the single device executes serially), sync
    once, subtract one measured sync roundtrip, and divide. Repeat and take
    the median, so one tunnel hiccup can't own the headline.
    """
    out = run()
    sync(out)  # warm
    # sync roundtrip on an already-materialized array: tiny reduce + fetch
    rts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(out)
        rts.append(time.perf_counter() - t0)
    roundtrip = sorted(rts)[1]
    per_call = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        sync(out)
        total = time.perf_counter() - t0
        per_call.append(max(total - roundtrip, 0.0) / n)
    return sorted(per_call)[len(per_call) // 2] * 1e3


def _resolve_proxy_ckpt(quality_on: bool, marker: str) -> str:
    """Which proxy checkpoint dir a quality run should use.

    Explicit AMODAL_PROXY_CKPT wins ("random" -> "" = the legacy
    jittered seeded-random proxy). Otherwise quality runs DEFAULT to the
    in-repo trained proxy (checkpoints/proxy) when it holds `marker`
    (meta.json / depthfm_meta.json / p2g_meta.json per family) — round-4
    VERDICT item 4: the random proxy is a known-misleading artifact and
    must not be what a no-env-var gate row silently measures."""
    env = os.environ.get("AMODAL_PROXY_CKPT", "")
    if env == "random":
        return ""
    if env:
        return env
    if not quality_on:
        return ""
    default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "checkpoints", "proxy")
    return default if os.path.exists(os.path.join(default, marker)) else ""


def _jitter_tree(p, *, seed=99, scale=0.02):
    """Jitter every leaf: zero_module parity zeroes the UNet output convs
    at init, which makes optimized-vs-exact quality deltas vacuous on
    random weights — both quality proxies (DepthFM, heuristics) share
    this one policy so their deltas stay comparable."""
    leaves, treedef = jax.tree.flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    # float leaves only: trees restored from a post-quantization serving
    # checkpoint carry int8 kernels + scale leaves; jittering those would
    # crash (random.normal rejects int dtypes) or corrupt the scales
    return jax.tree.unflatten(treedef, [
        a + scale * jax.random.normal(k, a.shape, a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a
        for a, k in zip(leaves, keys)])


def bench_depthfm():
    """AMODAL_BENCH_DEPTHFM=1: 4-step DepthFMAmodal eval (reference
    dfm.py:38-57 path). Round-1 could not compile this through the axon
    tunnel (a bf16 batched VAE-attention lowering the backend turned
    into a Mosaic-rejected matmul — fixed by f32 VAE attention, see
    models/vae.py::_attn); round 2 measures it: v5e single chip, 512px,
    bf16 — b1 p50 126 ms (7.9 img/s/chip), b8 610 ms/batch
    (13.1 img/s/chip)."""
    import time

    from amodal_depth_anything_tpu.models import get_model

    on_tpu = jax.devices()[0].platform == "tpu"
    size = 512 if on_tpu else 64
    batch = int(os.environ.get("AMODAL_BENCH_BATCH", 8 if on_tpu else 1))
    iters = 5 if on_tpu else 2

    quality_on = os.environ.get("AMODAL_QUALITY", "") == "1"
    # trained DepthFM proxy (scripts/train_proxy.py --family depthfm):
    # real SD topology at narrow width, trained on the scenes task —
    # default quality evidence since r5 (round-4 VERDICT items 2+4);
    # evaluated at the REAL serving latent grid (512px -> 64x64).
    # AMODAL_PROXY_CKPT=random restores the jittered-random proxy.
    proxy_dir = _resolve_proxy_ckpt(quality_on, "depthfm_meta.json")
    proxy_tag = ""
    if proxy_dir and os.path.exists(os.path.join(proxy_dir,
                                                 "depthfm.npz")):
        import json as _json

        from amodal_depth_anything_tpu.scripts.train_proxy import \
            load_params_npz
        with open(os.path.join(proxy_dir, "depthfm_meta.json")) as _f:
            _meta = _json.load(_f)
        over = dict(_meta["overrides"])
        over["vae_channels"] = tuple(over["vae_channels"])
        over["channel_mult"] = tuple(over.get("channel_mult", (1, 2, 4, 4)))
        model = get_model("DepthFMAmodal", cfg_overrides=over)
        params = jax.tree.map(jnp.asarray, load_params_npz(
            os.path.join(proxy_dir, "depthfm.npz")))
        proxy_tag = " proxy=trained"
    else:
        model = get_model("DepthFMAmodal", tiny=not on_tpu)
        params = model.init(jax.random.PRNGKey(0))
        if quality_on:
            params = dict(params)
            params["unet"] = jax.jit(_jitter_tree)(params["unet"])
            proxy_tag = " proxy=random"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    quant_tag = ""
    params_exact = None
    int8_env = os.environ.get("AMODAL_INT8_DEPTHFM", "")
    if int8_env:
        # int8 over the UNet+VAE (wide convs/linears only; output convs
        # stay high precision). Opt-in, parity-breaking — same policy as
        # the trunk int8 ladder. "1" = dynamic per-call activation
        # scales; "calib" = static scales promoted from one calibration
        # trace (removes the amax serialization that hurts b1 latency);
        # "wo" = weight-only int8 (no activation quant at all — halves
        # param HBM bytes, the small-batch/param-read lever).
        from amodal_depth_anything_tpu.ops.quant import \
            quantize_diffusion_int8
        # jit the tree walk: eagerly it is several hundred one-at-a-time
        # op dispatches (~0.8 s/op through the tunnel)
        params_exact = params if quality_on else None
        # wide-site thresholds scale with model width so the NARROW
        # trained proxy quantizes the same sites (proportionally) as the
        # full SD body — otherwise the proxy's int8 verdict is vacuous
        # (most of its convs/linears sit under the full-size thresholds)
        _ws = model.config.model_channels / 320.0
        params = jax.jit(lambda t: quantize_diffusion_int8(
            t, weight_only=(int8_env in ("wo", "w4")),
            bits=4 if int8_env == "w4" else 8,
            min_conv_fan=max(64, int(512 * _ws)),
            min_lin_dim=max(32, int(256 * _ws))))(params)
        quant_tag = (" int8=" + ("w4" if int8_env == "w4" else
                                 "wo" if int8_env == "wo" else "w8a8"))

    ims = jax.random.uniform(jax.random.PRNGKey(7), (batch, size, size, 3),
                             dtype, -1.0, 1.0)
    mask = jnp.ones((batch, size, size, 1), dtype)
    obs = jnp.zeros((batch, size, size, 1), dtype)

    tome = None
    tome_env = os.environ.get("AMODAL_TOME_DEPTHFM", "")
    if tome_env:
        # "ratio" or "ratio,min_tokens" — ToMe-SD merging in the UNet's
        # spatial-transformer blocks (opt-in, parity-breaking; quality
        # unvalidated against real checkpoints — same ladder policy as the
        # trunk ToMe knobs)
        parts = tome_env.split(",")
        tome = (float(parts[0]),
                int(parts[1]) if len(parts) > 1 else 4096)
        quant_tag += f" tome={parts[0]}"

    deep_cache = None
    dc_env = os.environ.get("AMODAL_DEEPCACHE_DEPTHFM", "")
    if dc_env:
        # "interval" or "interval,groups" — DeepCache Euler-step caching:
        # every interval-th step runs the full UNet, the rest only the
        # `groups` shallowest input/output groups with the cached deep
        # feature spliced in (opt-in, parity-breaking; same ladder policy
        # as int8/ToMe). Default groups=3 = the whole highest-res level.
        from amodal_depth_anything_tpu.ops.ddim import parse_deep_cache
        deep_cache = parse_deep_cache(dc_env)
        quant_tag += f" deepcache={dc_env}"

    # AMODAL_DEPTHFM_ATTN=xla|pallas: A/B the UNet attention impl (the
    # SD-1.5 heads have dim 40/80/160 — the Pallas kernel pads head dim
    # to 128-lane tiles, XLA may win at the shallow dims)
    attn_impl = os.environ.get("AMODAL_DEPTHFM_ATTN") or None
    if attn_impl:
        quant_tag += f" attn={attn_impl}"

    if int8_env == "calib":
        # static-scale promotion: one unrolled calibration trace on the
        # bench inputs (ops/quant.py::calibrate_diffusion_scales)
        from amodal_depth_anything_tpu.models.depthfm import (
            _conditioning, _guide_latents, q_sample)
        from amodal_depth_anything_tpu.models.unet_ldm import apply_unet
        from amodal_depth_anything_tpu.models.vae import (vae_decode,
                                                          vae_encode_mode)
        from amodal_depth_anything_tpu.ops.quant import \
            calibrate_diffusion_scales
        cfg = model.config

        def _calib_run(qp, rgb, m, o):
            lat = vae_encode_mode(qp["vae"], rgb, cfg.vae)
            cond = _guide_latents(qp, cfg, lat, None, m, o)
            ca = _conditioning(qp, rgb.shape[0], rgb.dtype)
            noise = jax.random.normal(jax.random.PRNGKey(1), lat.shape,
                                      lat.dtype)
            z = q_sample(lat, cfg.noising_step, noise,
                         cfg.n_diffusion_timesteps)
            for i in range(4):
                t = jnp.full((rgb.shape[0],), i / 4.0, rgb.dtype)
                v = apply_unet(qp["unet"], cfg.unet, z, t, context=cond,
                               context_ca=ca, attn_impl=attn_impl)
                z = z + 0.25 * v
            vae_decode(qp["vae"], z, cfg.vae)

        params = calibrate_diffusion_scales(params, _calib_run, ims,
                                            mask, obs)
        quant_tag = quant_tag.replace(" int8", " int8-calib")

    def run(p, b_ims, b_mask, b_obs, t=-1):
        # t=None = the exact path (quality comparisons): no tome AND no
        # deep-cache
        return model.apply(p, b_ims, rng=jax.random.PRNGKey(1),
                           mode="eval", num_steps=4, guide_mask=b_mask,
                           observation=b_obs, tome=tome if t == -1 else t,
                           deep_cache=deep_cache if t == -1 else None,
                           attn_impl=attn_impl)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    quality = None
    if quality_on and quant_tag:
        # same ladder policy as the amodal pipeline: no optimized number
        # without its accuracy cost next to it (exact = no int8, no tome)
        import numpy as np
        exact = np.asarray(run(params_exact if params_exact is not None
                               else params, ims, mask, obs, t=None),
                           np.float32)
        optim = np.asarray(run(params, ims, mask, obs), np.float32)
        d = np.abs(exact - optim)
        quality = {"depth_max_abs": round(float(d.max()), 6),
                   "depth_mean_abs": round(float(d.mean()), 6)}

    sync(run(params, ims, mask, obs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run(params, ims, mask, obs)
    sync(out)
    dt = time.perf_counter() - t0
    img_per_sec = batch * iters / dt

    i1, m1, o1 = ims[:1], mask[:1], obs[:1]
    p50_ms = _amortized_p50_ms(lambda: run(params, i1, m1, o1), sync,
                               n=20 if on_tpu else 2)

    line = {
        "metric": f"depthfm-amodal images/sec/chip @ {size}px (4-step "
                  f"Euler eval, bf16{quant_tag}{proxy_tag}, batch {batch}; "
                  f"p50 single-image {p50_ms:.0f} ms)",
        "value": round(img_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec * 8 / A100_DEPTHFM_EST_IMG_PER_SEC,
                             3),
    }
    if quality is not None:
        from amodal_depth_anything_tpu.pipeline.quality import check_gate
        line["quality_delta"] = quality
        line["quality_gate"] = check_gate(quality)
        line["quality_proxy"] = proxy_tag.split("=")[-1] or "random"
    print(json.dumps(line))


def bench_heuristics():
    """AMODAL_BENCH_HEURISTICS=1: the demo's model-heuristics hot path
    (reference app.py:127-229) — SAM point-prompted visible mask +
    pix2gestalt 100-step DDIM completion — on real hardware with random
    full-size weights. Reports completions/sec (the DDIM loop dominates;
    SAM is one forward)."""
    import time

    import numpy as np

    from amodal_depth_anything_tpu.heuristics.mask_heuristics import \
        MaskHeuristics

    on_tpu = jax.devices()[0].platform == "tpu"
    ddim_steps = int(os.environ.get("AMODAL_BENCH_DDIM", 100 if on_tpu
                                    else 2))
    # startup breakdown for the warm-start hunt (VERDICT r3 #5): where
    # the first-pixel wall goes — import/backend, param init, the two
    # compiles, the first completion
    import_s = round(time.perf_counter() - _BENCH_T0, 1)
    _t = time.perf_counter()
    # AMODAL_HEUR_SERVING=dir: restore the ready-to-serve stack from a
    # serving checkpoint (no init programs — the 140 s warm-start floor);
    # when the dir does not exist yet, init_random then SEED it so the
    # next run warm-loads
    serving_dir = os.environ.get("AMODAL_HEUR_SERVING", "")
    serving_seed_s = None
    if serving_dir and os.path.exists(
            os.path.join(serving_dir, "serving_meta.json")):
        mh = MaskHeuristics.load_serving(serving_dir)
        init_mode = "load_serving"
        init_s = round(time.perf_counter() - _t, 1)
    else:
        mh = MaskHeuristics.init_random(jax.random.PRNGKey(0),
                                        tiny=not on_tpu)
        init_mode = "init_random"
        init_s = round(time.perf_counter() - _t, 1)
        # (the serving-seed save happens AFTER the knob section below,
        # so the checkpoint captures the fully transformed stack —
        # bf16 cast + int8 weights; a restore then needs zero re-work)
    quality_on = os.environ.get("AMODAL_QUALITY", "") == "1"
    # trained p2g proxy (scripts/train_proxy.py --family p2g): real
    # SD-body topology at narrow width, DDPM-trained on the synthetic
    # amodal-completion task — default quality evidence since r5
    # (round-4 VERDICT items 2+4; the razor-margin wo+dc5 PASS
    # 0.0499/0.05 was a jittered-random verdict). SAM stays as built
    # (the gated knobs only touch the p2g DDIM path).
    proxy_tag = ""
    _proxy_dir = _resolve_proxy_ckpt(quality_on, "p2g_meta.json")
    if _proxy_dir and os.path.exists(os.path.join(_proxy_dir, "p2g.npz")):
        import json as _json

        from amodal_depth_anything_tpu.heuristics.mask_heuristics import (
            CLIPVisionConfig, Pix2GestaltConfig)
        from amodal_depth_anything_tpu.models.vae import VAEConfig
        from amodal_depth_anything_tpu.pipeline.serving_ckpt import \
            cfg_from_dict
        from amodal_depth_anything_tpu.scripts.train_proxy import \
            load_params_npz
        with open(os.path.join(_proxy_dir, "p2g_meta.json")) as _f:
            _meta = _json.load(_f)
        mh.p2g_cfg = cfg_from_dict(Pix2GestaltConfig, _meta["p2g_cfg"])
        mh.clip_cfg = cfg_from_dict(CLIPVisionConfig, _meta["clip_cfg"])
        mh.vae_cfg = cfg_from_dict(VAEConfig, _meta["vae_cfg"])
        mh.p2g_params = jax.tree.map(jnp.asarray, load_params_npz(
            os.path.join(_proxy_dir, "p2g.npz")))
        mh.__dict__.pop("_p2g_jit", None)
        proxy_tag = " proxy=trained"
    elif quality_on:
        proxy_tag = " proxy=random"
    import dataclasses
    dc_env = os.environ.get("AMODAL_DEEPCACHE_P2G", "")
    # "interval" or "interval,groups": DeepCache over the DDIM steps
    # (opt-in, parity-breaking — same ladder policy as the other knobs)
    from amodal_depth_anything_tpu.ops.ddim import parse_deep_cache
    dc = parse_deep_cache(dc_env)
    mh.p2g_cfg = dataclasses.replace(mh.p2g_cfg, ddim_steps=ddim_steps,
                                     ddim_deep_cache=dc)
    # AMODAL_INT8_P2G: "1" = weight-only int8 UNet (halves the param
    # bytes the 100-step DDIM loop is read-bound on), "w4" = weight-only
    # int4 (halves them again, nibble-packed), "w8a8" = dynamic W8A8.
    # Opt-in, parity-breaking — same ladder policy as DeepCache.
    int8_env = os.environ.get("AMODAL_INT8_P2G", "")
    # AMODAL_HEUR_DTYPE=bfloat16: cast the serving stack (SAM encoder +
    # p2g DDIM path) — halves the param bytes the 100-step loop streams
    # and the serving-ckpt restore transfer. Opt-in, parity-breaking —
    # same ladder policy as int8/DeepCache (the flagship pipeline
    # already serves bf16 by default; the demo stack stayed f32).
    heur_dtype = os.environ.get("AMODAL_HEUR_DTYPE", "")
    if quality_on and proxy_tag != " proxy=trained":
        mh.p2g_params = dict(mh.p2g_params)
        mh.p2g_params["unet"] = jax.jit(_jitter_tree)(mh.p2g_params["unet"])

    rng = np.random.default_rng(0)
    # derive the benchmark geometry from the ACTUAL stack (a serving
    # checkpoint may hold a tiny or differently-sized model — the metric
    # label must describe what ran, not what the platform default is)
    hw = mh.sam_cfg.img_size
    image = (rng.random((hw, hw, 3)) * 255).astype(np.uint8)
    points = np.asarray([[hw // 2, hw // 2], [hw // 3, hw // 3]], np.float32)

    t0 = time.perf_counter()
    visible = mh.sam_visible_mask(image, points)
    sam_first_s = time.perf_counter() - t0

    quality = None
    if quality_on and (dc or int8_env or heur_dtype):
        # exact-path completion for the optimized-knob delta, computed
        # BEFORE the deep-cache program is built / the params are
        # quantized / the stack is cast (the p2g jit is a cached
        # property keyed on the config)
        saved = mh.p2g_cfg
        mh.p2g_cfg = dataclasses.replace(saved, ddim_deep_cache=None)
        mh.__dict__.pop("_p2g_jit", None)
        exact = mh.pix2gestalt_completion(image, visible)
        mh.p2g_cfg = saved
        mh.__dict__.pop("_p2g_jit", None)
    if heur_dtype:
        mh.cast_to(jnp.dtype(heur_dtype))  # before int8: scales stay f32
    if int8_env:
        mh.quantize_p2g_int8(weight_only=(int8_env != "w8a8"),
                             bits=4 if int8_env == "w4" else 8)
    # AMODAL_INT8_SAM=1: weight-only int8 SAM — a serving-checkpoint
    # BYTES lever (vit-h 1.3 GB bf16 -> 0.65 GB), not a latency one.
    # Quality readout: IoU of the visible mask vs the pre-quantization
    # mask on the same prompts (masks are thresholded, so IoU — not a
    # pixel delta — is the meaningful metric).
    sam_iou = None
    if os.environ.get("AMODAL_INT8_SAM", "") == "1":
        if quality_on:
            _vis_before = mh.sam_visible_mask(image, points)
        mh.quantize_sam_int8()
        if quality_on:
            _vis_after = mh.sam_visible_mask(image, points)
            inter = float(np.logical_and(_vis_before, _vis_after).sum())
            union = float(np.logical_or(_vis_before, _vis_after).sum())
            # two empty masks are identical, not disjoint
            sam_iou = round(inter / union, 4) if union else 1.0
    if serving_dir and init_mode == "init_random":
        # multi-GB device->host fetch — minutes through a degraded
        # tunnel; timed separately so the breakdown does not
        # misattribute checkpoint-write wall to param init. Sits after
        # the knob section so the checkpoint holds the READY stack
        # (bf16 cast + int8 kernels); knob application on a later
        # load_serving run is a no-op (already-quantized trees have no
        # "w" leaves for the walker, casts are idempotent).
        _t = time.perf_counter()
        mh.save_serving(serving_dir)
        serving_seed_s = round(time.perf_counter() - _t, 1)

    t0 = time.perf_counter()
    completion = mh.pix2gestalt_completion(image, visible)
    p2g_first_s = time.perf_counter() - t0
    # demo usability number (VERDICT r3 weak #5): wall from process start
    # to the first rendered completion — 26 min cold (1488 s p2g compile);
    # with AMODAL_TPU_CACHE=1 the Mosaic/XLA executables persist per box
    # and a warm start must land <180 s
    first_pixel_s = time.perf_counter() - _BENCH_T0
    assert np.isfinite(completion).all()
    if quality is None and quality_on and (dc or int8_env or heur_dtype):
        d = np.abs(exact - completion)
        quality = {"completion_max_abs": round(float(d.max()), 6),
                   "completion_mean_abs": round(float(d.mean()), 6)}
    if sam_iou is not None:
        quality = dict(quality or {}, sam_mask_iou=sam_iou)

    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        visible = mh.sam_visible_mask(image, points)
        completion = mh.pix2gestalt_completion(image, visible)
        float(completion.sum())
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[1]

    print(json.dumps({
        "metric": f"heuristics completions/sec (SAM "
                  f"{'vit-h' if mh.sam_cfg.embed_dim == 1280 else f'd{mh.sam_cfg.embed_dim}'}"
                  f" @ {hw}px + pix2gestalt {ddim_steps}-step DDIM"
                  + (f" deepcache={dc_env}" if dc_env else "")
                  + (f" int8={'w4' if int8_env == 'w4' else 'wo' if int8_env != 'w8a8' else 'w8a8'}"
                     if int8_env else "")
                  + (f" dtype={heur_dtype}" if heur_dtype else "")
                  + (" int8-sam" if os.environ.get("AMODAL_INT8_SAM", "")
                     == "1" else "")
                  + proxy_tag
                  + f"; first-call compile "
                  f"sam {sam_first_s:.0f}s p2g {p2g_first_s:.0f}s)",
        "value": round(1.0 / p50, 3),
        "unit": "completions/sec/chip",
        "vs_baseline": round(p50, 3),  # p50 seconds per completion
        "first_pixel_s": round(first_pixel_s, 1),
        "startup_breakdown_s": {
            "import": import_s, "param_init": init_s,
            "init_mode": init_mode,
            **({"serving_seed": serving_seed_s}
               if serving_seed_s is not None else {}),
            "sam_first": round(sam_first_s, 1),
            "p2g_first": round(p2g_first_s, 1)},
        **({"quality_delta": quality} if quality else {}),
        **({"quality_gate": __import__(
            "amodal_depth_anything_tpu.pipeline.quality",
            fromlist=["check_gate"]).check_gate(quality),
            "quality_proxy": proxy_tag.split("=")[-1] or "random"}
           if quality else {}),
    }))


def bench_train():
    """AMODAL_BENCH_TRAIN=1: jitted discriminative train step (fwd +
    loss-strategy masking + bwd + clip + Adam, donated state) at the
    reference recipe's shapes — vitl @518 batch 8 bf16 remat='attn'
    measured 491 ms/step = 16.3 img/s/chip on v5e (README)."""
    import time

    import numpy as np

    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.train import (DiscriminativeTrainer,
                                                 TrainerConfig)

    on_tpu = jax.devices()[0].platform == "tpu"
    size = 518 if on_tpu else 56
    batch = int(os.environ.get("AMODAL_BENCH_BATCH", 8 if on_tpu else 2))
    # AMODAL_BENCH_ENCODER: vitg stress row / OOM-boundary probing
    enc = os.environ.get("AMODAL_BENCH_ENCODER",
                         "vitl" if on_tpu else "vitt")
    # AMODAL_BENCH_ACCUM>1: optax.MultiSteps micro-batching — the
    # reference's configured regime is eff_bs 32 via accumulation
    # (reference train.py:104-107); each timed call is one micro-step.
    accum = int(os.environ.get("AMODAL_BENCH_ACCUM", "1"))
    # AMODAL_BENCH_OPT: adam (default) | adam-bf16mu | adafactor. vitg's
    # 1.1B params OOM 16G HBM under Adam at EVERY remat/batch combo
    # (23.2-24.5 GB measured) — adafactor is the single-chip vitg row.
    opt = os.environ.get("AMODAL_BENCH_OPT", "adam")
    iters = 5 if on_tpu else 2

    model = get_model("AmodalDAv2", encoder=enc)
    # remat policy: 'attn' (default on TPU; saves attention out/LSE),
    # 'full' -> True (recompute everything), '0' -> False (cache all).
    remat_env = os.environ.get("AMODAL_BENCH_REMAT",
                               "attn" if on_tpu else "0")
    remat = {"0": False, "full": True, "1": True}.get(remat_env, remat_env)
    # AMODAL_BENCH_HEAD_TILE=k: DPT-head fwd+bwd in rematted lax.map
    # chunks of k — the HBM lever for vitg@518 b8 (OOM by 595 MB without)
    ht_env = os.environ.get("AMODAL_BENCH_HEAD_TILE", "")
    cfg = TrainerConfig(compute_dtype="bfloat16" if on_tpu else "float32",
                        remat=remat, accumulation_steps=accum,
                        optimizer=opt, head_tile=int(ht_env) if ht_env
                        else None,
                        validation_period=0, visualization_period=0,
                        save_period=0)
    trainer = DiscriminativeTrainer(cfg, model, train_loader=[])

    rng = np.random.default_rng(0)
    batch_np = {
        "rgb_int": (rng.random((batch, size, size, 3)) * 255
                    ).astype(np.float32),
        "guide_rgb_norm": rng.standard_normal(
            (batch, size, size, 3)).astype(np.float32),
        "guide": (rng.random((batch, size, size, 1)) > 0.5
                  ).astype(np.float32),
        "depth_observation": rng.random((batch, size, size, 1)
                                        ).astype(np.float32),
        "depth_gt": rng.random((batch, size, size, 1)).astype(np.float32),
        "valid_mask_raw": np.ones((batch, size, size, 1), np.float32),
        "invisible_mask": (rng.random((batch, size, size, 1)) > 0.7
                           ).astype(np.float32),
        "visible_mask": (rng.random((batch, size, size, 1)) > 0.5
                         ).astype(np.float32),
    }
    dev = trainer._device_batch(batch_np)

    state, loss = trainer._train_step(trainer.state, dev)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._train_step(state, dev)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": f"amodal train step ms ({enc} @ {size}px, batch {batch}, "
                  f"{cfg.compute_dtype}, remat={cfg.remat}"
                  + (f", opt={opt}" if opt != "adam" else "")
                  + (f", head-tile={cfg.head_tile}" if cfg.head_tile
                     else "") + ")",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step",
        "vs_baseline": round(batch / dt, 2),  # img/s/chip
    }))


def bench_train_depthfm():
    """AMODAL_BENCH_TRAIN=depthfm: jitted flow-matching train step for the
    generative family (frozen VAE encode x3 + UNet fwd/bwd + Adam on the
    UNet, donated state) at the reference recipe's shapes — full-size
    DepthFMAmodal @512 (reference trains the UNet with the VAE frozen,
    src/trainer/depthfm_amodal_trainer.py:65-71)."""
    import time

    import numpy as np

    from amodal_depth_anything_tpu.models import get_model
    from amodal_depth_anything_tpu.train import (DepthFMAmodalTrainer,
                                                 TrainerConfig)

    on_tpu = jax.devices()[0].platform == "tpu"
    size = 512 if on_tpu else 32
    batch = int(os.environ.get("AMODAL_BENCH_BATCH", 4 if on_tpu else 2))
    iters = 5 if on_tpu else 2

    model = get_model("DepthFMAmodal", tiny=not on_tpu)
    # remat=True mirrors the reference recipe (SD UNet trains with
    # use_checkpoint=True); override with AMODAL_BENCH_REMAT=0
    remat = os.environ.get("AMODAL_BENCH_REMAT", "1" if on_tpu else "0") == "1"
    cfg = TrainerConfig(loss_strategy="entire_target_object",
                        loss_name="l1_loss", loss_kwargs={},
                        compute_dtype="bfloat16" if on_tpu else "float32",
                        remat=remat, attn_impl=None if on_tpu else "xla",
                        validation_period=0, visualization_period=0,
                        save_period=0)
    trainer = DepthFMAmodalTrainer(cfg, model, train_loader=[])

    rng = np.random.default_rng(0)
    batch_np = {
        "rgb_norm": rng.standard_normal(
            (batch, size, size, 3)).astype(np.float32),
        "guide_rgb_norm": rng.standard_normal(
            (batch, size, size, 3)).astype(np.float32),
        "guide": (rng.random((batch, size, size, 1)) > 0.5
                  ).astype(np.float32),
        "depth_observation": rng.random((batch, size, size, 1)
                                        ).astype(np.float32),
        "depth_gt": rng.random((batch, size, size, 1)).astype(np.float32),
        "valid_mask_raw": np.ones((batch, size, size, 1), np.float32),
        "invisible_mask": (rng.random((batch, size, size, 1)) > 0.7
                           ).astype(np.float32),
    }
    dev = trainer._device_batch(batch_np)

    state, loss = trainer._train_step(trainer.state, dev)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._train_step(state, dev)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": f"depthfm-amodal train step ms (@ {size}px, batch {batch}, "
                  f"{cfg.compute_dtype}, remat={cfg.remat})",
        "value": round(dt * 1e3, 1),
        "unit": "ms/step",
        "vs_baseline": round(batch / dt, 2),  # img/s/chip
    }))


def main():
    if os.environ.get("AMODAL_BENCH_DEPTHFM", "") == "1":
        return bench_depthfm()
    if os.environ.get("AMODAL_BENCH_TRAIN", "") == "depthfm":
        return bench_train_depthfm()
    if os.environ.get("AMODAL_BENCH_TRAIN", "") == "1":
        return bench_train()
    if os.environ.get("AMODAL_BENCH_HEURISTICS", "") == "1":
        return bench_heuristics()
    from amodal_depth_anything_tpu.models.amodal_dav2 import (
        DAV2Config, init_amodal_dav2)
    from amodal_depth_anything_tpu.pipeline import amodal_depth_graph

    on_tpu = jax.devices()[0].platform == "tpu"
    size = 1022 if on_tpu else 56
    batch = 8 if on_tpu else 1
    batch = int(os.environ.get("AMODAL_BENCH_BATCH", batch))
    base_enc = "vitg" if on_tpu else "vitt"
    amodal_enc = "vitl" if on_tpu else "vitt"
    iters = 10 if on_tpu else 2

    # Trained structured-weight proxy (scripts/train_proxy.py) instead of
    # seeded-random flagship weights — the AMODAL_QUALITY delta then
    # reflects real token-similarity / activation structure (round-3
    # VERDICT item 2). Encoders follow the checkpoint; size stays
    # flagship (real serving token counts) unless AMODAL_BENCH_SIZE
    # overrides. DEFAULT since r5 (round-4 VERDICT item 4): quality runs
    # auto-load the in-repo checkpoints/proxy when present — round 4
    # proved the random proxy gives WRONG gate verdicts (calib chain:
    # random-FAIL 0.129 -> trained-PASS 0.039), so regenerating them
    # silently must not be the no-env-var behavior.
    # AMODAL_PROXY_CKPT=dir overrides; =random forces the old jittered
    # seeded-random behavior (mechanism-only studies).
    proxy_ckpt = _resolve_proxy_ckpt(
        os.environ.get("AMODAL_QUALITY", "") == "1", "meta.json")
    if proxy_ckpt:
        import json as _json
        with open(os.path.join(proxy_ckpt, "meta.json")) as _f:
            _proxy_meta = _json.load(_f)
        base_enc = amodal_enc = _proxy_meta["encoder"]
    size = int(os.environ.get("AMODAL_BENCH_SIZE", size))

    raw_cfg = DAV2Config(encoder=base_enc, guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder=amodal_enc, guide_type="mask+observation")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if proxy_ckpt:
        from amodal_depth_anything_tpu.scripts.train_proxy import \
            load_params_npz
        p_raw = jax.tree.map(
            jnp.asarray, load_params_npz(
                os.path.join(proxy_ckpt, "raw_base.npz")))
        p_amodal = jax.tree.map(
            jnp.asarray, load_params_npz(
                os.path.join(proxy_ckpt, "amodal.npz")))
    else:
        p_raw = jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(
            jax.random.PRNGKey(0))
        p_amodal = jax.jit(lambda k: init_amodal_dav2(k, amodal_cfg))(
            jax.random.PRNGKey(1))
        # random init leaves the raw ReLU head all-negative (flat-0
        # depth), which would make the AMODAL_QUALITY delta vacuous; bias
        # it live (zero perf impact — same program)
        conv2 = p_raw["depth_head"]["scratch"]["output_conv2"]["conv2"]
        conv2["b"] = conv2["b"] + 1.0
    p_raw = jax.tree.map(lambda a: a.astype(dtype), p_raw)
    p_amodal = jax.tree.map(lambda a: a.astype(dtype), p_amodal)

    # seeded non-constant image: perf is data-independent, but the
    # AMODAL_QUALITY delta is meaningless on a constant input (all
    # tokens identical -> ToMe merges are exact by construction)
    image = jax.random.uniform(jax.random.PRNGKey(7),
                               (batch, size, size, 3), dtype, 0.0, 255.0)
    mask = jnp.zeros((batch, size, size, 1), dtype)
    mask = mask.at[:, size // 4: size // 2, size // 4: size // 2].set(1.0)

    int8_base = os.environ.get("AMODAL_INT8_BASE", "") == "1"
    int8_amodal = os.environ.get("AMODAL_INT8_AMODAL", "") == "1"
    int8_calib = os.environ.get("AMODAL_INT8_CALIB", "") == "1"
    quality_on = os.environ.get("AMODAL_QUALITY", "") == "1"
    # exact (pre-optimization) params for the AMODAL_QUALITY=1 delta —
    # snapshot ONLY when requested (holding the bf16 copies next to the
    # int8 ones costs ~2.8 GB HBM and OOMed the b16 max stack)
    p_raw_exact = p_raw if quality_on else None
    p_amodal_exact = p_amodal if quality_on else None
    calib_wall_s = None
    _calib_t0 = time.perf_counter()
    if int8_base or int8_amodal:
        # opt-in W8A8 serving path for the frozen trunks (ops/quant.py);
        # NOT the default: it trades the <1e-3 parity gate for speed.
        # Measured on v5e @1022px b8: base-only 3.35 img/s (+7.8%),
        # both trunks 3.41 img/s. AMODAL_INT8_CALIB=1 additionally runs a
        # one-batch calibration forward so attn.proj + fc2/w3 quantize too
        # (~100% of trunk matmul FLOPs int8 instead of 58-69%).
        from amodal_depth_anything_tpu.ops.quant import (
            calibrate_amodal_dav2, calibrate_dav2_head,
            quantize_dpt_head_int8, quantize_vit_trunk_int8)
        # calibrate on <=8 samples: the instrumented forward materializes
        # big head activations and OOMed at b16 (the amax stats don't
        # need the whole batch)
        rgb01 = image[:min(8, batch)] / 255.0
        int8_head = os.environ.get("AMODAL_INT8_HEAD", "") == "1"
        import functools

        int8_dynamic = os.environ.get("AMODAL_INT8_DYNAMIC", "") == "1"
        if int8_dynamic and any(os.environ.get(k) for k in (
                "AMODAL_INT8_FAMILIES", "AMODAL_INT8_SMOOTH",
                "AMODAL_INT8_MIXED", "AMODAL_INT8_MARGIN")):
            raise SystemExit(
                "bench: AMODAL_INT8_DYNAMIC=1 always quantizes all four "
                "families with run-time scales — FAMILIES/SMOOTH/MIXED/"
                "MARGIN would be silently ignored; unset them")

        # AMODAL_INT8_LAYERS_BASE / _AMODAL: per-layer subset spec like
        # "0-8,12,20-39" — quantize only those trunk layers (per-layer
        # lax.cond dispatch, ops/quant.py layer_mask; the greedy
        # sensitivity-walk knob, scripts/int8_layer_walk.py)
        def _layer_mask(env_key, depth):
            import numpy as np
            spec = os.environ.get(env_key, "")
            if not spec:
                return None
            m = np.zeros(depth, bool)
            for part in spec.split(","):
                if "-" in part:
                    a, b = (int(v) for v in part.split("-"))
                else:
                    a = b = int(part)
                if not (0 <= a <= b < depth):
                    raise SystemExit(
                        f"bench: {env_key}={spec!r} — segment {part!r} "
                        f"out of range / reversed for depth {depth}")
                m[a:b + 1] = True
            return m

        lm_base = _layer_mask("AMODAL_INT8_LAYERS_BASE", raw_cfg.vit.depth)
        lm_amodal = _layer_mask("AMODAL_INT8_LAYERS_AMODAL",
                                amodal_cfg.vit.depth)

        def quantize(p, cfg, lm=None, **guides):
            if int8_dynamic:
                # all four matmul families + head convs with RUN-time
                # per-tensor amax — full coverage, zero calibration
                # programs (the calibrated path costs ~65 min of tunnel
                # compiles)
                p = quantize_vit_trunk_int8(p, dynamic=True, layer_mask=lm)
                if int8_head:
                    from amodal_depth_anything_tpu.ops.quant import \
                        quantize_diffusion_int8
                    p = dict(p)
                    p["depth_head"] = jax.jit(functools.partial(
                        quantize_diffusion_int8,
                        skip_suffixes=("output_conv2/conv2",)))(
                            p["depth_head"])
                return p
            if not int8_calib:
                return quantize_vit_trunk_int8(p, layer_mask=lm)
            stats = jax.jit(
                lambda p_, x_: calibrate_amodal_dav2(p_, cfg, x_, **guides)
            )(p, rgb01)
            # AMODAL_INT8_SMOOTH=alpha: SmoothQuant outlier migration on
            # the data-fed matmuls (proj/fc2) before quantizing — attacks
            # the 0.129 gate-FAIL delta of the plain calib chain.
            # AMODAL_INT8_FAMILIES="qkv,ffn1,...": restrict coverage (the
            # gate-walk knob). AMODAL_INT8_MARGIN: amax multiplier —
            # values <1 CLIP activation outliers (int8_linear saturates),
            # the mechanism that makes the LN-bound scales quality-PASS
            # where plain amax scales fail. AMODAL_INT8_MIXED=1: keep the
            # gate-passing LN-bound scales on the LN-fed families
            # (qkv/ffn1) and use calibrated(+smooth) scales only where
            # LN bounds don't exist (proj/ffn2).
            smooth_env = os.environ.get("AMODAL_INT8_SMOOTH", "")
            fam_env = os.environ.get("AMODAL_INT8_FAMILIES", "")
            margin = float(os.environ.get("AMODAL_INT8_MARGIN", "1.25"))
            from amodal_depth_anything_tpu.ops.quant import FAMILIES
            smooth = float(smooth_env) if smooth_env else None
            families = (tuple(fam_env.split(",")) if fam_env
                        else FAMILIES)
            if os.environ.get("AMODAL_INT8_MIXED", "") == "1":
                p = quantize_vit_trunk_int8(
                    p, act_stats=stats, margin=margin, smooth_alpha=smooth,
                    families=tuple(f for f in ("proj", "ffn2")
                                   if f in families), layer_mask=lm)
                p = quantize_vit_trunk_int8(
                    p, families=tuple(f for f in ("qkv", "ffn1")
                                      if f in families), layer_mask=lm)
            else:
                p = quantize_vit_trunk_int8(
                    p, act_stats=stats, margin=margin,
                    smooth_alpha=smooth, families=families, layer_mask=lm)
            if int8_head:
                # int8 head convs too (3.4x conv rate on v5e); calibrated
                # on the same batch
                hstats = jax.jit(
                    lambda p_, x_: calibrate_dav2_head(p_, cfg, x_, **guides)
                )(p, rgb01)
                p = dict(p)
                p["depth_head"] = quantize_dpt_head_int8(p["depth_head"],
                                                         hstats)
            return p

        obs = jnp.zeros_like(mask)
        if int8_amodal and int8_calib and not int8_dynamic:
            # Serving-time observation: the amodal trunk sees the base
            # model's min-max-normalized depth scaled to [-1,1]
            # (amodal_depth_graph) — calibrate with that, not zeros, or
            # the recorded qkv/proj/fc amax under-cover the real range
            # and activations clip (pipeline.quantize_int8 does the same).
            # Computed BEFORE base quantization, like the pipeline.
            from amodal_depth_anything_tpu.models.amodal_dav2 import \
                apply_raw_dav2
            from amodal_depth_anything_tpu.ops.resize import resize2d
            base_d = jax.jit(
                lambda p_, x_: apply_raw_dav2(p_, raw_cfg, x_)
            )(p_raw, resize2d(rgb01, size=(size, size), method="bilinear"))
            lo = jnp.min(base_d, axis=(-1, -2), keepdims=True)
            hi = jnp.max(base_d, axis=(-1, -2), keepdims=True)
            obs = ((base_d - lo) / jnp.maximum(hi - lo, 1e-8))[..., None]
        if int8_base:
            p_raw = quantize(p_raw, raw_cfg, lm=lm_base)
        if int8_amodal:
            n_cal = rgb01.shape[0]
            p_amodal = quantize(
                p_amodal, amodal_cfg, lm=lm_amodal,
                guide_mask=mask[:n_cal] * 2.0 - 1.0,
                observation=obs[:n_cal] * 2.0 - 1.0)
        # calibration chain wall time (compiles + calibration forwards):
        # the VERDICT-r2 #10 number — barrier with a scalar fetch (cheap;
        # block_until_ready is unreliable through the tunnel)
        for _t in (p_raw, p_amodal):
            leaf = jax.tree.leaves(_t)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
        calib_wall_s = round(time.perf_counter() - _calib_t0, 1)

    # Opt-in ToMe token merge for the frozen base trunk: "layer,r"
    # (e.g. AMODAL_TOME_BASE="9,2560" merges 2560 of 5330 tokens after
    # the first tap). Quality unvalidated without real checkpoints
    # (ROADMAP) — never default.
    tome_env = os.environ.get("AMODAL_TOME_BASE", "")
    base_tm = tuple(int(v) for v in tome_env.split(",")) if tome_env else None
    tome_am_env = os.environ.get("AMODAL_TOME_AMODAL", "")
    amodal_tm = (tuple(int(v) for v in tome_am_env.split(","))
                 if tome_am_env else None)
    # AMODAL_HEAD_TILE=k: run both DPT heads in batch chunks of k under
    # lax.map (exact) — caps the full-grid fusion pyramid's HBM peak so
    # batch >8 fits at 1022 px (batch 8 was the ceiling: 23.2 GB needed
    # at b16, heads dominating)
    tile_env = os.environ.get("AMODAL_HEAD_TILE", "")
    head_tile = int(tile_env) if tile_env else None

    def run():
        base, blended = amodal_depth_graph(
            p_raw, p_amodal, image, mask,
            raw_cfg=raw_cfg, amodal_cfg=amodal_cfg, size=size,
            base_token_merge=base_tm, amodal_token_merge=amodal_tm,
            head_batch_tile=head_tile)
        return blended

    def sync(x):
        # block_until_ready is unreliable through the axon tunnel; a scalar
        # fetch is a true device barrier and costs ~1 roundtrip.
        return float(jnp.sum(x))

    sync(run())  # compile + warmup
    sync(run())

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run()
    sync(out)
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt

    # single-image p50 latency (batch 1, same graph)
    img1 = image[:1]
    mask1 = mask[:1]

    def run1():
        return amodal_depth_graph(p_raw, p_amodal, img1, mask1,
                                  raw_cfg=raw_cfg, amodal_cfg=amodal_cfg,
                                  size=size, base_token_merge=base_tm,
                                  amodal_token_merge=amodal_tm)[1]

    p50_ms = _amortized_p50_ms(run1, sync, n=20 if on_tpu else 2)

    # AMODAL_QUALITY=1: quality gate for the parity-breaking serving
    # modes — blended-depth delta vs the EXACT (unquantized, unmerged)
    # graph on the same batch, reported next to img/s so no optimized
    # number ships without its accuracy cost (pipeline/quality.py).
    quality = None
    optimized = int8_base or int8_amodal or base_tm or amodal_tm
    if quality_on and optimized:
        from amodal_depth_anything_tpu.pipeline.quality import \
            blended_depth_delta
        base_e, blended_e = amodal_depth_graph(
            p_raw_exact, p_amodal_exact, image, mask,
            raw_cfg=raw_cfg, amodal_cfg=amodal_cfg, size=size)
        base_o, blended_o = amodal_depth_graph(
            p_raw, p_amodal, image, mask,
            raw_cfg=raw_cfg, amodal_cfg=amodal_cfg, size=size,
            base_token_merge=base_tm, amodal_token_merge=amodal_tm,
            head_batch_tile=head_tile)
        import numpy as _np
        quality = blended_depth_delta(
            _np.asarray(base_e, _np.float32),
            _np.asarray(blended_e, _np.float32),
            _np.asarray(base_o, _np.float32),
            _np.asarray(blended_o, _np.float32))

    # BASELINE.json north star is v5e-8 aggregate vs one A100: >=2x.
    v5e8_aggregate = img_per_sec * 8
    head_active = (os.environ.get("AMODAL_INT8_HEAD", "") == "1"
                   and (int8_calib or
                        os.environ.get("AMODAL_INT8_DYNAMIC", "") == "1")
                   and (int8_base or int8_amodal))
    dyn_tag = " dyn" if os.environ.get("AMODAL_INT8_DYNAMIC", "") == "1" \
        and (int8_base or int8_amodal) else ""
    _sm = os.environ.get("AMODAL_INT8_SMOOTH", "")
    _fam = os.environ.get("AMODAL_INT8_FAMILIES", "")
    _mg = os.environ.get("AMODAL_INT8_MARGIN", "")
    _mx = os.environ.get("AMODAL_INT8_MIXED", "") == "1"
    quant_tag = dyn_tag + (" int8-base" if int8_base else "") + \
        (" int8-amodal" if int8_amodal else "") + \
        (" int8-head" if head_active else "") + \
        (f" smooth={_sm}" if _sm and int8_calib else "") + \
        (f" fam={_fam}" if _fam and int8_calib else "") + \
        (f" margin={_mg}" if _mg and int8_calib else "") + \
        (" mixed-scales" if _mx and int8_calib else "") + \
        (f" layers-base={os.environ['AMODAL_INT8_LAYERS_BASE']}"
         if os.environ.get("AMODAL_INT8_LAYERS_BASE") and int8_base
         else "") + \
        (f" layers-amodal={os.environ['AMODAL_INT8_LAYERS_AMODAL']}"
         if os.environ.get("AMODAL_INT8_LAYERS_AMODAL") and int8_amodal
         else "") + \
        (f" tome-base={tome_env}" if base_tm else "") + \
        (f" tome-amodal={tome_am_env}" if amodal_tm else "") + \
        (f" head-tile={head_tile}" if head_tile else "")
    line = {
        "metric": f"amodal-depth images/sec/chip @ {size}px "
                  f"(base {base_enc} + amodal {amodal_enc}, bf16{quant_tag}, "
                  f"batch {batch}; p50 single-image {p50_ms:.0f} ms)",
        "value": round(img_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(v5e8_aggregate / A100_PYTORCH_EST_IMG_PER_SEC, 3),
    }
    if quality is not None:
        from amodal_depth_anything_tpu.pipeline.quality import check_gate
        line["quality_delta"] = {k: round(v, 6) for k, v in quality.items()}
        line["quality_gate"] = check_gate(quality)
        line["quality_proxy"] = "trained" if proxy_ckpt else "random"
    if calib_wall_s is not None:
        line["calib_wall_s"] = calib_wall_s
    print(json.dumps(line))


if __name__ == "__main__":
    main()
