"""Offline serving autotuner: sweep the optimization ladder, pick the
fastest config under a quality budget.

The serving knobs (W8A8 int8, ToMe token merging, head batch-tiling) are
accuracy/throughput trades; which stack wins depends on hardware, batch
and the model's tolerance. This tool packages the manual exploration the
perf docs record (docs/ROADMAP.md ladder) into one command:

    python -m amodal_depth_anything_tpu.scripts.autotune_serving \
        --family amodal --base_ckpt ... --amodal_ckpt ... \
        --batch 8 --quality_budget 0.02 --out report.json

For each candidate config it measures img/s + p50 latency on a seeded
synthetic corpus (or a user corpus via --image/--mask, repeated to the
batch) and the output delta vs the EXACT bf16/f32 pipeline, then reports
every row and the fastest one whose max-abs blended delta fits the
budget. The reference has no serving layer at all, let alone a tuner.

`--random` builds seeded random-weight pipelines (tiny presets) — the
smoke path used by tests; quality deltas on random weights are only a
plumbing check, not a quality statement (the real gate needs real
checkpoints — scripts/verify_checkpoints.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon TPU plugin ignores the env var; force it (CLAUDE.md)
    import jax
    jax.config.update("jax_platforms", "cpu")

__all__ = ["build_parser", "candidate_configs", "run_autotune", "main"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="serving-ladder autotuner")
    p.add_argument("--family", choices=["amodal", "depthfm"],
                   default="amodal")
    p.add_argument("--random", action="store_true",
                   help="seeded random weights (tiny presets) — smoke mode")
    p.add_argument("--proxy", nargs="?", const="checkpoints/proxy",
                   default=None,
                   help="trained structured-weight proxy dir "
                        "(scripts/train_proxy.py). DEFAULT when no "
                        "checkpoints are given and checkpoints/proxy "
                        "exists — random-weight gate verdicts are a "
                        "known-misleading artifact (round-4 proxy-v2)")
    p.add_argument("--base_ckpt", type=str, default=None)
    p.add_argument("--amodal_ckpt", type=str, default=None)
    p.add_argument("--depthfm_ckpt", type=str, default=None)
    p.add_argument("--vae_ckpt", type=str, default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--quality_budget", type=float, default=0.02,
                   help="max allowed max-abs depth delta vs the exact "
                        "pipeline (depth is in [0,1])")
    p.add_argument("--configs", type=str, default=None,
                   help="comma list to restrict the sweep (names from "
                        "candidate_configs)")
    p.add_argument("--include_calibrated", action="store_true",
                   help="also sweep calibrated int8 (adds ~2 large "
                        "compiles per config — ~an hour on a tunneled TPU)")
    p.add_argument("--image", type=str, default=None,
                   help="optional RGB image file for the measurement corpus")
    p.add_argument("--mask", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None)
    return p


def _tome_cfg(vit_cfg, size: int, frac: float, late: bool):
    """(after_layer, r) for a trunk: merge r = frac*N tokens after a late
    (post-most-taps) or early layer, clamped to tome_merge's r < N//2."""
    n = (size // vit_cfg.patch_size) ** 2 + 1
    r = min(int(frac * n), n // 2 - 1)
    depth = vit_cfg.depth
    layer = min(9, depth - 2) if late else max(1, min(4, depth // 2))
    if r < 1:
        return None
    return (layer, r)


def candidate_configs(family: str, include_calibrated: bool = False):
    """Ordered candidate names for the sweep (exact first)."""
    if family == "amodal":
        names = ["bf16", "int8_dynamic", "tome_base", "tome_both",
                 "int8_dynamic+tome_both"]
        if include_calibrated:
            names.insert(2, "int8_calib")
        return names
    return ["bf16", "int8_dynamic", "tome_0.75", "deepcache_2",
            "deepcache_2+tome_0.75", "int8_dynamic+tome_0.75",
            "int8_dynamic+deepcache_2"]


def _default_size(args) -> int:
    """The ONE place the per-family default resolution lives."""
    if args.family == "amodal":
        return 56 if args.random else 518
    return 32 if args.random else 512


def _load_amodal(args):
    """Load/convert (or seed) the exact param trees ONCE; every candidate
    pipeline is constructed from these shared host trees (quantize_int8
    builds new arrays, it never mutates its input)."""
    import jax

    if args.proxy:
        import json

        from ..models.amodal_dav2 import DAV2Config
        from .train_proxy import load_params_npz
        with open(os.path.join(args.proxy, "meta.json")) as f:
            enc = json.load(f)["encoder"]
        raw_cfg = DAV2Config(encoder=enc, guide_type="none", raw=True)
        am_cfg = DAV2Config(encoder=enc, guide_type="mask+observation")
        import jax.numpy as jnp
        p_raw = jax.tree.map(jnp.asarray, load_params_npz(
            os.path.join(args.proxy, "raw_base.npz")))
        p_am = jax.tree.map(jnp.asarray, load_params_npz(
            os.path.join(args.proxy, "amodal.npz")))
        return p_raw, raw_cfg, p_am, am_cfg

    if args.random:
        from ..models.amodal_dav2 import DAV2Config, init_amodal_dav2
        raw_cfg = DAV2Config(encoder="vitt", guide_type="none", raw=True)
        am_cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
        p_raw = jax.jit(lambda k: init_amodal_dav2(k, raw_cfg))(
            jax.random.PRNGKey(args.seed))
        # random init leaves the raw ReLU head flat-0 (bench.py does the
        # same live bias) — a degenerate base makes every delta vacuous
        conv2 = p_raw["depth_head"]["scratch"]["output_conv2"]["conv2"]
        conv2["b"] = conv2["b"] + 1.0
        p_am = jax.jit(lambda k: init_amodal_dav2(k, am_cfg))(
            jax.random.PRNGKey(args.seed + 1))
        return p_raw, raw_cfg, p_am, am_cfg


    from ..convert.torch_to_jax import (convert_dav2, infer_dav2_config,
                                        load_state_dict)
    amodal_ckpt = args.amodal_ckpt
    if os.path.isdir(amodal_ckpt):
        amodal_ckpt = os.path.join(amodal_ckpt, "model.safetensors")
    sd_raw = load_state_dict(args.base_ckpt)
    raw_cfg = infer_dav2_config(sd_raw, raw=True)
    sd_am = load_state_dict(amodal_ckpt)
    am_cfg = infer_dav2_config(sd_am)
    return (convert_dav2(sd_raw, raw_cfg), raw_cfg,
            convert_dav2(sd_am, am_cfg), am_cfg)


def _load_depthfm(args):
    import jax

    if args.proxy and os.path.exists(os.path.join(args.proxy,
                                                  "depthfm.npz")):
        import json

        import jax.numpy as jnp

        from ..models.depthfm import DepthFMConfig
        from .train_proxy import load_params_npz
        with open(os.path.join(args.proxy, "depthfm_meta.json")) as f:
            over = json.load(f)["overrides"]
        over["vae_channels"] = tuple(over["vae_channels"])
        over["channel_mult"] = tuple(over.get("channel_mult", (1, 2, 4, 4)))
        cfg = DepthFMConfig(guide_type="mask+observation", **over)
        params = jax.tree.map(jnp.asarray, load_params_npz(
            os.path.join(args.proxy, "depthfm.npz")))
        return params, cfg

    if args.random:
        from ..models import get_model
        model = get_model("DepthFMAmodal", tiny=True)
        params = model.init(jax.random.PRNGKey(args.seed))
        # zero-init UNet out conv makes optimized-vs-exact deltas vacuous
        # on random weights; jitter it (same trick as bench.py's
        # AMODAL_QUALITY mode)
        w = params["unet"]["out"]["conv"]["w"]
        params["unet"]["out"]["conv"]["w"] = w + 0.01 * jax.random.normal(
            jax.random.PRNGKey(7), w.shape, w.dtype)
        return params, model.config
    from ..pipeline import DepthFMPipeline
    probe = DepthFMPipeline.from_checkpoints(args.depthfm_ckpt,
                                             args.vae_ckpt, size=args.size,
                                             dtype=jnp_dtype(args))
    return probe.params, probe.cfg


def jnp_dtype(args):
    import jax.numpy as jnp
    return jnp.dtype(args.dtype)


def _build_amodal(args, name, loaded):
    from ..pipeline import AmodalDepthPipeline

    p_raw, raw_cfg, p_am, am_cfg = loaded
    size = args.size

    def tm(frac, late):
        # derive merge geometry from the LOADED trunk config (vitt smoke
        # / vitp proxy / converted-checkpoint encoder all differ)
        return _tome_cfg(raw_cfg.vit, size, frac, late)

    kw = {}
    if "tome_base" in name:
        kw["base_token_merge"] = tm(0.45, late=True)
    if "tome_both" in name:
        kw["base_token_merge"] = tm(0.45, late=False)
        kw["amodal_token_merge"] = tm(0.45, late=False)

    pipe = AmodalDepthPipeline(p_raw, raw_cfg, p_am, am_cfg, size=size,
                               dtype=jnp_dtype(args), attn_impl=None, **kw)
    if "int8_dynamic" in name:
        pipe.quantize_int8(base=True, amodal=True, head=True, dynamic=True)
    elif "int8_calib" in name:
        img, msk = _corpus(args, size)
        pipe.quantize_int8(base=True, amodal=True, head=True,
                           calibration=(img[: min(4, len(img))],
                                        msk[: min(4, len(msk))]))
    return pipe


def _build_depthfm(args, name, loaded):
    from ..pipeline import DepthFMPipeline

    params, cfg = loaded
    # tiny presets have ~16-token transformer levels; (0.4, 8) keeps the
    # merge legal there (same shape the bench smoke uses)
    tome = ((0.75, 4096) if not args.random else (0.4, 8)) \
        if "tome" in name else None
    # tiny presets have 6 symmetric UNet groups -> G=2; full SD runs the
    # gated serving recommendation (2,2) — the r5 trained-proxy frontier
    # point (17.36 img/s PASS 0.043; G=3 is the prior rec at 16.18)
    deep_cache = (2, 2) if "deepcache" in name else None
    pipe = DepthFMPipeline(params, cfg, size=args.size, num_steps=2
                           if args.random else 4, dtype=jnp_dtype(args),
                           tome=tome, deep_cache=deep_cache)
    if "int8_dynamic" in name:
        pipe.quantize_int8()
    return pipe


def _corpus(args, size):
    """[B,H,W,3] float 0-255 + [B,H,W] mask — user files repeated to the
    batch, or a seeded synthetic corpus."""
    b = args.batch
    if args.image:
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert("RGB"), np.float32)
        msk = (np.asarray(Image.open(args.mask).convert("L"), np.float32)
               if args.mask else np.ones(img.shape[:2], np.float32) * 255)
        imgs = np.repeat(img[None], b, axis=0)
        msks = np.repeat((msk > 0).astype(np.float32)[None], b, axis=0)
        return imgs, msks
    rng = np.random.default_rng(args.seed)
    imgs = (rng.random((b, size, size, 3)) * 255).astype(np.float32)
    msks = (rng.random((b, size, size)) > 0.5).astype(np.float32)
    return imgs, msks


def _measure(call, reps):
    call()  # compile + warm
    times, out = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = call()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def run_autotune(args) -> dict:
    # Default quality evidence = the trained proxy (round-4 VERDICT
    # item 4): with no checkpoints and no --random, fall back to the
    # in-repo proxy when present instead of erroring on a missing ckpt.
    if (not args.random and args.proxy is None
            and not (args.base_ckpt or args.depthfm_ckpt)):
        marker = ("meta.json" if args.family == "amodal"
                  else "depthfm_meta.json")
        default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", "checkpoints", "proxy")
        if os.path.exists(os.path.join(default, marker)):
            args.proxy = os.path.normpath(default)

    names = candidate_configs(args.family, args.include_calibrated)
    if args.configs:
        keep = [s.strip() for s in args.configs.split(",")]
        unknown = set(keep) - set(names)
        if unknown:
            raise SystemExit(f"unknown configs {sorted(unknown)}; "
                             f"choose from {names}")
        names = [n for n in names if n in keep]
    if names[0] != "bf16":
        names = ["bf16"] + names  # the exact reference point is mandatory
    if args.quality_budget < 0:
        raise SystemExit("--quality_budget must be >= 0 (0 = exact only)")

    if args.size is None:
        args.size = _default_size(args)
    if args.family == "depthfm" and args.size % 8 != 0:
        raise SystemExit(f"--size {args.size} must be divisible by the VAE "
                         f"factor 8 for --family depthfm")
    size = args.size
    build = _build_amodal if args.family == "amodal" else _build_depthfm
    loaded = (_load_amodal if args.family == "amodal" else _load_depthfm)(
        args)
    img, msk = _corpus(args, size)
    if args.family == "depthfm":
        rng = np.random.default_rng(args.seed + 1)
        obs = rng.random((args.batch, *img.shape[1:3])).astype(np.float32)

    rows, exact_out = [], None
    for name in names:
        pipe = build(args, name, loaded)
        if args.family == "amodal":
            call = lambda: pipe(img, msk)
        else:
            call = lambda: pipe(img, msk, obs)
        dt, out = _measure(call, args.reps)
        if name == "bf16":
            exact_out = out
            delta = {"max_abs": 0.0, "mean_abs": 0.0}
        elif args.family == "amodal":
            from ..pipeline.quality import blended_depth_delta
            d = blended_depth_delta(*exact_out, *out)
            delta = {"max_abs": d["blended_max_abs"],
                     "mean_abs": d["blended_mean_abs"],
                     "base_max_abs": d["base_max_abs"]}
        else:
            diff = np.abs(np.float32(exact_out) - np.float32(out))
            delta = {"max_abs": float(diff.max()),
                     "mean_abs": float(diff.mean())}
        rows.append({
            "config": name,
            "img_per_sec": round(args.batch / dt, 3),
            "p50_batch_ms": round(dt * 1e3, 1),
            "quality_delta": {k: round(v, 6) for k, v in delta.items()},
            "passes_budget": delta["max_abs"] <= args.quality_budget,
        })

    passing = [r for r in rows if r["passes_budget"]]
    best = max(passing, key=lambda r: r["img_per_sec"]) if passing else None
    report = {
        "family": args.family,
        "batch": args.batch,
        "size": size,
        "dtype": args.dtype,
        "quality_budget": args.quality_budget,
        "random_weights": bool(args.random),
        # which proxy judged these rows (round-4 VERDICT item 5: every
        # verdict row must say what weights produced it)
        "weights": ("random" if args.random else
                    f"proxy:{args.proxy}" if args.proxy else "checkpoints"),
        "rows": rows,
        "best": best["config"] if best else None,
        "best_img_per_sec": best["img_per_sec"] if best else None,
    }
    return report


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    # explicit checkpoints > explicit --proxy/--random > auto trained
    # proxy (resolved inside run_autotune when checkpoints/proxy exists)
    have_proxy_default = os.path.exists(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..",
        "checkpoints", "proxy",
        "meta.json" if args.family == "amodal" else "depthfm_meta.json"))
    if args.family == "amodal" and not args.random and not args.proxy \
            and not (args.base_ckpt and args.amodal_ckpt) \
            and not have_proxy_default:
        raise SystemExit("need --random, --proxy or "
                         "--base_ckpt/--amodal_ckpt")
    if args.family == "depthfm" and not args.random and not args.proxy \
            and not (args.depthfm_ckpt and args.vae_ckpt) \
            and not have_proxy_default:
        raise SystemExit("need --random, --proxy or "
                         "--depthfm_ckpt/--vae_ckpt")
    report = run_autotune(args)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
