"""Greedy per-layer int8 sensitivity walk (round-3 VERDICT item 1b).

Finds, per trunk, the largest set of layers whose calibrated-int8
quantization keeps the pipeline under the quality gate
(`pipeline.quality.QUALITY_GATE`), so the serving chain degrades to the
best PASSING subset automatically instead of all-or-nothing:

  1. *Sensitivity pass*: quantize ONE candidate at a time — each trunk
     layer (all four matmul families, calibrated scales) and, with
     `--head`, each DPT head as a single candidate — and measure the
     blended-depth delta on a held-out corpus. (The head must be a
     candidate, not always-on: its own delta is a constant ~0.027 that
     would swamp the per-layer signal.)
  2. *Greedy walk*: add candidates in ascending sensitivity order,
     re-measuring the CUMULATIVE delta; keep a candidate only while the
     gate still passes (deltas compose nonlinearly, so each step
     re-measures), reverting FAILs and continuing.

Because `layer_mask` variants share one jitted program per trunk (the
mask is a traced `use_q` bool vector — see ops/quant.py), the ~2·L
sensitivity points and ~2·L greedy steps all reuse two compiles.

Runs on the trained structured-weight proxy (scripts/train_proxy.py)
by default — the realistic pre-checkpoint evidence; on checkpoint day,
point --ckpt at converted real weights and re-run. `--random-weights`
uses the seeded-random proxy instead (the conservative one where the
full calib chain FAILS the flagship gate — the regime in which the
walk actually has something to degrade).

Usage:
    python -m amodal_depth_anything_tpu.scripts.int8_layer_walk \
        --ckpt checkpoints/proxy --size 224 --eval-n 8
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="checkpoints/proxy")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--eval-n", type=int, default=8)
    ap.add_argument("--eval-seed", type=int, default=777)
    ap.add_argument("--head", action="store_true",
                    help="include the DPT heads as one greedy candidate")
    ap.add_argument("--random-weights", action="store_true",
                    help="seeded-random proxy instead of the trained "
                         "checkpoint (the regime where the calib chain "
                         "fails and the walk has something to degrade)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    import jax

    from ..models.amodal_dav2 import DAV2Config, init_amodal_dav2
    from ..models.dinov2 import VIT_PRESETS
    from ..pipeline.amodal_pipeline import AmodalDepthPipeline
    from ..pipeline.quality import check_gate, corpus_quality_report
    from .proxy_gate_v2 import _build_corpus, _runner
    from .train_proxy import load_params_npz

    with open(os.path.join(args.ckpt, "meta.json")) as f:
        meta = json.load(f)
    enc = meta["encoder"]
    depth = VIT_PRESETS[enc]["depth"]
    raw_cfg = DAV2Config(encoder=enc, guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder=enc, guide_type="mask+observation")
    if args.random_weights:
        p_raw = init_amodal_dav2(jax.random.PRNGKey(0), raw_cfg)
        p_amodal = init_amodal_dav2(jax.random.PRNGKey(1), amodal_cfg)
        wtag = f"seeded-random {enc}"
    else:
        p_raw = load_params_npz(os.path.join(args.ckpt, "raw_base.npz"))
        p_amodal = load_params_npz(os.path.join(args.ckpt, "amodal.npz"))
        p_raw = jax.tree.map(jax.numpy.asarray, p_raw)
        p_amodal = jax.tree.map(jax.numpy.asarray, p_amodal)
        wtag = f"trained {enc}"

    corpus = _build_corpus(args.size, args.eval_n, args.eval_seed)
    calib = (corpus[0]["image"], corpus[0]["mask"])

    def make_pipe(base_mask, amodal_mask, head):
        pipe = AmodalDepthPipeline(
            p_raw, raw_cfg, p_amodal, amodal_cfg, size=args.size,
            attn_impl="xla")
        pipe.quantize_int8(base=True, amodal=True, head=head,
                           calibration=calib,
                           base_layer_mask=np.asarray(base_mask, bool),
                           amodal_layer_mask=np.asarray(amodal_mask, bool))
        return pipe

    run_exact = _runner(AmodalDepthPipeline(
        p_raw, raw_cfg, p_amodal, amodal_cfg, size=args.size,
        attn_impl="xla"))

    def measure(base_mask, amodal_mask, head=False):
        rep = corpus_quality_report(
            run_exact, _runner(make_pipe(base_mask, amodal_mask, head)),
            corpus)
        o = rep["overall"]
        return (o["blended_max_abs"], o["blended_mean_abs"],
                check_gate(o)["pass"])

    zeros = np.zeros(depth, bool)

    # ---- 1. per-candidate sensitivity --------------------------------
    print(f"\n## int8 per-layer sensitivity — {wtag} "
          f"(depth {depth}) @ {args.size}px, {len(corpus)} samples\n")
    print("| candidate | blended max_abs | mean_abs |")
    print("|---|---|---|")
    sens = []  # (max_abs, trunk, layer) — trunk 'head' has layer None
    for trunk in ("base", "amodal"):
        for layer in range(depth):
            m = zeros.copy()
            m[layer] = True
            mx, mn, _ = measure(m if trunk == "base" else zeros,
                                m if trunk == "amodal" else zeros)
            sens.append((mx, trunk, layer))
            print(f"| {trunk}:{layer} | {mx:.4f} | {mn:.4f} |",
                  flush=True)
    if args.head:
        mx, mn, _ = measure(zeros, zeros, head=True)
        sens.append((mx, "head", None))
        print(f"| head (both DPT heads) | {mx:.4f} | {mn:.4f} |",
              flush=True)

    # ---- 2. greedy walk ----------------------------------------------
    order = sorted(sens, key=lambda t: t[0])
    base_mask, amodal_mask = zeros.copy(), zeros.copy()
    head_on = False
    steps = []
    print("\n## Greedy walk (ascending single-candidate sensitivity)\n")
    print("| step | added | cum candidates | blended max_abs | "
          "mean_abs | gate |")
    print("|---|---|---|---|---|---|")
    n_cand = len(order)
    for i, (s, trunk, layer) in enumerate(order):
        if trunk == "head":
            head_on = True
        else:
            (base_mask if trunk == "base" else amodal_mask)[layer] = True
        mx, mn, ok = measure(base_mask, amodal_mask, head_on)
        n_cum = int(base_mask.sum() + amodal_mask.sum()) + int(head_on)
        tag = "head" if trunk == "head" else f"{trunk}:{layer}"
        steps.append({"candidate": tag, "max_abs": mx,
                      "mean_abs": mn, "pass": ok, "kept": ok})
        print(f"| {i} | {tag} | {n_cum}/{n_cand} | {mx:.4f} "
              f"| {mn:.4f} | {'PASS' if ok else 'FAIL -> revert'} |",
              flush=True)
        if not ok:  # revert and keep walking (deltas are candidate-
            # specific; a later cheaper candidate may still fit)
            if trunk == "head":
                head_on = False
            else:
                (base_mask if trunk == "base" else amodal_mask)[layer] = \
                    False

    n_base = int(base_mask.sum())
    n_amodal = int(amodal_mask.sum())
    mx, mn, ok = measure(base_mask, amodal_mask, head_on)
    print(f"\nBest passing subset: base {n_base}/{depth} layers "
          f"{sorted(np.where(base_mask)[0].tolist())}, amodal "
          f"{n_amodal}/{depth} layers "
          f"{sorted(np.where(amodal_mask)[0].tolist())}, head="
          f"{'int8' if head_on else 'bf16'} — final delta "
          f"{mx:.4f}/{mn:.4f} gate={'PASS' if ok else 'FAIL'}")
    coverage = (n_base + n_amodal) / (2 * depth)
    print(f"int8 layer coverage: {coverage:.0%}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "meta": meta, "size": args.size, "head": args.head,
                "random_weights": args.random_weights,
                "sensitivity": [
                    {"trunk": t, "layer": l, "max_abs": s}
                    for s, t, l in sens],
                "walk": steps,
                "base_mask": base_mask.tolist(),
                "amodal_mask": amodal_mask.tolist(),
                "head_int8": head_on,
                "final": {"max_abs": mx, "mean_abs": mn, "pass": ok,
                          "coverage": coverage},
            }, f, indent=1)
    return base_mask, amodal_mask


if __name__ == "__main__":
    main()
