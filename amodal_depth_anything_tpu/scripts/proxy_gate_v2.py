"""Proxy-v2 quality-gate ladder: re-run every serving-optimization gate
verdict on TRAINED structured weights (round-3 VERDICT item 2).

Round 3's gate table used seeded-random weights; random weights
understate trained-token similarity, so ToMe FAIL verdicts may have been
proxy artifacts (and int8 verdicts rest on unrealistic activation
statistics). This loads the checkpoints produced by
`scripts/train_proxy.py` (a raw base + guided amodal AmodalDAv2 pair
trained to convergence on the layered-scenes task), runs the SAME
ladder of operating points through `pipeline.AmodalDepthPipeline`
against a HELD-OUT scenes corpus, and prints a markdown gate table.

The ladder points are scale-mapped analogs of the flagship knobs
(flagship vitg serves ~5330 tokens with taps at 9/19/29/39; the vitp
proxy serves (size/14)^2 tokens with taps at 2/5/8/11 — merge layers and
r scale proportionally).

Usage:
    python -m amodal_depth_anything_tpu.scripts.proxy_gate_v2 \
        --ckpt checkpoints/proxy --size 224 --eval-n 8
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _build_corpus(size: int, n: int, seed: int):
    """Held-out scenes with visible/whole masks for difficulty buckets."""
    import tempfile

    from ..data.synthetic import make_synthetic_sam_tree
    from .train_proxy import _load_corpus

    root = os.path.join(tempfile.gettempdir(),
                        f"proxy_gate_scenes_{n}_{size}_{seed}")
    list_path = os.path.join(root, "train.txt")
    if not os.path.exists(list_path):
        list_path = make_synthetic_sam_tree(root, n=n, hw=size, seed=seed,
                                            style="scenes")
    rgbs, _, _, wholes, visibles = _load_corpus(root, list_path, size)
    corpus = []
    for i in range(rgbs.shape[0]):
        corpus.append({
            "image": (rgbs[i] * 255).astype(np.uint8),
            "mask": visibles[i].astype(np.float32),
            "visible": visibles[i],
            "whole": wholes[i],
        })
    return corpus


def _runner(pipe):
    """corpus_quality_report-compatible closure over a pipeline."""
    import jax.numpy as jnp

    from ..pipeline.amodal_pipeline import amodal_depth_graph

    def run(image, mask):
        base, blended = amodal_depth_graph(
            pipe.params_raw, pipe.params_amodal,
            jnp.asarray(image), jnp.asarray(mask),
            raw_cfg=pipe.raw_cfg, amodal_cfg=pipe.amodal_cfg,
            size=pipe.size, attn_impl="xla",
            base_token_merge=pipe.base_token_merge,
            amodal_token_merge=pipe.amodal_token_merge)
        return np.asarray(base), np.asarray(blended)

    return run


def build_ladder(size: int, first_tap: int, depth: int):
    """(name, tome_base, tome_amodal, int8_kwargs|None) ladder points.

    Flagship analogs (RESULTS_r03_tpu.md rows): merge-after-first-tap at
    r=half tokens ("9,2560"-like), late gentle merge ("29,1280"-like),
    int8 LN-bound / calibrated / smooth variants, and the max stack."""
    n_tok = (size // 14) ** 2 + 1
    r_half = n_tok // 2 - 1
    r_quarter = n_tok // 4
    early = first_tap + 1                # vitg 9 (tap 9) -> vitp 3
    late = depth - 3                     # vitg 29 -> vitp 9
    return [
        ("exact (control)", None, None, None),
        ("int8 LN-bound base", None, None,
         dict(base=True, amodal=False)),
        ("int8 LN-bound both trunks", None, None,
         dict(base=True, amodal=True)),
        ("int8 calib both", None, None,
         dict(base=True, amodal=True, calib=True)),
        ("int8 calib both + smooth 0.5", None, None,
         dict(base=True, amodal=True, calib=True, smooth_alpha=0.5)),
        ("int8 calib both + head", None, None,
         dict(base=True, amodal=True, head=True, calib=True)),
        ("int8 calib both + head + smooth 0.5", None, None,
         dict(base=True, amodal=True, head=True, calib=True,
              smooth_alpha=0.5)),
        ("int8 mixed-scales + smooth 0.5", None, None,
         dict(base=True, amodal=True, calib=True, smooth_alpha=0.5,
              mixed=True)),
        ("int8 calib margin 0.7 (outlier clip)", None, None,
         dict(base=True, amodal=True, calib=True, margin=0.7)),
        ("int8 dynamic", None, None,
         dict(base=True, amodal=True, dynamic=True)),
        (f"tome base {early},{r_half} ('9,2560' analog)",
         (early, r_half), None, None),
        (f"tome base {late},{r_quarter} ('29,1280' analog)",
         (late, r_quarter), None, None),
        (f"tome both {early},{r_half} (max-merge analog)",
         (early, r_half), (early, r_half), None),
        (f"int8 calib + tome base {early},{r_half} (stack analog)",
         (early, r_half), None,
         dict(base=True, amodal=True, head=True, calib=True)),
        (f"int8+smooth + tome both {early},{r_half} (max-stack analog)",
         (early, r_half), (early, r_half),
         dict(base=True, amodal=True, head=True, calib=True,
              smooth_alpha=0.5)),
    ]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="checkpoints/proxy")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--eval-n", type=int, default=8)
    ap.add_argument("--eval-seed", type=int, default=777,
                    help="held out from train_proxy's --seed")
    ap.add_argument("--points", default=None,
                    help="comma-separated ladder indices to run")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    import jax

    from ..models.amodal_dav2 import DAV2Config
    from ..models.dinov2 import VIT_PRESETS, INTERMEDIATE_LAYER_IDX
    from ..pipeline.amodal_pipeline import AmodalDepthPipeline
    from ..pipeline.quality import check_gate, corpus_quality_report
    from .train_proxy import load_params_npz

    with open(os.path.join(args.ckpt, "meta.json")) as f:
        meta = json.load(f)
    enc = meta["encoder"]
    p_raw = load_params_npz(os.path.join(args.ckpt, "raw_base.npz"))
    p_amodal = load_params_npz(os.path.join(args.ckpt, "amodal.npz"))
    p_raw = jax.tree.map(jax.numpy.asarray, p_raw)
    p_amodal = jax.tree.map(jax.numpy.asarray, p_amodal)

    raw_cfg = DAV2Config(encoder=enc, guide_type="none", raw=True)
    amodal_cfg = DAV2Config(encoder=enc, guide_type="mask+observation")

    corpus = _build_corpus(args.size, args.eval_n, args.eval_seed)
    calib = (corpus[0]["image"], corpus[0]["mask"])

    first_tap = INTERMEDIATE_LAYER_IDX[enc][0]
    depth = VIT_PRESETS[enc]["depth"]
    ladder = build_ladder(args.size, first_tap, depth)
    if args.points:
        keep = {int(i) for i in args.points.split(",")}
        ladder = [pt for i, pt in enumerate(ladder) if i in keep]

    def make_pipe(tome_base=None, tome_amodal=None, int8=None):
        pipe = AmodalDepthPipeline(
            p_raw, raw_cfg, p_amodal, amodal_cfg, size=args.size,
            attn_impl="xla", base_token_merge=tome_base,
            amodal_token_merge=tome_amodal)
        if int8:
            kw = dict(int8)
            use_calib = kw.pop("calib", False)
            pipe.quantize_int8(calibration=calib if use_calib else None,
                               **kw)
        return pipe

    run_exact = _runner(make_pipe())

    rows = []
    print(f"\n## Proxy-v2 gate ladder — trained {enc} "
          f"(steps={meta['steps']}, scenes task) @ {args.size}px, "
          f"{len(corpus)} held-out samples\n")
    print("| operating point | blended max_abs | blended mean_abs | "
          "hard-bucket max | gate |")
    print("|---|---|---|---|---|")
    for name, tb, ta, int8 in ladder:
        pipe = make_pipe(tb, ta, int8)
        rep = corpus_quality_report(run_exact, _runner(pipe), corpus)
        verdict = check_gate(rep["overall"])
        hard = rep["per_bucket"]["hard"]["blended_max_abs"]
        row = {
            "point": name,
            "blended_max_abs": rep["overall"]["blended_max_abs"],
            "blended_mean_abs": rep["overall"]["blended_mean_abs"],
            "hard_max_abs": hard,
            "pass": verdict["pass"],
        }
        rows.append(row)
        print(f"| {name} | {row['blended_max_abs']:.4f} | "
              f"{row['blended_mean_abs']:.4f} | "
              f"{'-' if hard is None else f'{hard:.4f}'} | "
              f"{'PASS' if row['pass'] else 'FAIL'} |", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"meta": meta, "size": args.size, "rows": rows}, f,
                      indent=1)
    return rows


if __name__ == "__main__":
    main()
