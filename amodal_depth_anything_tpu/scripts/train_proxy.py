"""Train the structured-weight quality proxy (round-3 VERDICT item 2).

Every serving-ladder quality verdict (int8 / ToMe / stacks,
`pipeline/quality.py::QUALITY_GATE`) previously rested on seeded-random
weights, which systematically understate trained-token similarity (ToMe
merges look worse than they are) and may misstate activation-outlier
structure (int8 act scales). This script trains a small-but-real
AmodalDAv2 pair — the raw base-depth model and the guided amodal model —
to convergence on the layered-scene synthetic task
(`data/synthetic.make_synthetic_sam_tree(style="scenes")`, a genuinely
learnable amodal-depth problem) and persists float16 checkpoints
in-repo so `scripts/proxy_gate_v2.py` and `bench.py`
(AMODAL_PROXY_CKPT=) can re-run the whole gate ladder on structured
weights.

Reference behavior being protected: the eval protocol of
`/root/reference/src/trainer/discriminative_trainer.py:546-587` — the
serving optimizations must not silently degrade it.

Usage (CPU, ~15-30 min at the defaults on a 1-vCPU box):
    python -m amodal_depth_anything_tpu.scripts.train_proxy \
        --out checkpoints/proxy --encoder vitp --size 112 --steps 800
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np


def flatten_params(params) -> dict:
    """Nested-dict param tree -> {'a/b/c': np.ndarray} (plain dicts only,
    per repo convention; stacked [L,...] leaves stay stacked)."""
    import jax.tree_util as jtu

    out = {}
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        key = "/".join(str(p.key) for p in path)
        out[key] = np.asarray(leaf)
    return out


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params_npz(path: str, params, *, dtype=np.float16) -> None:
    flat = {k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
            else v for k, v in flatten_params(params).items()}
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, *, dtype=np.float32) -> dict:
    with np.load(path) as z:
        flat = {k: (np.asarray(z[k], dtype)
                    if np.issubdtype(z[k].dtype, np.floating) else z[k])
                for k in z.files}
    return unflatten_params(flat)


def _load_corpus(root: str, list_path: str, size: int):
    """Load the whole scenes tree into arrays (tiny by construction)."""
    from PIL import Image

    rgbs, depths, amodal_depths, wholes, visibles = [], [], [], [], []
    with open(list_path) as f:
        for line in f:
            rel = line.split()[0]
            stem = os.path.basename(rel)

            def _img(d, name=stem):
                im = Image.open(os.path.join(root, d, name))
                if im.size != (size, size):
                    im = im.resize((size, size), Image.NEAREST)
                return np.asarray(im)

            rgbs.append(_img("occlusion").astype(np.float32) / 255.0)
            depths.append(_img("depth_da_update_occ").astype(np.float32)
                          / 65535.0)
            amodal_depths.append(
                _img("depth_da_update_combine").astype(np.float32) / 65535.0)
            wholes.append(_img("whole_mask") > 127)
            visibles.append(_img("visible_object_mask") > 127)
    return (np.stack(rgbs), np.stack(depths), np.stack(amodal_depths),
            np.stack(wholes), np.stack(visibles))


def train_raw_base(rgbs, depths, *, encoder: str, steps: int, batch: int,
                   lr: float, seed: int = 0, log_every: int = 50):
    """Simple supervised loop for the frozen-base stand-in: RGB ->
    scene depth, scale-aware L1 (the raw ReLU head outputs unnormalized
    relative depth; the pipeline min-max normalizes downstream, but an
    absolute target keeps the proxy deterministic)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.amodal_dav2 import (DAV2Config, apply_raw_dav2,
                                      init_amodal_dav2)

    cfg = DAV2Config(encoder=encoder, guide_type="none", raw=True)
    params = jax.jit(lambda k: init_amodal_dav2(k, cfg))(
        jax.random.PRNGKey(seed))
    # random init leaves the raw ReLU head all-negative: flat-0 depth AND
    # zero gradient through the dead output ReLU, so training never
    # escapes (observed: 800 steps at constant loss). Bias the final conv
    # positive (same trick as bench.py's quality path).
    conv2 = params["depth_head"]["scratch"]["output_conv2"]["conv2"]
    conv2["b"] = conv2["b"] + 0.5
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(optax.cosine_decay_schedule(lr, steps)))
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        pred = apply_raw_dav2(p, cfg, x, attn_impl="xla")
        return jnp.mean(jnp.abs(pred - y))

    @jax.jit
    def step(p, s, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(seed)
    n = rgbs.shape[0]
    losses = []
    for it in range(steps):
        idx = rng.choice(n, size=batch, replace=False)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(rgbs[idx]),
                                       jnp.asarray(depths[idx]))
        losses.append(float(loss))
        if it % log_every == 0 or it == steps - 1:
            print(f"[raw {encoder}] step {it} loss {float(loss):.4f}",
                  flush=True)
    return params, losses


def train_amodal(root: str, list_path: str, *, encoder: str, size: int,
                 steps: int, batch: int, lr: float):
    """Guided amodal model via the real DiscriminativeTrainer on the
    scenes tree (same code path as production training)."""
    import jax

    from ..data import DataLoader, DatasetMode, SAMAmodalDataset
    from ..models import get_model
    from ..parallel import MeshConfig, make_mesh
    from ..train import DiscriminativeTrainer, TrainerConfig

    ds = SAMAmodalDataset(mode=DatasetMode.TRAIN, filename_ls_path=list_path,
                          dataset_dir=root, resize_to_hw=(size, size))
    loader = DataLoader(ds, batch_size=batch, shuffle=True, drop_last=True)
    cfg = TrainerConfig(loss_strategy="entire_target_object", max_iter=steps,
                        lr=lr, lr_total_iter=steps, lr_warmup_steps=20,
                        max_grad_norm=1.0,
                        validation_period=0, visualization_period=0,
                        save_period=0, log_interval=max(steps // 10, 1),
                        compute_dtype="float32", remat=False,
                        attn_impl="xla")
    model = get_model("AmodalDAv2", encoder=encoder)
    # pin a single-device mesh: the proxy batch is small and need not
    # divide the host's (possibly virtual 8-way) device count
    mesh = make_mesh(MeshConfig(data=1, model=1), devices=jax.devices()[:1])
    trainer = DiscriminativeTrainer(cfg, model, loader, mesh=mesh)
    trainer.train()
    return trainer.state.params


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="checkpoints/proxy")
    ap.add_argument("--encoder", default="vitp")
    ap.add_argument("--size", type=int, default=112,
                    help="train resolution (multiple of 14)")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data-n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default=None,
                    help="reuse an existing scenes tree")
    args = ap.parse_args(argv)

    root = args.data_dir or os.path.join(tempfile.gettempdir(),
                                         f"proxy_scenes_{args.data_n}"
                                         f"_{args.size}_{args.seed}")
    list_path = os.path.join(root, "train.txt")
    if not os.path.exists(list_path):
        from ..data.synthetic import make_synthetic_sam_tree
        list_path = make_synthetic_sam_tree(root, n=args.data_n,
                                            hw=args.size, seed=args.seed,
                                            style="scenes")
    rgbs, depths, _, _, _ = _load_corpus(root, list_path, args.size)

    os.makedirs(args.out, exist_ok=True)
    params_raw, raw_losses = train_raw_base(
        rgbs, depths, encoder=args.encoder, steps=args.steps,
        batch=args.batch, lr=args.lr, seed=args.seed)
    save_params_npz(os.path.join(args.out, "raw_base.npz"), params_raw)

    params_amodal = train_amodal(root, list_path, encoder=args.encoder,
                                 size=args.size, steps=args.steps,
                                 batch=args.batch, lr=args.lr)
    save_params_npz(os.path.join(args.out, "amodal.npz"), params_amodal)

    # convergence + non-degeneracy evidence for the gate runs: a flat
    # (zero-dynamic-range) base prediction would make every quality
    # delta vacuously small
    import jax
    import jax.numpy as jnp

    from ..models.amodal_dav2 import DAV2Config, apply_raw_dav2
    rcfg = DAV2Config(encoder=args.encoder, guide_type="none", raw=True)
    pred = jax.jit(lambda p, x: apply_raw_dav2(p, rcfg, x, attn_impl="xla"))(
        params_raw, jnp.asarray(rgbs[:4]))
    pred_std = float(jnp.std(pred))
    first, last = (float(np.mean(raw_losses[:50])),
                   float(np.mean(raw_losses[-50:])))
    if not (last < 0.8 * first and pred_std > 0.01):
        print(f"WARNING: raw proxy under-trained (loss {first:.4f} -> "
              f"{last:.4f}, pred_std {pred_std:.4f}) — gate verdicts on "
              "this checkpoint are unreliable")

    meta = {
        "encoder": args.encoder, "size": args.size, "steps": args.steps,
        "batch": args.batch, "lr": args.lr, "data_n": args.data_n,
        "seed": args.seed, "style": "scenes",
        "raw_loss_first50_mean": first,
        "raw_loss_last50_mean": last,
        "raw_pred_std": pred_std,
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
