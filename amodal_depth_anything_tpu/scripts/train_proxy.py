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


# ---------------------------------------------------------------- generative
# Round-4 VERDICT item 2: the DepthFM ladder's FAILs (deepcache2 at
# delta 0.197, dc2+int8 ~0.29) and the p2g razor-margin PASS
# (0.0499/0.05) were all judged on jittered-RANDOM weights — the exact
# proxy class round 4 proved gives wrong verdicts for the flagship
# (calib chain random-FAIL 0.129 -> trained-PASS 0.039). These trainers
# produce small-but-REAL-topology generative checkpoints: full SD-style
# channel_mult=(1,2,4,4) depth (DeepCache's mechanism needs the real
# level structure), real f=8 VAE, narrow channels for CPU trainability.
# Serving-scale gate runs then evaluate them at the real latent grids
# (512px depthfm / 256px p2g) on TPU via bench.py's AMODAL_QUALITY path.

# narrow-channel analogs of the SD-1.5 bodies (reference
# src/models/depthfm/unet/openaimodel.py topology; quality verdicts need
# the mechanism — level structure, attention placement — not the width)
DEPTHFM_PROXY_OVERRIDES = dict(
    model_channels=48, channel_mult=(1, 2, 4, 4), num_heads=4,
    context_dim=64, context_len=7, vae_channels=(32, 64, 96, 96),
    vae_layers=1)


def _p2g_proxy_cfgs():
    from ..heuristics.mask_heuristics import (CLIPVisionConfig,
                                              Pix2GestaltConfig)
    from ..models.vae import VAEConfig
    p2g_cfg = Pix2GestaltConfig(image_size=256, context_dim=64,
                                model_channels=48,
                                channel_mult=(1, 2, 4, 4), num_heads=4)
    clip_cfg = CLIPVisionConfig(image_size=64, patch_size=16, width=64,
                                depth=2, num_heads=2, projection_dim=64)
    vae_cfg = VAEConfig(block_out_channels=(32, 64, 96, 96),
                        layers_per_block=1)
    return p2g_cfg, clip_cfg, vae_cfg


def pretrain_vae(images_m1, vae_cfg, *, steps: int, batch: int, lr: float,
                 seed: int = 0, log_every: int = 50):
    """Autoencoder pretrain for the proxy VAEs (the real SD VAE is
    pretrained and FROZEN in every reference recipe — a random frozen
    VAE would hand the UNet unstructured latents and the proxy would
    inherit exactly the pathology it exists to remove). L1 recon plus a
    unit-latent-std pull so `q_sample`'s cosine SNR schedule sees
    realistic signal/noise ratios. images_m1: [N,H,W,3] in [-1,1]."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.vae import init_vae, vae_decode, vae_encode_mode

    params = jax.jit(lambda k: init_vae(k, vae_cfg))(
        jax.random.PRNGKey(seed + 17))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(optax.cosine_decay_schedule(lr, steps)))
    opt_state = tx.init(params)

    def loss_fn(p, x):
        lat = vae_encode_mode(p, x, vae_cfg)
        rec = vae_decode(p, lat, vae_cfg)
        l1 = jnp.mean(jnp.abs(rec - x))
        reg = (jnp.std(lat) - 1.0) ** 2
        return l1 + 0.05 * reg, (l1, jnp.std(lat))

    @jax.jit
    def step(p, s, x):
        (loss, (l1, lstd)), g = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(p, x)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, l1, lstd

    rng = np.random.default_rng(seed)
    n = images_m1.shape[0]
    l1 = lstd = None
    for it in range(steps):
        idx = rng.choice(n, size=min(batch, n), replace=False)
        params, opt_state, l1, lstd = step(params, opt_state,
                                           jnp.asarray(images_m1[idx]))
        if it % log_every == 0 or it == steps - 1:
            print(f"[vae] step {it} recon_l1 {float(l1):.4f} "
                  f"latent_std {float(lstd):.3f}", flush=True)
    return params, float(l1), float(lstd)


def train_depthfm_proxy(root: str, list_path: str, out: str, *,
                        size: int, steps: int, batch: int, lr: float,
                        seed: int = 0):
    """DepthFM(Amodal) proxy: pretrained-frozen proxy VAE + UNet trained
    through the REAL `DepthFMAmodalTrainer` (flow matching, latent-space
    loss, frozen VAE — same code path as production) on the scenes task."""
    import jax
    import jax.numpy as jnp

    from ..data import DataLoader, DatasetMode, SAMAmodalDataset
    from ..models import get_model
    from ..parallel import MeshConfig, make_mesh
    from ..train import DepthFMAmodalTrainer, TrainerConfig

    model = get_model("DepthFMAmodal",
                      cfg_overrides=dict(DEPTHFM_PROXY_OVERRIDES))

    rgbs, depths, _, _, _ = _load_corpus(root, list_path, size)
    # the serving path VAE-encodes rgb, guide-rgb renders, AND (in the
    # DDPM factory) 3-channel-stacked depth — pretrain on that mix
    depth3 = np.repeat(depths[..., None], 3, axis=-1)
    vae_corpus = np.concatenate([rgbs, depth3], axis=0) * 2.0 - 1.0
    vae_params, vae_l1, vae_lstd = pretrain_vae(
        vae_corpus.astype(np.float32),
        model.config.vae, steps=max(steps // 2, 200), batch=batch, lr=lr,
        seed=seed)

    params = jax.jit(model.init)(jax.random.PRNGKey(seed))
    params = {**params, "vae": jax.tree.map(jnp.asarray, vae_params)}

    ds = SAMAmodalDataset(mode=DatasetMode.TRAIN,
                          filename_ls_path=list_path, dataset_dir=root,
                          resize_to_hw=(size, size))
    loader = DataLoader(ds, batch_size=batch, shuffle=True, drop_last=True)
    cfg = TrainerConfig(loss_strategy="entire_target_object",
                        loss_name="l1_loss", loss_kwargs={},
                        max_iter=steps, lr=lr, lr_total_iter=steps,
                        lr_warmup_steps=20, max_grad_norm=1.0,
                        compute_dtype="float32", remat=False,
                        attn_impl="xla", validation_period=0,
                        visualization_period=0, save_period=0,
                        log_interval=max(steps // 10, 1))
    mesh = make_mesh(MeshConfig(data=1, model=1),
                     devices=jax.devices()[:1])
    trainer = DepthFMAmodalTrainer(cfg, model, loader, mesh=mesh,
                                   params=params)
    trainer.train()
    trained = trainer.state.params

    # non-degeneracy evidence: the 4-step eval must produce a depth map
    # that varies with the input (a flat output would make every gate
    # delta vacuously small)
    x = jnp.asarray(rgbs[:2] * 2.0 - 1.0, jnp.float32)
    m = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    o = jnp.zeros_like(m)
    pred = model.apply(trained, x, rng=jax.random.PRNGKey(1), mode="eval",
                       num_steps=4, guide_mask=m, observation=o,
                       attn_impl="xla")
    pred_std = float(jnp.std(pred))

    os.makedirs(out, exist_ok=True)
    save_params_npz(os.path.join(out, "depthfm.npz"), trained)
    meta = {"family": "depthfm", "overrides": DEPTHFM_PROXY_OVERRIDES,
            "size": size, "steps": steps, "batch": batch, "lr": lr,
            "seed": seed, "style": "scenes",
            "vae_recon_l1": vae_l1, "vae_latent_std": vae_lstd,
            "eval_pred_std": pred_std}
    with open(os.path.join(out, "depthfm_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))
    if pred_std < 0.01:
        print("WARNING: depthfm proxy eval output near-flat "
              f"(std {pred_std:.4f}) — gate verdicts unreliable")
    return trained


def train_p2g_proxy(root: str, list_path: str, out: str, *, size: int,
                    steps: int, batch: int, lr: float, seed: int = 0):
    """pix2gestalt proxy: DDPM eps-prediction on (occluded RGB + visible
    mask) -> whole (un-occluded) RGB — the synthetic analog of the
    reference's amodal-completion finetune
    (sd-finetune-pix2gestalt-c_concat-256.yaml, reference app.py:55).
    Mirrors the serving conditioning assembly of
    `MaskHeuristics._p2g_jit` exactly (VAE img latent ++ VAE mask-render
    latent as channel-concat, CLIP image embed as the 1-token
    cross-attention context) with 10% conditioning dropout so
    classifier-free guidance (serving guidance_scale 1.5) is trained."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.clip_vit import clip_image_embed, init_clip_vision
    from ..models.unet_ldm import apply_unet, init_unet
    from ..models.vae import init_vae, vae_encode_mode
    from ..ops.ddim import ddpm_add_noise, linear_alphas_cumprod
    from ..ops.resize import resize2d

    p2g_cfg, clip_cfg, vae_cfg = _p2g_proxy_cfgs()

    rgbs, _, _, wholes, visibles = _load_corpus(root, list_path, size)
    # whole (un-occluded) RGB target comes from the scenes tree directly
    from PIL import Image
    whole_rgbs = []
    with open(list_path) as f:
        for line in f:
            stem = os.path.basename(line.split()[0]).replace(
                "_occlusion", "_whole")
            im = Image.open(os.path.join(root, "whole", stem))
            if im.size != (size, size):
                im = im.resize((size, size), Image.NEAREST)
            whole_rgbs.append(np.asarray(im).astype(np.float32) / 255.0)
    whole_rgbs = np.stack(whole_rgbs)

    mask01 = visibles.astype(np.float32)[..., None]
    vae_corpus = np.concatenate(
        [rgbs, whole_rgbs, np.repeat(mask01, 3, axis=-1)],
        axis=0) * 2.0 - 1.0
    vae_params, vae_l1, vae_lstd = pretrain_vae(
        vae_corpus.astype(np.float32), vae_cfg,
        steps=max(steps // 2, 200), batch=batch, lr=lr, seed=seed + 1)

    k_unet, k_clip = jax.random.split(jax.random.PRNGKey(seed + 2))
    unet = jax.jit(lambda k: init_unet(k, p2g_cfg.unet))(k_unet)
    clip = jax.jit(lambda k: init_clip_vision(k, clip_cfg))(k_clip)
    uncond_ctx = jnp.zeros((1, 1, p2g_cfg.context_dim), jnp.float32)
    vae_params = jax.tree.map(jnp.asarray, vae_params)

    alphas = linear_alphas_cumprod(1000)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(optax.cosine_decay_schedule(lr, steps)))
    opt_state = tx.init(unet)
    clip_mean = jnp.asarray((0.48145466, 0.4578275, 0.40821073),
                            jnp.float32)
    clip_std = jnp.asarray((0.26862954, 0.26130258, 0.27577711),
                           jnp.float32)

    def loss_fn(unet_p, vis01, m01, whole01, rng):
        k_t, k_noise, k_drop = jax.random.split(rng, 3)
        b = vis01.shape[0]
        img_latent = vae_encode_mode(vae_params, vis01 * 2 - 1, vae_cfg)
        mask_rgb = jnp.broadcast_to(m01, vis01.shape)
        mask_latent = vae_encode_mode(vae_params, mask_rgb * 2 - 1,
                                      vae_cfg)
        cond = jnp.concatenate([img_latent, mask_latent], axis=-1)
        clip_in = resize2d(vis01, size=(clip_cfg.image_size,
                                        clip_cfg.image_size),
                           method="bilinear")
        ctx = clip_image_embed(clip, clip_cfg,
                               (clip_in - clip_mean) / clip_std)[:, None]
        # 10% CFG dropout: zero BOTH conditionings together (the serving
        # uncond branch zeroes ctx and the concat latent jointly)
        drop = (jax.random.uniform(k_drop, (b, 1, 1)) < 0.1)
        ctx = jnp.where(drop, jnp.broadcast_to(uncond_ctx, ctx.shape), ctx)
        cond = jnp.where(drop[..., None], 0.0, cond)
        target_latent = vae_encode_mode(vae_params, whole01 * 2 - 1,
                                        vae_cfg)
        t = jax.random.randint(k_t, (b,), 0, 1000)
        noise = jax.random.normal(k_noise, target_latent.shape,
                                  target_latent.dtype)
        noisy = ddpm_add_noise(alphas, target_latent, noise, t)
        pred = apply_unet(unet_p, p2g_cfg.unet, noisy,
                          t.astype(jnp.float32), context=cond,
                          context_ca=ctx, attn_impl="xla")
        return jnp.mean((pred - noise) ** 2)

    @jax.jit
    def step(unet_p, s, vis01, m01, whole01, rng):
        loss, g = jax.value_and_grad(loss_fn)(unet_p, vis01, m01, whole01,
                                              rng)
        updates, s = tx.update(g, s, unet_p)
        return optax.apply_updates(unet_p, updates), s, loss

    rng = np.random.default_rng(seed)
    n = rgbs.shape[0]
    losses = []
    for it in range(steps):
        idx = rng.choice(n, size=min(batch, n), replace=False)
        unet, opt_state, loss = step(
            unet, opt_state, jnp.asarray(rgbs[idx], jnp.float32),
            jnp.asarray(mask01[idx], jnp.float32),
            jnp.asarray(whole_rgbs[idx], jnp.float32),
            jax.random.fold_in(jax.random.PRNGKey(seed + 3), it))
        losses.append(float(loss))
        if it % 50 == 0 or it == steps - 1:
            print(f"[p2g] step {it} eps_mse {float(loss):.4f}", flush=True)

    params = {"unet": unet, "vae": vae_params, "clip": clip,
              "uncond_ctx": uncond_ctx}
    os.makedirs(out, exist_ok=True)
    save_params_npz(os.path.join(out, "p2g.npz"), params)
    first, last = (float(np.mean(losses[:50])),
                   float(np.mean(losses[-50:])))
    meta = {"family": "p2g",
            "p2g_cfg": dataclasses_asdict(p2g_cfg),
            "clip_cfg": dataclasses_asdict(clip_cfg),
            "vae_cfg": dataclasses_asdict(vae_cfg),
            "size": size, "steps": steps, "batch": batch, "lr": lr,
            "seed": seed, "style": "scenes",
            "vae_recon_l1": vae_l1, "vae_latent_std": vae_lstd,
            "eps_mse_first50_mean": first, "eps_mse_last50_mean": last}
    with open(os.path.join(out, "p2g_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))
    if not last < 0.9 * first:
        print(f"WARNING: p2g proxy under-trained (eps_mse {first:.4f} -> "
              f"{last:.4f}) — gate verdicts unreliable")
    return params


def dataclasses_asdict(obj) -> dict:
    import dataclasses as _dc
    return _dc.asdict(obj)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="checkpoints/proxy")
    ap.add_argument("--family", default="flagship",
                    choices=["flagship", "depthfm", "p2g", "all"])
    ap.add_argument("--encoder", default="vitp")
    ap.add_argument("--size", type=int, default=112,
                    help="train resolution (multiple of 14 for flagship; "
                         "multiple of 8 for the generative families)")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data-n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default=None,
                    help="reuse an existing scenes tree")
    args = ap.parse_args(argv)

    if args.family in ("depthfm", "p2g", "all"):
        root = args.data_dir or os.path.join(
            tempfile.gettempdir(), f"proxy_scenes_{args.data_n}"
            f"_{args.size}_{args.seed}")
        list_path = os.path.join(root, "train.txt")
        if not os.path.exists(list_path):
            from ..data.synthetic import make_synthetic_sam_tree
            list_path = make_synthetic_sam_tree(root, n=args.data_n,
                                                hw=args.size,
                                                seed=args.seed,
                                                style="scenes")
        if args.family in ("depthfm", "all"):
            train_depthfm_proxy(root, list_path, args.out, size=args.size,
                                steps=args.steps, batch=args.batch,
                                lr=args.lr, seed=args.seed)
        if args.family in ("p2g", "all"):
            train_p2g_proxy(root, list_path, args.out, size=args.size,
                            steps=args.steps, batch=args.batch,
                            lr=args.lr, seed=args.seed)
        if args.family != "all":
            return

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
