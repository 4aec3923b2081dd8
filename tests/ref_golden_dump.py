"""Dump golden activations from the ACTUAL reference implementation.

Runs the real torch model classes shipped in /root/reference (CPU, random
but seeded weights), and writes an .npz with the inputs, the reference
output, and the full state dict — which `tests/test_reference_golden.py`
pushes through our converters and compares against our JAX forward.

This is the CI-grade version of the hand-built "torch twin" in
`test_full_model_parity.py`: the topology under test is the reference's
own code (`src/models/amodalsynthdrive/dav2.py`,
`depth_anything_v2/dpt.py`, `depth_anything_v2_raw/dpt.py`), not a
re-implementation of it.

Run in a SUBPROCESS only: the reference imports deps this image lacks
(timm, torchvision, diffusers, torchdiffeq, xformers); we satisfy them
with inert module stubs that must not leak into the pytest process.

Usage: python ref_golden_dump.py {amodal_dav2_vits|raw_dav2_vits} OUT.npz
"""

import sys
import types
import warnings

REFERENCE = "/root/reference"
HW = 56  # 4x4 patch grid at patch size 14
SEED = 42


def _install_stubs():
    warnings.filterwarnings("ignore")

    def stub(name, **attrs):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    stub("torchdiffeq", odeint=lambda *a, **k: None)
    # NOTE: do NOT stub xformers — the reference guards every use with a
    # real-import try/except and falls back to its native attention; a stub
    # module would flip the gate to True and then fail at call time.
    stub("wandb")
    stub("tensorboardX")
    stub("diffusers")
    stub("timm")
    oc = stub("omegaconf")
    oc.listconfig = stub("omegaconf.listconfig", ListConfig=type("LC", (), {}))
    tv = stub("torchvision")
    tv.transforms = stub("torchvision.transforms", Compose=lambda ts: ts)
    # image_util.py imports `torchvision.transforms.functional.resize` at
    # module top; only resize_max_res (not on our golden paths) calls it
    tv.transforms.functional = stub("torchvision.transforms.functional",
                                    resize=None)
    tv.transforms.InterpolationMode = types.SimpleNamespace(
        NEAREST="nearest", BILINEAR="bilinear", BICUBIC="bicubic")

    sys.path.insert(0, REFERENCE)
    import importlib

    importlib.import_module("src")
    # Bypass src/models/__init__.py: it eagerly imports the depthfm and
    # deeplab families, whose top-level imports (diffusers.AutoencoderKL
    # used at class scope, timm model zoo) the stubs can't satisfy.
    for pkg in ["src.models", "src.models.amodalsynthdrive",
                "src.models.depthfm"]:
        mod = types.ModuleType(pkg)
        mod.__path__ = [f"{REFERENCE}/{pkg.replace('.', '/')}"]
        sys.modules[pkg] = mod


def _randomize(model, seed=SEED):
    """Seeded re-init so the golden exercises every path with O(1) signal.

    The defaults are useless for a golden: AmodalDAv2.__init__ zeroes the
    guidance patch embed (dav2.py:56-62) and torch's default init drives a
    12-layer trunk's output into sigmoid's flat region. Scale-1 LayerNorm /
    LayerScale weights keep the residual stream alive; everything else gets
    N(0, 0.05)."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            noise = torch.randn(p.shape, generator=gen)
            # 1-d ".weight" params are LayerNorm/GroupNorm scales (Linear/
            # Conv weights are >=2-d); keep them near 1 so the residual
            # stream stays alive through deep trunks.
            is_scale = p.ndim == 1 and (name.endswith("weight")
                                        or name.endswith("gamma"))
            if is_scale:
                p.copy_(1.0 + 0.2 * noise)
            elif "output_conv2.2" in name:
                # final head conv: large init keeps the sigmoid output off
                # its flat region so the comparison is discriminating
                p.copy_(noise)
            else:
                p.copy_(0.05 * noise)


def dump_amodal_dav2_vits(out_path):
    import numpy as np
    import torch

    from src.models.amodalsynthdrive.dav2 import AmodalDAv2

    model = AmodalDAv2(encoder="vits", guide_type="mask+observation",
                       loss_stategy="entire_target_object", pretrained=False)
    _randomize(model)
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 1)
    x = torch.rand(1, 3, HW, HW, generator=gen)
    gm = ((torch.rand(1, 1, HW, HW, generator=gen) > 0.5).float() * 2 - 1)
    ob = torch.rand(1, 1, HW, HW, generator=gen) * 2 - 1
    with torch.no_grad():
        out = model(x, guide_mask=gm, observation=ob)

    arrays = {"in.x": x.numpy(), "in.guide_mask": gm.numpy(),
              "in.observation": ob.numpy(), "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"amodal_dav2_vits: out std {float(out.std()):.5f}")


def dump_amodal_dav2_vits_ssi(out_path):
    """ssi loss strategy (linear head, dpt.py:138-144) + the 5-channel
    image+mask+observation guidance concat (dav2.py:68-69)."""
    import numpy as np
    import torch

    from src.models.amodalsynthdrive.dav2 import AmodalDAv2

    model = AmodalDAv2(encoder="vits", guide_type="image+mask+observation",
                       loss_stategy="ssi invisible_part", pretrained=False)
    _randomize(model, SEED + 10)
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 11)
    x = torch.rand(1, 3, HW, HW, generator=gen)
    grgb = torch.rand(1, 3, HW, HW, generator=gen) * 2 - 1
    gm = ((torch.rand(1, 1, HW, HW, generator=gen) > 0.5).float() * 2 - 1)
    ob = torch.rand(1, 1, HW, HW, generator=gen) * 2 - 1
    with torch.no_grad():
        out = model(x, guide_rgb=grgb, guide_mask=gm, observation=ob)

    arrays = {"in.x": x.numpy(), "in.guide_rgb": grgb.numpy(),
              "in.guide_mask": gm.numpy(), "in.observation": ob.numpy(),
              "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"amodal_dav2_vits_ssi: out std {float(out.std()):.5f}")


def dump_raw_dav2_vits(out_path):
    import numpy as np
    import torch

    from src.models.amodalsynthdrive.depth_anything_v2_raw.dpt import (
        DepthAnythingV2)

    model = DepthAnythingV2(encoder="vits", features=64,
                            out_channels=[48, 96, 192, 384])
    _randomize(model)
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 2)
    x = torch.rand(1, 3, HW, HW, generator=gen)
    # the reference raw path normalizes on the host (infer.py:19) before
    # forward; our apply_raw_dav2 folds the normalization into the graph,
    # so the golden stores the UN-normalized image and normalizes here.
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        out = model((x - mean) / std)

    arrays = {"in.x": x.numpy(), "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"raw_dav2_vits: out std {float(out.std()):.5f}")


def dump_depthfm_unet_tiny(out_path):
    import numpy as np
    import torch

    # src/models/depthfm/unet/__init__.py path-hacks its own dir onto
    # sys.path so openaimodel's flat imports (`from util import ...`)
    # resolve; go through it like dfm.py does (dfm.py:9).
    from src.models.depthfm.unet import UNetModel

    # tiny version of the DepthFM hparams (dfm.py:30 `**ckpt['ldm_hparams']`,
    # SD-2 UNet shape): latent+conditioning concat input, spatial
    # transformer with linear projections, cross-attention context.
    model = UNetModel(
        image_size=8, in_channels=8, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, use_linear_in_transformer=True)
    _randomize(model)
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 3)
    x = torch.randn(1, 8, 16, 16, generator=gen)
    t = torch.tensor([3.0])
    ctx = torch.randn(1, 5, 16, generator=gen)
    with torch.no_grad():
        out = model(x, t=t, context_ca=ctx)

    arrays = {"in.x": x.numpy(), "in.t": t.numpy(), "in.ctx": ctx.numpy(),
              "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"depthfm_unet_tiny: out std {float(out.std()):.5f}")


def dump_raw_dav2_vits_rect(out_path):
    """Rectangular input (56x84 -> 4x6 patch grid): exercises the
    aspect-aware bicubic pos-embed interpolation (dinov2.py:199-230)."""
    import numpy as np
    import torch

    from src.models.amodalsynthdrive.depth_anything_v2_raw.dpt import (
        DepthAnythingV2)

    model = DepthAnythingV2(encoder="vits", features=64,
                            out_channels=[48, 96, 192, 384])
    _randomize(model, SEED + 20)
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 21)
    x = torch.rand(1, 3, 56, 84, generator=gen)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        out = model((x - mean) / std)

    arrays = {"in.x": x.numpy(), "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"raw_dav2_vits_rect: out std {float(out.std()):.5f}")


def _narrow_factory(dmod, embed_dim, num_heads, depth):
    """Factory returning the reference's own DinoVisionTransformer at a
    narrow width but the NAMED architecture's depth — so the guided/raw
    wrappers' hardcoded tap indices and ffn selection run unmodified at
    CPU-affordable cost. Heads follow the embed_dim//32 convention the
    converter assumes for nonstandard widths."""
    from functools import partial

    def factory(patch_size=16, num_register_tokens=0, guide_type=None, **kw):
        extra = {} if guide_type is None and "guide_type" not in kw else \
            {"guide_type": guide_type}
        return dmod.DinoVisionTransformer(
            patch_size=patch_size, embed_dim=embed_dim, depth=depth,
            num_heads=num_heads, mlp_ratio=4,
            block_fn=partial(dmod.Block, attn_class=dmod.MemEffAttention),
            num_register_tokens=num_register_tokens, **extra, **kw)

    return factory


def dump_amodal_dav2_vitl_narrow(out_path):
    """Guided AmodalDAv2 with encoder='vitl': the RELEASED checkpoint's
    depth (24 layers) and tap indices [4,11,17,23] (dpt.py:213-218) at
    width 128. The wrapper code under test is byte-identical to what runs
    the published model; only DinoVisionTransformer's width argument
    shrinks."""
    import numpy as np
    import torch

    import src.models.amodalsynthdrive.depth_anything_v2.dinov2 as dmod
    from src.models.amodalsynthdrive.dav2 import AmodalDAv2

    dmod.vit_large = _narrow_factory(dmod, 128, 4, 24)
    model = AmodalDAv2(encoder="vitl", guide_type="mask+observation",
                       loss_stategy="entire_target_object", pretrained=False)
    _randomize(model, SEED + 30)
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 31)
    x = torch.rand(1, 3, HW, HW, generator=gen)
    gm = ((torch.rand(1, 1, HW, HW, generator=gen) > 0.5).float() * 2 - 1)
    ob = torch.rand(1, 1, HW, HW, generator=gen) * 2 - 1
    with torch.no_grad():
        out = model(x, guide_mask=gm, observation=ob)

    arrays = {"in.x": x.numpy(), "in.guide_mask": gm.numpy(),
              "in.observation": ob.numpy(), "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"amodal_dav2_vitl_narrow: out std {float(out.std()):.5f}")


def dump_raw_dav2_vitg_narrow(out_path):
    """Raw DAV2 with encoder='vitg': the released BASE model's depth (40
    layers), swiglufused ffn, taps [9,19,29,39], and its real head shape
    (features=384, out_channels=[1536]*4, infer.py:60) at trunk width
    128."""
    import numpy as np
    import torch

    import src.models.amodalsynthdrive.depth_anything_v2_raw.dinov2 as dmod
    from src.models.amodalsynthdrive.depth_anything_v2_raw.dpt import (
        DepthAnythingV2)

    dmod.vit_giant2 = _narrow_factory(dmod, 128, 4, 40)
    model = DepthAnythingV2(encoder="vitg", features=384,
                            out_channels=[1536, 1536, 1536, 1536])
    _randomize(model, SEED + 40)
    # the 1536-channel head explodes under the flat 0.05 init (variance
    # grows ~0.05^2 * fan per conv; 40-layer stack + ReLU head reached
    # std ~1.5e4): rescale >=2-d weights to variance 1/fan_in so
    # activations stay O(1) and the 5e-4 absolute gate is meaningful
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.mul_(1.0 / (0.05 * (fan_in ** 0.5)))
    model.eval()

    gen = torch.Generator().manual_seed(SEED + 41)
    x = torch.rand(1, 3, HW, HW, generator=gen)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        out = model((x - mean) / std)

    arrays = {"in.x": x.numpy(), "out": out.numpy()}
    arrays.update({f"sd.{k}": v.numpy() for k, v in model.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"raw_dav2_vitg_narrow: out std {float(out.std()):.5f}")


def dump_infer_chain(out_path):
    """FULL-CHAIN golden: run the reference's ACTUAL `infer_single_image`
    (infer.py:71-121) — cv2 preprocessing, predict_base_depth, guided
    forward, median_filter_blend, colorize, highlight, imwrite — on the
    shipped asset image+mask with seeded vits/vits weights. Dumps both
    float maps (captured at the colorize calls), both rendered BGR
    arrays, and both state dicts.

    Environment shims (library stand-ins, not reference logic):
      * `.cuda()` -> identity (no GPU in this image);
      * torchvision Resize(NEAREST) -> F.interpolate(mode='nearest')
        (torchvision's own tensor path is exactly this call).
    """
    import importlib.util

    import numpy as np
    import torch
    import torch.nn.functional as F

    # torchvision stand-in BEFORE importing infer.py
    tv_t = sys.modules["torchvision.transforms"]

    class _Resize:
        def __init__(self, size, interpolation=None):
            self.size = size

        def __call__(self, x):
            return F.interpolate(x, self.size, mode="nearest")

    tv_t.Resize = _Resize

    # `from src.models import get_model` must resolve on the synthetic
    # src.models package the stubs installed
    def get_model(name, **kw):
        assert name == "AmodalDAv2"
        from src.models.amodalsynthdrive.dav2 import AmodalDAv2
        return AmodalDAv2(**kw)

    sys.modules["src.models"].get_model = get_model
    torch.Tensor.cuda = lambda self, *a, **k: self

    spec = importlib.util.spec_from_file_location(
        "ref_infer", f"{REFERENCE}/infer.py")
    ref_infer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_infer)

    from src.models.amodalsynthdrive.dav2 import AmodalDAv2
    from src.models.amodalsynthdrive.depth_anything_v2_raw.dpt import (
        DepthAnythingV2)

    # checkpoint-day mode (scripts/verify_checkpoints.py): GOLDEN_RAW_CKPT
    # / GOLDEN_AMODAL_CKPT point at REAL weights — the reference chain
    # then runs the published models and the <1e-3 gate is the actual
    # BASELINE.json north star, not a seeded-weights proxy.
    import os
    raw_ckpt = os.environ.get("GOLDEN_RAW_CKPT")
    amodal_ckpt = os.environ.get("GOLDEN_AMODAL_CKPT")
    # GOLDEN_NARROW=1: run the chain at the RELEASED topology (vitg-40L
    # swiglu base + vitl-24L amodal, the infer.py:59-66 pairing) at
    # width 128 via the narrow factories — tap indices, swiglu ffn and
    # both wrappers exercised through the full chain
    narrow = os.environ.get("GOLDEN_NARROW", "") == "1"
    if narrow:
        import src.models.amodalsynthdrive.depth_anything_v2.dinov2 as gmod
        import src.models.amodalsynthdrive.depth_anything_v2_raw.dinov2 \
            as rmod
        gmod.vit_large = _narrow_factory(gmod, 128, 4, 24)
        rmod.vit_giant2 = _narrow_factory(rmod, 128, 4, 40)

    raw_presets = {"vits": (64, [48, 96, 192, 384]),
                   "vitb": (128, [96, 192, 384, 768]),
                   "vitl": (256, [256, 512, 1024, 1024]),
                   "vitg": (384, [1536, 1536, 1536, 1536])}
    enc_by_dim = {384: "vits", 768: "vitb", 1024: "vitl", 1536: "vitg"}

    def _load_sd(path):
        if path.endswith(".safetensors"):
            from safetensors.torch import load_file
            return load_file(path)
        return torch.load(path, map_location="cpu")

    if raw_ckpt:
        sd = _load_sd(raw_ckpt)
        enc = enc_by_dim[sd["pretrained.cls_token"].shape[-1]]
        feats, ocs = raw_presets[enc]
        model_raw = DepthAnythingV2(encoder=enc, features=feats,
                                    out_channels=ocs)
        # reference loads the base with strict=False (infer.py:61)
        model_raw.load_state_dict(sd, strict=False)
    elif narrow:
        # the released base's arch: vitg (features=384, [1536]*4,
        # infer.py:60), narrow trunk width
        model_raw = DepthAnythingV2(encoder="vitg", features=384,
                                    out_channels=[1536, 1536, 1536, 1536])
        _randomize(model_raw, SEED + 60)
        with torch.no_grad():
            for p in model_raw.parameters():
                if p.ndim >= 2:
                    fan_in = int(np.prod(p.shape[1:]))
                    p.mul_(1.0 / (0.05 * (fan_in ** 0.5)))
    else:
        model_raw = DepthAnythingV2(encoder="vits", features=64,
                                    out_channels=[48, 96, 192, 384])
        _randomize(model_raw, SEED + 50)
    model_raw.eval()

    if amodal_ckpt:
        sd = _load_sd(amodal_ckpt)
        enc = enc_by_dim[sd["encoder.pretrained.cls_token"].shape[-1]]
        gc = sd["encoder.pretrained.patch_embed_guidance.proj.weight"].shape[1]
        gt = {2: "mask+observation", 1: "mask", 4: "image+mask",
              5: "image+mask+observation"}[gc]
        amodal = AmodalDAv2(encoder=enc, guide_type=gt,
                            loss_stategy="entire_target_object",
                            pretrained=False)
        amodal.load_state_dict(sd, strict=True)
    else:
        # released amodal arch is vitl (infer.py:66)
        enc = "vitl" if narrow else "vits"
        amodal = AmodalDAv2(encoder=enc, guide_type="mask+observation",
                            loss_stategy="entire_target_object",
                            pretrained=False)
        _randomize(amodal, SEED + 61 if narrow else SEED + 51)
        if narrow:
            # fan-scaled weights keep the deep narrow trunk's Lipschitz
            # constant near trained-weight territory, so f32 rounding
            # noise is not amplified past the 1e-3 gate
            with torch.no_grad():
                for p in amodal.parameters():
                    if p.ndim >= 2:
                        fan_in = int(np.prod(p.shape[1:]))
                        p.mul_(1.0 / (0.05 * (fan_in ** 0.5)))
    amodal.eval()

    # predict_base_depth reads the module-global `model_raw` (infer.py:20)
    ref_infer.model_raw = model_raw

    floats = []
    orig_colorize = ref_infer.colorize_depth_maps

    def recording_colorize(depth, *a, **k):
        floats.append(np.array(depth, np.float64, copy=True))
        return orig_colorize(depth, *a, **k)

    ref_infer.colorize_depth_maps = recording_colorize

    img_path = os.environ.get(
        "GOLDEN_IMAGE", f"{REFERENCE}/assets/inference_examples/case1.jpg")
    mask_path = os.environ.get(
        "GOLDEN_MASK", f"{REFERENCE}/assets/inference_masks/case1_mask.png")
    import tempfile
    with tempfile.TemporaryDirectory() as out_dir, torch.no_grad():
        render_raw, render_amodal = ref_infer.infer_single_image(
            img_path, mask_path, out_dir, model_raw, amodal)

    assert len(floats) == 2, f"expected 2 colorize calls, saw {len(floats)}"
    arrays = {
        "base_float": floats[0], "blended_float": floats[1],
        "render_raw": render_raw, "render_amodal": render_amodal,
    }
    if not (raw_ckpt and amodal_ckpt):
        # real-checkpoint mode skips the (possibly multi-GB) state-dict
        # copy — the caller already holds the weight files
        arrays.update({f"sdraw.{k}": v.numpy()
                       for k, v in model_raw.state_dict().items()})
        arrays.update({f"sdam.{k}": v.numpy()
                       for k, v in amodal.state_dict().items()})
    np.savez(out_path, **arrays)
    print(f"infer_chain: blended std {floats[1].std():.5f}")


DUMPERS = {
    "amodal_dav2_vits": dump_amodal_dav2_vits,
    "raw_dav2_vits_rect": dump_raw_dav2_vits_rect,
    "amodal_dav2_vits_ssi": dump_amodal_dav2_vits_ssi,
    "raw_dav2_vits": dump_raw_dav2_vits,
    "depthfm_unet_tiny": dump_depthfm_unet_tiny,
    "amodal_dav2_vitl_narrow": dump_amodal_dav2_vitl_narrow,
    "raw_dav2_vitg_narrow": dump_raw_dav2_vitg_narrow,
    "infer_chain": dump_infer_chain,
}


def main():
    model_key, out_path = sys.argv[1], sys.argv[2]
    _install_stubs()
    DUMPERS[model_key](out_path)


if __name__ == "__main__":
    main()
