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


DUMPERS = {
    "amodal_dav2_vits": dump_amodal_dav2_vits,
    "raw_dav2_vits_rect": dump_raw_dav2_vits_rect,
    "amodal_dav2_vits_ssi": dump_amodal_dav2_vits_ssi,
    "raw_dav2_vits": dump_raw_dav2_vits,
    "depthfm_unet_tiny": dump_depthfm_unet_tiny,
}


def main():
    model_key, out_path = sys.argv[1], sys.argv[2]
    _install_stubs()
    DUMPERS[model_key](out_path)


if __name__ == "__main__":
    main()
