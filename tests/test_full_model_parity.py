"""FULL-MODEL golden parity: AmodalDAv2 (tiny) vs an independently-built
torch composition, sharing weights through the converter.

This is the end-to-end version of the block-level golden tests: a torch
model with the reference's topology is assembled here from torch.nn
primitives, loaded with the same state dict our converter ingests, and
both forwards must agree to ~1e-4. It validates the converter key
mapping, every layout transpose, the pos-embed path, the guided patch
embedding, the DPT reassemble/fusion stack, and the align_corners
upsampling — composed, not in isolation."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.convert.torch_to_jax import convert_dav2
from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                          apply_amodal_dav2)
from tests.test_models import _fake_torch_sd

HW = 56  # 4x4 patch grid at patch 14


class TorchTinyGuidedDAV2(nn.Module):
    """Reference-topology torch twin of our vitt AmodalDAv2."""

    def __init__(self, d=64, depth=4, heads=2, guide_ch=2,
                 taps=(0, 1, 2, 3), out_channels=(8, 16, 32, 32), feat=16):
        super().__init__()
        self.d, self.heads, self.taps = d, heads, taps
        self.patch = nn.Conv2d(3, d, 14, 14)
        self.patch_guidance = nn.Conv2d(guide_ch, d, 14, 14)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, 37 * 37 + 1, d))
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(d, eps=1e-6)
            blk.qkv = nn.Linear(d, 3 * d)
            blk.proj = nn.Linear(d, d)
            blk.ls1 = nn.Parameter(torch.ones(d))
            blk.norm2 = nn.LayerNorm(d, eps=1e-6)
            blk.fc1 = nn.Linear(d, 4 * d)
            blk.fc2 = nn.Linear(4 * d, d)
            blk.ls2 = nn.Parameter(torch.ones(d))
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(d, eps=1e-6)

        self.projects = nn.ModuleList(
            [nn.Conv2d(d, c, 1) for c in out_channels])
        self.resize0 = nn.ConvTranspose2d(out_channels[0], out_channels[0],
                                          4, 4)
        self.resize1 = nn.ConvTranspose2d(out_channels[1], out_channels[1],
                                          2, 2)
        self.resize3 = nn.Conv2d(out_channels[3], out_channels[3], 3, 2, 1)
        self.inproj_conv = nn.ModuleList(
            [nn.Conv2d(c, c, 3, padding=1) for c in out_channels])
        self.inproj_ln = nn.ParameterList()
        for c in out_channels:
            p = nn.Module()
            p.weight = nn.Parameter(torch.ones(c))
            p.bias = nn.Parameter(torch.zeros(c))
            self.inproj_ln.append(p.weight)  # placeholder; real params below
        self.inproj_ln_w = nn.ParameterList(
            [nn.Parameter(torch.ones(c)) for c in out_channels])
        self.inproj_ln_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(c)) for c in out_channels])
        self.rn = nn.ModuleList(
            [nn.Conv2d(c, feat, 3, padding=1, bias=False)
             for c in out_channels])
        self.refine = nn.ModuleList()
        for _ in range(4):
            r = nn.Module()
            r.rcu1c1 = nn.Conv2d(feat, feat, 3, padding=1)
            r.rcu1c2 = nn.Conv2d(feat, feat, 3, padding=1)
            r.rcu2c1 = nn.Conv2d(feat, feat, 3, padding=1)
            r.rcu2c2 = nn.Conv2d(feat, feat, 3, padding=1)
            r.out_conv = nn.Conv2d(feat, feat, 1)
            self.refine.append(r)
        self.out_conv1 = nn.Conv2d(feat, feat // 2, 3, padding=1)
        self.out_conv2a = nn.Conv2d(feat // 2, 32, 3, padding=1)
        self.out_conv2b = nn.Conv2d(32, 1, 1)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(-1, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(-1, 1, 1)
        self.register_buffer("mean", mean)
        self.register_buffer("std", std)

    def _ln2d(self, x, w, b):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return w[:, None, None] * x + b[:, None, None]

    def _rcu(self, x, c1, c2):
        out = c1(F.relu(x))
        out = c2(F.relu(out))
        return out + x

    def _fusion(self, r, x, skip, size):
        out = x
        if skip is not None:
            out = out + self._rcu(skip, r.rcu1c1, r.rcu1c2)
        out = self._rcu(out, r.rcu2c1, r.rcu2c2)
        if size is None:
            out = F.interpolate(out, scale_factor=2, mode="bilinear",
                                align_corners=True)
        else:
            out = F.interpolate(out, size=size, mode="bilinear",
                                align_corners=True)
        return r.out_conv(out)

    def forward(self, x, guide):
        x = (x - self.mean) / self.std
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = t + self.patch_guidance(guide).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(t.shape[0], -1, -1), t], dim=1)
        # pos-embed: 37x37 checkpoint grid -> 4x4 via reference bicubic path
        npatch, n0 = t.shape[1] - 1, self.pos_embed.shape[1] - 1
        cls_pe, patch_pe = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        g0 = int(n0 ** 0.5)
        g = int(npatch ** 0.5)
        sx = (g + 0.1) / (n0 ** 0.5)
        grid = patch_pe.reshape(1, g0, g0, -1).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, scale_factor=(sx, sx), mode="bicubic",
                             align_corners=False)
        pe = torch.cat([cls_pe,
                        grid.permute(0, 2, 3, 1).reshape(1, -1, self.d)], 1)
        t = t + pe

        feats = []
        for i, blk in enumerate(self.blocks):
            h = blk.norm1(t)
            b_, n_, c_ = h.shape
            qkv = blk.qkv(h).reshape(b_, n_, 3, self.heads,
                                     c_ // self.heads).permute(2, 0, 3, 1, 4)
            att = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
            att = att.permute(0, 2, 1, 3).reshape(b_, n_, c_)
            t = t + blk.proj(att) * blk.ls1
            h = blk.fc2(F.gelu(blk.fc1(blk.norm2(t))))
            t = t + h * blk.ls2
            if i in self.taps:
                feats.append(self.norm(t))

        g = int((t.shape[1] - 1) ** 0.5)
        outs = []
        for i, f in enumerate(feats):
            fm = f[:, 1:].permute(0, 2, 1).reshape(f.shape[0], self.d, g, g)
            fm = self.projects[i](fm)
            if i == 0:
                fm = self.resize0(fm)
            elif i == 1:
                fm = self.resize1(fm)
            elif i == 3:
                fm = self.resize3(fm)
            fm = F.relu(self._ln2d(self.inproj_conv[i](fm),
                                   self.inproj_ln_w[i], self.inproj_ln_b[i]))
            outs.append(self.rn[i](fm))
        l1, l2, l3, l4 = outs
        p4 = self._fusion(self.refine[3], l4, None, l3.shape[2:])
        p3 = self._fusion(self.refine[2], p4, l3, l2.shape[2:])
        p2 = self._fusion(self.refine[1], p3, l2, l1.shape[2:])
        p1 = self._fusion(self.refine[0], p2, l1, None)
        out = self.out_conv1(p1)
        out = F.interpolate(out, (g * 14, g * 14), mode="bilinear",
                            align_corners=True)
        out = self.out_conv2b(F.relu(self.out_conv2a(out)))
        return torch.sigmoid(out)


def _load_torch_twin(model: TorchTinyGuidedDAV2, sd: dict):
    pt = {
        "patch.weight": "encoder.pretrained.patch_embed.proj.weight",
        "patch.bias": "encoder.pretrained.patch_embed.proj.bias",
        "patch_guidance.weight":
            "encoder.pretrained.patch_embed_guidance.proj.weight",
        "patch_guidance.bias":
            "encoder.pretrained.patch_embed_guidance.proj.bias",
        "cls_token": "encoder.pretrained.cls_token",
        "pos_embed": "encoder.pretrained.pos_embed",
        "norm.weight": "encoder.pretrained.norm.weight",
        "norm.bias": "encoder.pretrained.norm.bias",
        "out_conv1.weight": "encoder.depth_head.scratch.output_conv1.weight",
        "out_conv1.bias": "encoder.depth_head.scratch.output_conv1.bias",
        "out_conv2a.weight": "encoder.depth_head.scratch.output_conv2.0.weight",
        "out_conv2a.bias": "encoder.depth_head.scratch.output_conv2.0.bias",
        "out_conv2b.weight": "encoder.depth_head.scratch.output_conv2.2.weight",
        "out_conv2b.bias": "encoder.depth_head.scratch.output_conv2.2.bias",
        "resize0.weight": "encoder.depth_head.resize_layers.0.weight",
        "resize0.bias": "encoder.depth_head.resize_layers.0.bias",
        "resize1.weight": "encoder.depth_head.resize_layers.1.weight",
        "resize1.bias": "encoder.depth_head.resize_layers.1.bias",
        "resize3.weight": "encoder.depth_head.resize_layers.3.weight",
        "resize3.bias": "encoder.depth_head.resize_layers.3.bias",
    }
    for i in range(len(model.blocks)):
        b = f"encoder.pretrained.blocks.{i}"
        pt.update({
            f"blocks.{i}.norm1.weight": f"{b}.norm1.weight",
            f"blocks.{i}.norm1.bias": f"{b}.norm1.bias",
            f"blocks.{i}.qkv.weight": f"{b}.attn.qkv.weight",
            f"blocks.{i}.qkv.bias": f"{b}.attn.qkv.bias",
            f"blocks.{i}.proj.weight": f"{b}.attn.proj.weight",
            f"blocks.{i}.proj.bias": f"{b}.attn.proj.bias",
            f"blocks.{i}.ls1": f"{b}.ls1.gamma",
            f"blocks.{i}.norm2.weight": f"{b}.norm2.weight",
            f"blocks.{i}.norm2.bias": f"{b}.norm2.bias",
            f"blocks.{i}.fc1.weight": f"{b}.mlp.fc1.weight",
            f"blocks.{i}.fc1.bias": f"{b}.mlp.fc1.bias",
            f"blocks.{i}.fc2.weight": f"{b}.mlp.fc2.weight",
            f"blocks.{i}.fc2.bias": f"{b}.mlp.fc2.bias",
            f"blocks.{i}.ls2": f"{b}.ls2.gamma",
        })
    hp = "encoder.depth_head"
    for i in range(4):
        pt.update({
            f"projects.{i}.weight": f"{hp}.projects.{i}.weight",
            f"projects.{i}.bias": f"{hp}.projects.{i}.bias",
            f"inproj_conv.{i}.weight": f"{hp}.input_projection.{i}.0.weight",
            f"inproj_conv.{i}.bias": f"{hp}.input_projection.{i}.0.bias",
            f"inproj_ln_w.{i}": f"{hp}.input_projection.{i}.1.weight",
            f"inproj_ln_b.{i}": f"{hp}.input_projection.{i}.1.bias",
            f"rn.{i}.weight": f"{hp}.scratch.layer{i + 1}_rn.weight",
        })
        r = f"{hp}.scratch.refinenet{i + 1}"
        pt.update({
            f"refine.{i}.rcu1c1.weight": f"{r}.resConfUnit1.conv1.weight",
            f"refine.{i}.rcu1c1.bias": f"{r}.resConfUnit1.conv1.bias",
            f"refine.{i}.rcu1c2.weight": f"{r}.resConfUnit1.conv2.weight",
            f"refine.{i}.rcu1c2.bias": f"{r}.resConfUnit1.conv2.bias",
            f"refine.{i}.rcu2c1.weight": f"{r}.resConfUnit2.conv1.weight",
            f"refine.{i}.rcu2c1.bias": f"{r}.resConfUnit2.conv1.bias",
            f"refine.{i}.rcu2c2.weight": f"{r}.resConfUnit2.conv2.weight",
            f"refine.{i}.rcu2c2.bias": f"{r}.resConfUnit2.conv2.bias",
            f"refine.{i}.out_conv.weight": f"{r}.out_conv.weight",
            f"refine.{i}.out_conv.bias": f"{r}.out_conv.bias",
        })
    state = {k: torch.from_numpy(np.asarray(sd[v])) for k, v in pt.items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    # placeholder ParameterList from __init__ is unused
    assert not unexpected, unexpected
    return model


def test_full_model_matches_torch_twin(rng):
    cfg = DAV2Config(encoder="vitt", guide_type="mask+observation")
    sd, jax_params = _fake_torch_sd(cfg, seed=7)

    twin = TorchTinyGuidedDAV2()
    _load_torch_twin(twin, sd)
    twin.eval()

    x = rng.random((1, HW, HW, 3), dtype=np.float32)
    m = (rng.random((1, HW, HW, 1)) > 0.5).astype(np.float32) * 2 - 1
    o = rng.random((1, HW, HW, 1), dtype=np.float32) * 2 - 1

    ours = np.asarray(apply_amodal_dav2(
        jax.tree.map(jnp.asarray, jax_params), cfg, jnp.asarray(x),
        guide_mask=jnp.asarray(m), observation=jnp.asarray(o),
        attn_impl="xla"))[..., 0]

    with torch.no_grad():
        guide = np.concatenate([m, o], axis=-1)
        theirs = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(guide.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy()[:, 0]

    diff = np.abs(ours - theirs)
    assert diff.max() < 1e-4, f"max diff {diff.max()}"
