"""jo_amodal plain U-Net goldens vs an inline torch build of the reference
topology (unet_model.py / unet_parts.py) — conv/BN/ReLU double blocks,
maxpool downs, bilinear align_corners ups with odd-size padding + skip
concat, 1x1 out conv."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models import get_model
from amodal_depth_anything_tpu.models.jo_unet import (JoUNetConfig,
                                                      apply_jo_unet,
                                                      init_jo_unet)


class _DoubleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))

    def forward(self, x):
        return self.conv(x)


class _Up(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = nn.Upsample(scale_factor=2, mode="bilinear",
                              align_corners=True)
        self.conv = _DoubleConv(cin, cout)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        dy = x2.size(2) - x1.size(2)
        dx = x2.size(3) - x1.size(3)
        x1 = F.pad(x1, (dx // 2, dx - dx // 2, dy // 2, dy - dy // 2))
        return self.conv(torch.cat([x2, x1], dim=1))


class _TorchUNet(nn.Module):
    """Reference unet_model.py UNet/UNetD2/UNetD3 as one parameterized
    module (same channel schedule via JoUNetConfig.plan)."""

    def __init__(self, cfg: JoUNetConfig):
        super().__init__()
        inc_ch, downs, ups = cfg.plan
        self.inc = _DoubleConv(cfg.in_channels, inc_ch)
        ch = inc_ch
        self.downs = nn.ModuleList()
        for cout in downs:
            self.downs.append(_DoubleConv(ch, cout))
            ch = cout
        self.ups = nn.ModuleList([_Up(cin, cout) for cin, cout in ups])
        self.outc = nn.Conv2d(ups[-1][1], cfg.n_classes, 1)

    def forward(self, x):
        skips = [self.inc(x)]
        for blk in self.downs:
            skips.append(blk(F.max_pool2d(skips[-1], 2)))
        h = skips.pop()
        for blk in self.ups:
            h = blk(h, skips.pop())
        return self.outc(h)


def _copy_double_conv(p, s, mod: _DoubleConv):
    seq = mod.conv
    for i, (conv_key, bn_key) in enumerate((("conv1", "bn1"),
                                            ("conv2", "bn2"))):
        conv, bn = seq[3 * i], seq[3 * i + 1]
        conv.weight.data = torch.from_numpy(
            np.asarray(p[conv_key]["w"]).transpose(3, 2, 0, 1).copy())
        conv.bias.data = torch.from_numpy(np.asarray(p[conv_key]["b"]).copy())
        bn.weight.data = torch.from_numpy(np.asarray(p[bn_key]["scale"]).copy())
        bn.bias.data = torch.from_numpy(np.asarray(p[bn_key]["bias"]).copy())
        bn.running_mean.data = torch.from_numpy(
            np.asarray(s[bn_key]["mean"]).copy())
        bn.running_var.data = torch.from_numpy(
            np.asarray(s[bn_key]["var"]).copy())


def _build_torch(params, state, cfg):
    t = _TorchUNet(cfg)
    _copy_double_conv(params["inc"], state["inc"], t.inc)
    for i, blk in enumerate(t.downs):
        _copy_double_conv(params[f"down{i}"], state[f"down{i}"], blk)
    for i, blk in enumerate(t.ups):
        _copy_double_conv(params[f"up{i}"], state[f"up{i}"], blk.conv)
    t.outc.weight.data = torch.from_numpy(
        np.asarray(params["outc"]["w"]).transpose(3, 2, 0, 1).copy())
    t.outc.bias.data = torch.from_numpy(
        np.asarray(params["outc"]["b"]).copy())
    return t


@pytest.mark.parametrize("depth,hw", [(2, (24, 24)), (3, (25, 31)),
                                      (4, (32, 48))])
def test_jo_unet_matches_torch(rng, depth, hw):
    # odd sizes at depth 3 exercise the asymmetric up-padding branch
    cfg = JoUNetConfig(in_channels=4, n_classes=2, w=0.5, depth=depth)
    params, state = init_jo_unet(jax.random.PRNGKey(depth), cfg)
    # non-trivial BN running stats so eval-mode normalization is exercised
    state = jax.tree.map(
        lambda a: jnp.asarray(
            np.abs(rng.standard_normal(a.shape)).astype(np.float32) + 0.5),
        state)
    x = rng.standard_normal((2, *hw, 4), dtype=np.float32)

    ours, _ = apply_jo_unet(params, state, cfg, jnp.asarray(x), train=False)

    t = _build_torch(params, state, cfg).eval()
    with torch.no_grad():
        theirs = t(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    np.testing.assert_allclose(np.asarray(ours),
                               np.moveaxis(theirs, 1, -1),
                               rtol=1e-4, atol=1e-4)


def test_jo_unet_train_mode_updates_bn(rng):
    cfg = JoUNetConfig(in_channels=3, n_classes=2, w=0.25, depth=2)
    params, state = init_jo_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    _, new_state = apply_jo_unet(params, state, cfg, x, train=True)
    before = np.asarray(state["inc"]["bn1"]["mean"])
    after = np.asarray(new_state["inc"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_jo_unet_registry():
    model = get_model("JoUNet", tiny=True)
    tree = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    out = model.apply(tree, x)
    assert out.shape == (1, 16, 16, 2)
