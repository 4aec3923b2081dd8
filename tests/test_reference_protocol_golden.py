"""Protocol parity vs the ACTUAL reference utils (loss / metrics / LR
schedule / alignment / depth normalization).

Unlike the model goldens (which need stubbed imports and a subprocess),
the reference's `src/util/*` modules are pure torch/numpy and import
directly; these tests evaluate the reference implementation and ours on
identical random tensors and require agreement to float tolerance. The
quantities compared define the published evaluation protocol
(BASELINE.md) — any drift here changes reported numbers.
"""

import pathlib
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not present")


@pytest.fixture(scope="module", autouse=True)
def _ref_path():
    import types

    sys.path.insert(0, str(REFERENCE))
    # metric.py imports skimage at module top for the (host-side) edge
    # metrics; this image lacks it. The stub only needs to satisfy the
    # import — the numeric metrics under test never touch it.
    stubbed = []
    # timm: only referenced at call time (create_model) by paths these
    # tests never exercise; the stub satisfies the module-level import
    for name in ("skimage", "skimage.feature", "timm"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    sys.modules["skimage"].feature = sys.modules.get("skimage.feature")
    if not hasattr(sys.modules["skimage.feature"], "canny"):
        sys.modules["skimage.feature"].canny = None  # never called here
    # bypass src/models/__init__.py (imports depthfm -> torchdiffeq) so
    # the pure-torch zoedepth layer modules import directly
    bypassed = []
    for pkg in ("src.models", "src.models.amodalsynthdrive"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [f"{REFERENCE}/{pkg.replace('.', '/')}"]
            sys.modules[pkg] = mod
            bypassed.append(pkg)
    yield
    for name in bypassed:
        sys.modules.pop(name, None)
    sys.path.remove(str(REFERENCE))
    for name in stubbed:
        sys.modules.pop(name, None)


@pytest.fixture()
def tensors(rng):
    pred = rng.random((2, 1, 24, 24), dtype=np.float32) * 0.8 + 0.1
    gt = rng.random((2, 1, 24, 24), dtype=np.float32) * 0.8 + 0.1
    mask = rng.random((2, 1, 24, 24)) > 0.3
    return pred, gt, mask


METRICS = ["abs_relative_difference", "squared_relative_difference",
           "rmse_linear", "rmse_log", "log10", "delta1_acc", "delta2_acc",
           "delta3_acc", "i_rmse", "silog_rmse"]


def test_metric_suite_matches_reference(tensors):
    from src.util import metric as ref_metric

    from amodal_depth_anything_tpu.utils import metrics as ours

    pred, gt, mask = tensors
    for name in METRICS:
        theirs = getattr(ref_metric, name)(
            torch.from_numpy(pred), torch.from_numpy(gt),
            torch.from_numpy(mask))
        mine = ours.METRIC_FNS[name](jnp.asarray(pred), jnp.asarray(gt),
                                     jnp.asarray(mask))
        np.testing.assert_allclose(float(mine), float(theirs),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_losses_match_reference(tensors):
    from src.util.loss import get_loss as ref_get_loss

    from amodal_depth_anything_tpu.utils.loss import get_loss as our_get_loss

    pred, gt, mask = tensors
    cases = [("silog_mse", dict(lamb=0.5, log_pred=False), True),
             ("silog_rmse", dict(lamb=0.5, alpha=10.0, log_pred=False), True),
             ("silog_loss", dict(beta=0.15), False),  # ref takes no mask
             ("l1_loss_with_mask", dict(batch_reduction=True), True),
             ("mean_abs_rel", {}, False)]
    for name, kw, with_mask in cases:
        t_args = [torch.from_numpy(pred), torch.from_numpy(gt)]
        j_args = [jnp.asarray(pred), jnp.asarray(gt)]
        if with_mask:
            t_args.append(torch.from_numpy(mask))
            j_args.append(jnp.asarray(mask))
        theirs = ref_get_loss(name, **kw)(*t_args)
        mine = our_get_loss(name, **kw)(*j_args)
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                                   rtol=2e-4, atol=1e-6, err_msg=name)


def test_iter_exponential_matches_reference():
    from src.util.lr_scheduler import IterExponential

    from amodal_depth_anything_tpu.utils.lr_schedule import iter_exponential

    ref = IterExponential(total_iter_length=50000, final_ratio=0.01,
                          warmup_steps=100)
    ours = iter_exponential(base_lr=1.0, total_iter_length=50000,
                            final_ratio=0.01, warmup_steps=100)
    for step in [0, 1, 50, 99, 100, 101, 1000, 25000, 49999, 50000, 60000]:
        np.testing.assert_allclose(float(ours(step)), ref(step),
                                   rtol=1e-5, err_msg=str(step))


def test_alignment_matches_reference(rng):
    from src.util.alignment import align_depth_least_square as ref_align

    from amodal_depth_anything_tpu.utils.alignment import (
        align_depth_least_square_np)

    gt = rng.random((24, 24), dtype=np.float32)
    pred = gt * 2.3 + 0.4 + rng.normal(0, 0.01, (24, 24)).astype(np.float32)
    mask = rng.random((24, 24)) > 0.4

    theirs, s_t, t_t = ref_align(
        gt_arr=torch.from_numpy(gt), pred_arr=torch.from_numpy(pred),
        valid_mask_arr=torch.from_numpy(mask), return_scale_shift=True,
        max_resolution=None)
    mine, s_m, t_m = align_depth_least_square_np(gt, pred, mask)
    np.testing.assert_allclose(s_m, float(s_t), rtol=1e-4)
    np.testing.assert_allclose(t_m, float(t_t), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(mine, np.asarray(theirs), rtol=1e-4,
                               atol=1e-5)


def test_scale_shift_normalizer_matches_reference(rng):
    from src.util.depth_transform import ScaleShiftDepthNormalizer

    from amodal_depth_anything_tpu.utils.depth_transform import (
        ScaleShiftDepthNormalizer as Ours)

    depth = rng.random((1, 32, 32), dtype=np.float32) * 5
    mask = rng.random((1, 32, 32)) > 0.2
    ref_n = ScaleShiftDepthNormalizer()
    our_n = Ours()
    theirs = ref_n(torch.from_numpy(depth),
                   valid_mask=torch.from_numpy(mask))
    mine = our_n(depth, valid_mask=mask)
    np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_seed_sequence_matches_reference():
    """Exact-resume depends on replaying the reference's per-batch seed
    sequence (random.seed + randint) bit-for-bit."""
    from src.util.seeding import generate_seed_sequence as ref_gen

    from amodal_depth_anything_tpu.utils.seeding import generate_seed_sequence

    assert generate_seed_sequence(2024, 64) == ref_gen(2024, 64)
    assert generate_seed_sequence(0, 8) == ref_gen(0, 8)


def _conv1x1(tmod):
    return {"w": jnp.asarray(tmod.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "b": jnp.asarray(tmod.bias.detach().numpy())}


def _mlp2_params(net):
    return {"conv1": _conv1x1(net[0]), "conv2": _conv1x1(net[2])}


def test_attractor_layer_matches_reference(rng):
    """Inverse attractor + mean aggregation (config_zoedepth.json), AND
    the load-bearing reference bug: forward calls `dist(dx)` with no
    arguments, so the configured alpha=1000 is ignored and the
    jit-scripted default alpha=300 is what every checkpoint ran. The
    layer here is built with alpha=1000 like the real model; our side
    computes with 300 and must match."""
    from src.models.amodalsynthdrive.zoedepth.models.layers.attractor import (
        AttractorLayerUnnormed)

    from amodal_depth_anything_tpu.models.zoedepth import (_inv_attractor,
                                                           _mlp2)
    from amodal_depth_anything_tpu.ops.resize import resize2d

    torch.manual_seed(0)
    layer = AttractorLayerUnnormed(in_features=16, n_bins=8, n_attractors=4,
                                   mlp_dim=32, alpha=1000, gamma=2,
                                   kind="mean", attractor_type="inv")
    layer.eval()
    x = torch.randn(1, 16, 8, 8)
    b_prev = torch.rand(1, 8, 4, 4) * 5
    prev_emb = torch.randn(1, 16, 4, 4)
    with torch.no_grad():
        b_new, _ = layer(x, b_prev, prev_b_embedding=prev_emb)

    p = _mlp2_params(layer._net)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    prev_up = resize2d(jnp.asarray(prev_emb.numpy().transpose(0, 2, 3, 1)),
                       size=(8, 8), method="bilinear", align_corners=True)
    a = _mlp2(p, x_j + prev_up, final_act=jax.nn.softplus)
    b_up = resize2d(jnp.asarray(b_prev.numpy().transpose(0, 2, 3, 1)),
                    size=(8, 8), method="bilinear", align_corners=True)
    dx = a[..., :, None] - b_up[..., None, :]
    delta = jnp.mean(_inv_attractor(dx, 300.0, 2.0), axis=-2)
    ours = np.asarray(b_up + delta).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, b_new.numpy(), rtol=1e-4, atol=1e-5)


def test_conditional_log_binomial_matches_reference(rng):
    """GELU-hidden conditioning mlp + Stirling log-binomial coefficients +
    min_temp 0.0212 (dist_layers.py:29-120)."""
    from src.models.amodalsynthdrive.zoedepth.models.layers.dist_layers import (
        ConditionalLogBinomial)

    from amodal_depth_anything_tpu.models.layers import gelu
    from amodal_depth_anything_tpu.models.zoedepth import (_log_binomial,
                                                           _mlp2)

    torch.manual_seed(1)
    clb = ConditionalLogBinomial(in_features=12, condition_dim=6,
                                 n_classes=16, min_temp=0.0212, max_temp=50)
    clb.eval()
    x = torch.randn(1, 12, 6, 6)
    cond = torch.randn(1, 6, 6, 6)
    with torch.no_grad():
        probs_ref = clb(x, cond)

    p = _mlp2_params(clb.mlp)
    inp = jnp.concatenate([jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                           jnp.asarray(cond.numpy().transpose(0, 2, 3, 1))],
                          axis=-1)
    pt = _mlp2(p, inp, final_act=jax.nn.softplus, hidden_act=gelu)
    eps = 1e-4
    pp = (pt[..., 0:1] + eps) / (pt[..., 0:1] + pt[..., 1:2] + 2 * eps)
    tt = (pt[..., 2:3] + eps) / (pt[..., 2:3] + pt[..., 3:4] + 2 * eps)
    t = 0.0212 + (50.0 - 0.0212) * tt
    ours = np.asarray(_log_binomial(pp, t, 16)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, probs_ref.numpy(), rtol=5e-4, atol=1e-6)


def test_spade_matches_reference(rng):
    """jo_amodal SPADE fusion block (dpt/SPADE.py:13-58): BN without
    affine using running stats, nearest-resized segmap conditioning."""
    from src.models.amodalsynthdrive.jo_amodal.dpt.SPADE import SPADE

    from amodal_depth_anything_tpu.models.jo_dpt import _spade

    torch.manual_seed(2)
    spade = SPADE(norm_nc=12, label_nc=1)
    # non-trivial running stats: eval-mode BN must use them
    with torch.no_grad():
        spade.param_free_norm.running_mean.uniform_(-1, 1)
        spade.param_free_norm.running_var.uniform_(0.5, 2.0)
    spade.eval()
    x = torch.randn(1, 12, 8, 8)
    seg = torch.rand(1, 1, 4, 4)
    with torch.no_grad():
        ref = spade(x, seg)

    def conv(t):
        return {"w": jnp.asarray(t.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "b": jnp.asarray(t.bias.detach().numpy())}

    p = {"mlp_shared": conv(spade.mlp_shared[0]),
         "mlp_gamma": conv(spade.mlp_gamma),
         "mlp_beta": conv(spade.mlp_beta)}
    state = {"mean": jnp.asarray(spade.param_free_norm.running_mean.numpy()),
             "var": jnp.asarray(spade.param_free_norm.running_var.numpy())}
    out, _ = _spade(p, state, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(seg.numpy().transpose(0, 2, 3, 1)),
                    train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), rtol=1e-4, atol=1e-5)


def test_mvit_transformer_decoder_matches_reference(rng):
    """ADDeepLab's mViT cross-attention block is a stock torch
    nn.TransformerDecoder (deeplab.py:186-200): post-norm, ReLU FF,
    merged qkv in_proj — our _decoder_layer must replicate it."""
    from src.models.amodalsynthdrive.deeplab import mViT

    from amodal_depth_anything_tpu.models.deeplab import _decoder_layer

    torch.manual_seed(3)
    d, heads = 32, 2
    m = mViT(in_channels=8, patch_size=4, embedding_dim=d, num_heads=heads)
    m.eval()
    x = torch.randn(1, 8, 16, 16)
    ym = torch.randn(1, 8, 16, 16)
    with torch.no_grad():
        x_pf = m.patch_x(x).flatten(2).permute(2, 0, 1)   # [S, N, E]
        ym_pf = m.patch_ym(ym).flatten(2).permute(2, 0, 1)
        ref = m.transformer_decoder(x_pf, ym_pf)

    def lin(w, b=None):
        p = {"w": jnp.asarray(w.detach().numpy().T)}
        p["b"] = (jnp.asarray(b.detach().numpy()) if b is not None
                  else jnp.zeros((p["w"].shape[1],), jnp.float32))
        return p

    tgt = jnp.asarray(x_pf.numpy().transpose(1, 0, 2))    # [N, S, E]
    mem = jnp.asarray(ym_pf.numpy().transpose(1, 0, 2))
    for layer in m.transformer_decoder.layers:
        ipw, ipb = layer.self_attn.in_proj_weight, layer.self_attn.in_proj_bias
        cpw, cpb = (layer.multihead_attn.in_proj_weight,
                    layer.multihead_attn.in_proj_bias)
        p = {
            "self_attn": {"qkv": lin(ipw, ipb),
                          "out": lin(layer.self_attn.out_proj.weight,
                                     layer.self_attn.out_proj.bias)},
            "cross_attn": {"q": lin(cpw[:d], cpb[:d]),
                           "kv": lin(cpw[d:], cpb[d:]),
                           "out": lin(layer.multihead_attn.out_proj.weight,
                                      layer.multihead_attn.out_proj.bias)},
            "ff": {"fc1": lin(layer.linear1.weight, layer.linear1.bias),
                   "fc2": lin(layer.linear2.weight, layer.linear2.bias)},
            "norm1": {"scale": jnp.asarray(layer.norm1.weight.detach().numpy()),
                      "bias": jnp.asarray(layer.norm1.bias.detach().numpy())},
            "norm2": {"scale": jnp.asarray(layer.norm2.weight.detach().numpy()),
                      "bias": jnp.asarray(layer.norm2.bias.detach().numpy())},
            "norm3": {"scale": jnp.asarray(layer.norm3.weight.detach().numpy()),
                      "bias": jnp.asarray(layer.norm3.bias.detach().numpy())},
        }
        tgt = _decoder_layer(p, tgt, mem, heads, "xla")
    ours = np.asarray(tgt).transpose(1, 0, 2)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=2e-5)


def test_swiglu_ffn_matches_reference(rng):
    """DINOv2 SwiGLUFFNFused (the vitg FFN): hidden-dim rounding
    (int(h*2/3)+7)//8*8 and the silu(x1)*x2 split order."""
    from src.models.amodalsynthdrive.depth_anything_v2.dinov2_layers.swiglu_ffn import (  # noqa: E501
        SwiGLUFFNFused)

    from amodal_depth_anything_tpu.models.layers import (swiglu,
                                                         swiglu_hidden_dim)

    torch.manual_seed(4)
    dim = 48
    ffn = SwiGLUFFNFused(in_features=dim, hidden_features=dim * 4)
    ffn.eval()
    # rounding quirk: hidden = (int(4*dim*2/3)+7)//8*8
    assert ffn.w12.out_features // 2 == swiglu_hidden_dim(dim, 4.0)

    x = torch.randn(2, 9, dim)
    with torch.no_grad():
        ref = ffn(x)

    p = {"w12": {"w": jnp.asarray(ffn.w12.weight.detach().numpy().T),
                 "b": jnp.asarray(ffn.w12.bias.detach().numpy())},
         "w3": {"w": jnp.asarray(ffn.w3.weight.detach().numpy().T),
                "b": jnp.asarray(ffn.w3.bias.detach().numpy())}}
    ours = np.asarray(swiglu(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_addeeplab_decoder_matches_reference(rng):
    """The ENTIRE ADDeepLab decoder — ASPP (dilated convs + image pool),
    top-down UpSample fusion, dual DepthPredictionHeads, 4-layer mViT
    cross-attention, sigmoid outputs — against the reference's forward
    with injected backbone features (its encoder needs timm weights, so
    create_model is stubbed with a feature player)."""
    import types as _types

    import torch.nn as nn

    torch.manual_seed(5)
    channels = [32, 64, 128, 256]
    ups = [16, 32, 64, 128]
    feats_t = [torch.randn(1, c, s, s) for c, s in
               zip(channels, (16, 8, 4, 2))]

    class DummyEncoder(nn.Module):
        default_cfg = {"mean": (0.485, 0.456, 0.406),
                       "std": (0.229, 0.224, 0.225)}

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)

        def forward(self, x):
            return [f.clone() for f in feats_t]

    sys.modules["timm"].create_model = lambda *a, **k: DummyEncoder()
    from src.models.amodalsynthdrive.deeplab import ADDeepLab

    model = ADDeepLab(encoder_name="stub", channels=channels,
                      up_sample_channels=ups)
    model.eval()
    x = torch.rand(1, 3, 64, 64)
    gm = (torch.rand(1, 1, 64, 64) > 0.5).float()
    with torch.no_grad():
        vis_ref, invis_ref = model(x, guide_mask=gm)

    # ---- convert decoder weights to our layout
    from amodal_depth_anything_tpu.models.deeplab import (ADDeepLabConfig,
                                                          addeeplab_decoder)

    def conv(t, bias=True):
        p = {"w": jnp.asarray(t.weight.detach().numpy().transpose(2, 3, 1, 0))}
        if bias and t.bias is not None:
            p["b"] = jnp.asarray(t.bias.detach().numpy())
        return p

    def lin(w, b):
        return {"w": jnp.asarray(w.detach().numpy().T),
                "b": jnp.asarray(b.detach().numpy())}

    d = ups[0]
    aspp = {"image_pool": conv(model.aspp_head.image_pool[1].conv)}
    for i, mod in enumerate(model.aspp_head.aspp_modules):
        aspp[f"branch{i}"] = conv(mod.conv)
    aspp["bottleneck"] = conv(model.aspp_head.bottleneck.conv)
    conv_list = {"0": {"conv": conv(model.conv_list[0].conv)}}
    for i in range(1, 4):
        conv_list[str(i)] = {"convA": conv(model.conv_list[i].convA.conv),
                             "convB": conv(model.conv_list[i].convB.conv)}

    def head(h):
        return {"conv_1": conv(h.conv_1.conv), "conv_2": conv(h.conv_2.conv),
                "pred": conv(h.pred.conv)}

    layers = {}
    for i, layer in enumerate(model.cross_att_layer.transformer_decoder.layers):
        ipw, ipb = layer.self_attn.in_proj_weight, layer.self_attn.in_proj_bias
        cpw, cpb = (layer.multihead_attn.in_proj_weight,
                    layer.multihead_attn.in_proj_bias)
        layers[str(i)] = {
            "self_attn": {"qkv": lin(ipw, ipb),
                          "out": lin(layer.self_attn.out_proj.weight,
                                     layer.self_attn.out_proj.bias)},
            "cross_attn": {"q": lin(cpw[:d], cpb[:d]),
                           "kv": lin(cpw[d:], cpb[d:]),
                           "out": lin(layer.multihead_attn.out_proj.weight,
                                      layer.multihead_attn.out_proj.bias)},
            "ff": {"fc1": lin(layer.linear1.weight, layer.linear1.bias),
                   "fc2": lin(layer.linear2.weight, layer.linear2.bias)},
            "norm1": {"scale": jnp.asarray(layer.norm1.weight.detach().numpy()),
                      "bias": jnp.asarray(layer.norm1.bias.detach().numpy())},
            "norm2": {"scale": jnp.asarray(layer.norm2.weight.detach().numpy()),
                      "bias": jnp.asarray(layer.norm2.bias.detach().numpy())},
            "norm3": {"scale": jnp.asarray(layer.norm3.weight.detach().numpy()),
                      "bias": jnp.asarray(layer.norm3.bias.detach().numpy())},
        }
    params = {
        "aspp_head": aspp,
        "conv_list": conv_list,
        "visible_depth_head": head(model.visible_depth_head),
        "in_visible_depth_head": head(model.in_visible_depth_head),
        "cross_att_layer": {
            "patch_x": conv(model.cross_att_layer.patch_x),
            "patch_ym": conv(model.cross_att_layer.patch_ym),
            "layers": layers,
        },
    }
    cfg = ADDeepLabConfig(channels=tuple(channels),
                          up_sample_channels=tuple(ups))
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    vis, invis = addeeplab_decoder(params, cfg, feats_j, attn_impl="xla")

    np.testing.assert_allclose(np.asarray(vis).transpose(0, 3, 1, 2),
                               vis_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(invis).transpose(0, 3, 1, 2),
                               invis_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_jo_resize_pos_embed_matches_reference(rng):
    """jo_amodal timm-style pos-embed resize: bilinear with
    align_corners=False (vit.py:148-163) — the DAV2 trunk uses a
    different (bicubic + offset) scheme, so pin this one separately."""
    import types as _types

    from src.models.amodalsynthdrive.jo_amodal.dpt import vit as ref_vit

    from amodal_depth_anything_tpu.ops.resize import resize2d

    pe = torch.randn(1, 5 * 5 + 1, 16)
    fake_self = _types.SimpleNamespace(start_index=1)
    theirs = ref_vit._resize_pos_embed(fake_self, pe, 3, 7).numpy()

    pe_j = jnp.asarray(pe.numpy())
    grid = pe_j[:, 1:].reshape(1, 5, 5, -1)
    grid = resize2d(grid, size=(3, 7), method="bilinear")
    ours = np.asarray(jnp.concatenate(
        [pe_j[:, :1], grid.reshape(1, 21, -1)], axis=1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_project_readout_matches_reference(rng):
    """'project' readout: tokens FIRST then expanded cls, Linear+GELU
    (vit.py:78-91)."""
    from src.models.amodalsynthdrive.jo_amodal.dpt.vit import ProjectReadout

    from amodal_depth_anything_tpu.models.layers import gelu, linear

    torch.manual_seed(6)
    ro = ProjectReadout(in_features=16)
    ro.eval()
    x = torch.randn(2, 10, 16)
    with torch.no_grad():
        theirs = ro(x).numpy()

    p = {"w": jnp.asarray(ro.project[0].weight.detach().numpy().T),
         "b": jnp.asarray(ro.project[0].bias.detach().numpy())}
    xj = jnp.asarray(x.numpy())
    cls_t = jnp.broadcast_to(xj[:, :1], xj[:, 1:].shape)
    merged = jnp.concatenate([xj[:, 1:], cls_t], axis=-1)
    ours = np.asarray(gelu(linear(p, merged)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
