"""Golden tests: functional layers vs torch-built equivalents.

These assemble small torch modules inline (plain torch.nn primitives) to
check numerical parity of our JAX layers — they are test fixtures, not
model code.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.models import layers as L
from amodal_depth_anything_tpu.ops.conv import (conv2d,
                                                conv_transpose_same_stride,
                                                fused_upsample2x_conv,
                                                layer_norm_2d)
from amodal_depth_anything_tpu.ops.flash_attention import mha_reference


def test_layer_norm_matches_torch(rng):
    d = 64
    x = rng.standard_normal((2, 5, d), dtype=np.float32)
    w = rng.standard_normal(d, dtype=np.float32)
    b = rng.standard_normal(d, dtype=np.float32)
    ours = np.asarray(L.layer_norm({"scale": jnp.asarray(w), "bias": jnp.asarray(b)},
                                   jnp.asarray(x)))
    theirs = F.layer_norm(torch.from_numpy(x), (d,), torch.from_numpy(w),
                          torch.from_numpy(b), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_gelu_exact(rng):
    x = rng.standard_normal((128,), dtype=np.float32) * 3
    ours = np.asarray(L.gelu(jnp.asarray(x)))
    theirs = F.gelu(torch.from_numpy(x)).numpy()  # default = exact erf
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_attention_matches_torch_sdpa(rng):
    b, h, n, d = 2, 4, 37, 16
    q, k, v = (rng.standard_normal((b, h, n, d), dtype=np.float32)
               for _ in range(3))
    ours = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((1, 9, 11, 8), dtype=np.float32)
    w = rng.standard_normal((3, 3, 8, 16), dtype=np.float32) * 0.1
    b = rng.standard_normal(16, dtype=np.float32)
    ours = np.asarray(conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                             jnp.asarray(x), padding=1))
    t = F.conv2d(torch.from_numpy(np.moveaxis(x, -1, 1)),
                 torch.from_numpy(w.transpose(3, 2, 0, 1)),
                 torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(ours, np.moveaxis(t.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-5)
    # stride-2 variant (DPT resize layer 3)
    ours2 = np.asarray(conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                              jnp.asarray(x), stride=2, padding=1))
    t2 = F.conv2d(torch.from_numpy(np.moveaxis(x, -1, 1)),
                  torch.from_numpy(w.transpose(3, 2, 0, 1)),
                  torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(ours2, np.moveaxis(t2.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k", [2, 4])
def test_conv_transpose_same_stride_matches_torch(rng, k):
    ci, co = 6, 5
    x = rng.standard_normal((2, 7, 8, ci), dtype=np.float32)
    wt = rng.standard_normal((ci, co, k, k), dtype=np.float32) * 0.2
    b = rng.standard_normal(co, dtype=np.float32)
    ours = np.asarray(conv_transpose_same_stride(
        {"w": jnp.asarray(wt.transpose(0, 2, 3, 1)), "b": jnp.asarray(b)},
        jnp.asarray(x), k=k))
    t = F.conv_transpose2d(torch.from_numpy(np.moveaxis(x, -1, 1)),
                           torch.from_numpy(wt), torch.from_numpy(b), stride=k)
    np.testing.assert_allclose(ours, np.moveaxis(t.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-5)


def test_fused_upsample2x_conv_matches_torch(rng):
    # nearest-2x + 3x3 SAME conv (diffusers Upsample2D / ldm Upsample) as
    # one subpixel-decomposed low-res conv
    ci, co = 6, 5
    x = rng.standard_normal((2, 7, 9, ci), dtype=np.float32)
    w = rng.standard_normal((3, 3, ci, co), dtype=np.float32) * 0.2
    b = rng.standard_normal(co, dtype=np.float32)
    ours = np.asarray(fused_upsample2x_conv(
        {"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    t = F.conv2d(F.interpolate(xt, scale_factor=2.0, mode="nearest"),
                 torch.from_numpy(w.transpose(3, 2, 0, 1)),
                 torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(ours, np.moveaxis(t.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-5)


def test_fused_upsample2x_conv_bf16_bounded(rng):
    # serving dtype: the fold sums taps in f32 before the cast, so the
    # bf16 deviation vs the unfused op stays within ~1 ulp of the
    # folded weights — assert a tight bound relative to output scale
    from amodal_depth_anything_tpu.ops.conv import conv2d
    from amodal_depth_anything_tpu.ops.resize import resize_nearest
    ci, co = 8, 8
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, ci, co),
                                              dtype=np.float32) * 0.2),
         "b": jnp.asarray(rng.standard_normal(co).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((2, 12, 12, ci), dtype=np.float32),
                    jnp.bfloat16)
    fused = np.float32(fused_upsample2x_conv(p, x))
    ref = np.float32(conv2d(p, resize_nearest(x, scale_factor=2.0),
                            padding=1))
    scale = np.abs(ref).max()
    assert np.abs(fused - ref).max() <= 0.02 * scale


def test_channel_layernorm_2d_matches_torch(rng):
    # reference dpt.py:37-61 channels_first LayerNorm over C
    c = 12
    x = rng.standard_normal((2, 5, 6, c), dtype=np.float32)
    w = rng.standard_normal(c, dtype=np.float32)
    b = rng.standard_normal(c, dtype=np.float32)
    ours = np.asarray(layer_norm_2d({"scale": jnp.asarray(w), "bias": jnp.asarray(b)},
                                    jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    ref = (xt - u) / torch.sqrt(s + 1e-6)
    ref = torch.from_numpy(w)[:, None, None] * ref + torch.from_numpy(b)[:, None, None]
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-5)


def test_vit_block_matches_torch_composition(rng):
    """Full pre-norm block vs a torch composition built from primitives."""
    dim, heads, n = 64, 4, 21
    key = jax.random.PRNGKey(0)
    p = L.vit_block_init(key, dim, init_values=1.0)
    # randomize params so the test is non-trivial
    leaves, treedef = jax.tree.flatten(p)
    nrng = np.random.default_rng(1)
    leaves = [jnp.asarray(nrng.standard_normal(l.shape, dtype=np.float32) * 0.05)
              for l in leaves]
    p = jax.tree.unflatten(treedef, leaves)
    x = rng.standard_normal((2, n, dim), dtype=np.float32)

    ours = np.asarray(L.vit_block(p, jnp.asarray(x), num_heads=heads,
                                  attn_impl="xla"))

    def tln(pp, t):
        return F.layer_norm(t, (dim,), torch.from_numpy(np.asarray(pp["scale"])),
                            torch.from_numpy(np.asarray(pp["bias"])), eps=1e-6)

    xt = torch.from_numpy(x)
    h = tln(p["norm1"], xt)
    qkv = h @ torch.from_numpy(np.asarray(p["attn"]["qkv"]["w"])) + \
        torch.from_numpy(np.asarray(p["attn"]["qkv"]["b"]))
    q, k, v = qkv.reshape(2, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    att = F.scaled_dot_product_attention(q, k, v)
    att = att.permute(0, 2, 1, 3).reshape(2, n, dim)
    att = att @ torch.from_numpy(np.asarray(p["attn"]["proj"]["w"])) + \
        torch.from_numpy(np.asarray(p["attn"]["proj"]["b"]))
    xt = xt + att * torch.from_numpy(np.asarray(p["ls1"]["gamma"]))
    h = tln(p["norm2"], xt)
    h = F.gelu(h @ torch.from_numpy(np.asarray(p["mlp"]["fc1"]["w"])) +
               torch.from_numpy(np.asarray(p["mlp"]["fc1"]["b"])))
    h = h @ torch.from_numpy(np.asarray(p["mlp"]["fc2"]["w"])) + \
        torch.from_numpy(np.asarray(p["mlp"]["fc2"]["b"]))
    xt = xt + h * torch.from_numpy(np.asarray(p["ls2"]["gamma"]))

    np.testing.assert_allclose(ours, xt.numpy(), rtol=1e-4, atol=1e-5)


def test_mha_mixed_dtype_normalized(rng):
    """q=f32 with k/v=bf16 fails Mosaic on real TPU; mha now normalizes
    k/v to q's dtype — result must equal the uniform-dtype call."""
    from amodal_depth_anything_tpu.ops.flash_attention import mha

    q = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    uniform = mha(q, k, v, interpret=True)
    mixed = mha(q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                interpret=True)
    ref = mha(q, k.astype(jnp.bfloat16).astype(jnp.float32),
              v.astype(jnp.bfloat16).astype(jnp.float32), interpret=True)
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(ref))
    assert mixed.dtype == uniform.dtype == jnp.float32


def test_bwd_vmem_block_guard():
    """Backward block sizes shrink when the estimated kernel footprint
    would blow the 16 MB scoped-vmem limit (hit: SD UNet 64x64 self-attn
    [B*H,4096,128] bf16 under training — 17.5 MB at block 256), and stay
    at 256 for the measured vitl/vitg trunk training shapes."""
    from amodal_depth_anything_tpu.ops.flash_attention import \
        _vmem_fit_block

    its = 2  # bf16
    # vitl @518 training: nq_pad = nk_pad = 1408, d_pad = 64 -> keep 256
    nq = nk = 1408
    d = 64
    dq_res = 2 * nk * d * its + nk * d * 4
    assert _vmem_fit_block(256, nk * (3 * 4 + its), dq_res) == 256
    dkv_res = 2 * nq * d * its + 2 * nq * 128 * 4 + nq * d * 4
    assert _vmem_fit_block(256, nq * (3 * 4 + 2 * its), dkv_res) == 256

    # UNet 64x64 self-attn under training: nq = nk = 4096, d_pad = 128
    nq = nk = 4096
    d = 128
    dq_res = 2 * nk * d * its + nk * d * 4
    assert _vmem_fit_block(256, nk * (3 * 4 + its), dq_res) == 128
    dkv_res = 2 * nq * d * its + 2 * nq * 128 * 4 + nq * d * 4
    assert _vmem_fit_block(256, nq * (3 * 4 + 2 * its), dkv_res) == 128


def test_bwd_grads_match_after_block_guard(rng):
    """A shape that trips the guard (block_q/block_k -> 128) must still
    produce reference-matching gradients (interpret mode, small batch but
    the same nq/nk/d_pad class scaled down is NOT enough to trip it — so
    call the bwd dispatch directly at a guard-tripping padded shape is
    too slow on CPU; instead verify the guard only changes BLOCKING by
    checking grads at a shape where we force block 128 via block_q)."""
    from amodal_depth_anything_tpu.ops.flash_attention import (mha,
                                                               mha_reference)
    q = jnp.asarray(rng.standard_normal((1, 2, 200, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 200, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 200, 32), dtype=np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(mha(q, k, v, interpret=True, block_q=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_mha_q_split_row_exact(rng):
    """AMODAL_ATTN_QSPLIT interleave: splitting the query block into
    independent row chunks must be ROW-EXACT vs q_split=1 (each row's
    accumulation order is unchanged — only instruction interleave
    differs), including the kv_len-masked and lse (grad) paths."""
    from amodal_depth_anything_tpu.ops.flash_attention import (mha,
                                                               pad_seq_len)

    del pad_seq_len  # nq=512 keeps block_q=256, so q_split=2 stays ACTIVE
    q = jnp.asarray(rng.standard_normal((1, 2, 512, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 512, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 512, 32), dtype=np.float32))

    base = mha(q, k, v, interpret=True, q_split=1)
    split = mha(q, k, v, interpret=True, q_split=2)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(split))

    # kv_len masking path UNDER AN ACTIVE SPLIT (round-2 advisor: with
    # nq=384 block_q drops to 128 and q_split=2 silently resets to 1,
    # making the comparison vacuous — keep nq=512 / block_q=256 here and
    # assert the split really is on, matching the production vitg/vitl
    # masked configuration)
    n = 500
    assert 256 % (2 * 128) == 0  # split stays aligned -> genuinely active
    base_m = mha(q, k, v, interpret=True, kv_len=n, q_split=1)
    split_m = mha(q, k, v, interpret=True, kv_len=n, q_split=2)
    np.testing.assert_array_equal(np.asarray(base_m)[:, :, :n],
                                  np.asarray(split_m)[:, :, :n])

    # lse (training/grad) path: forward under grad writes the lse output
    def loss(fn_q_split, *args):
        return jnp.sum(mha(*args, interpret=True, q_split=fn_q_split) ** 2)

    g1 = jax.grad(lambda *a: loss(1, *a), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: loss(2, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a q_split that does not divide the block is silently disabled,
    # and q_split<1 means "off" (was a trace-time ZeroDivisionError)
    odd = mha(q, k, v, interpret=True, q_split=3)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(odd))
    off = mha(q, k, v, interpret=True, q_split=0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))


def test_fused_epilogue_matches_reference():
    """matmul_scale_residual (Pallas, interpret on CPU) == the XLA chain
    it replaces (resid + gamma * (x @ W + b))."""
    import numpy as np

    from amodal_depth_anything_tpu.ops.fused_epilogue import (
        matmul_scale_residual, matmul_scale_residual_reference)

    key = jax.random.PRNGKey(3)
    m, k, n = 512, 128, 256
    x = jax.random.normal(key, (m, k), jnp.float32)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.05
    b = jax.random.normal(key, (n,), jnp.float32)
    g = jax.random.normal(key, (n,), jnp.float32) * 0.1
    r = jax.random.normal(key, (m, n), jnp.float32)

    ref = matmul_scale_residual_reference(x, w, b, g, r)
    out = matmul_scale_residual(x, w, b, g, r, block_m=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
