"""Golden parity against the ACTUAL reference implementation.

`ref_golden_dump.py` runs the real torch classes from /root/reference in a
subprocess (seeded random weights, CPU) and dumps inputs / output / state
dict; here the state dict goes through our converter and our JAX forward
must match the reference's output. Unlike `test_full_model_parity.py`
(which compares against a hand-built torch twin), the model under test is
the reference's own code — any topology or layout drift fails here.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.convert.torch_to_jax import (convert_dav2,
                                                            infer_dav2_config)
from amodal_depth_anything_tpu.models.amodal_dav2 import (apply_amodal_dav2,
                                                          apply_raw_dav2)

REFERENCE = pathlib.Path("/root/reference")
DUMP_SCRIPT = pathlib.Path(__file__).parent / "ref_golden_dump.py"

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not present")


def _dump(model_key: str, tmp_path: pathlib.Path) -> dict:
    out = tmp_path / f"{model_key}.npz"
    subprocess.run([sys.executable, str(DUMP_SCRIPT), model_key, str(out)],
                   check=True, timeout=600)
    return dict(np.load(out))


def _split(data: dict):
    sd = {k[3:]: v for k, v in data.items() if k.startswith("sd.")}
    inputs = {k[3:]: v for k, v in data.items() if k.startswith("in.")}
    return sd, inputs, data["out"]


def _nhwc(a: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(a.transpose(0, 2, 3, 1))


def test_reference_amodal_dav2_vits(tmp_path):
    sd, inputs, golden = _split(_dump("amodal_dav2_vits", tmp_path))
    cfg = infer_dav2_config(sd, loss_strategy="entire_target_object")
    assert cfg.encoder == "vits" and cfg.guide_type == "mask+observation"
    assert not cfg.raw

    params = jax.tree.map(jnp.asarray, convert_dav2(sd, cfg))
    ours = np.asarray(apply_amodal_dav2(
        params, cfg, _nhwc(inputs["x"]),
        guide_mask=_nhwc(inputs["guide_mask"]),
        observation=_nhwc(inputs["observation"]),
        attn_impl="xla"))[..., 0]
    theirs = golden[:, 0]

    # guard against a vacuous comparison (sigmoid saturated flat at 0.5)
    assert theirs.std() > 1e-3, f"flat golden (std {theirs.std()})"
    diff = np.abs(ours - theirs)
    assert diff.max() < 5e-4, f"max diff {diff.max()}"


def test_reference_amodal_dav2_vits_ssi(tmp_path):
    """ssi strategy = linear (no-sigmoid) head + image+mask+observation =
    the 5-channel guidance patch embed — both reference forks at once."""
    sd, inputs, golden = _split(_dump("amodal_dav2_vits_ssi", tmp_path))
    cfg = infer_dav2_config(sd, loss_strategy="ssi invisible_part")
    assert cfg.guide_type == "image+mask+observation"

    params = jax.tree.map(jnp.asarray, convert_dav2(sd, cfg))
    ours = np.asarray(apply_amodal_dav2(
        params, cfg, _nhwc(inputs["x"]),
        guide_rgb=_nhwc(inputs["guide_rgb"]),
        guide_mask=_nhwc(inputs["guide_mask"]),
        observation=_nhwc(inputs["observation"]),
        attn_impl="xla"))[..., 0]
    theirs = golden[:, 0]

    assert theirs.std() > 1e-3, f"flat golden (std {theirs.std()})"
    diff = np.abs(ours - theirs)
    # linear head: no sigmoid compressing the error
    assert diff.max() < 2e-3, f"max diff {diff.max()}"


def test_reference_depthfm_unet_tiny(tmp_path):
    from amodal_depth_anything_tpu.convert.depthfm_convert import (
        convert_ldm_unet)
    from amodal_depth_anything_tpu.models.unet_ldm import (UNetConfig,
                                                           apply_unet)

    sd, inputs, golden = _split(_dump("depthfm_unet_tiny", tmp_path))
    # rescale_self_attention: the dump runs the reference WITHOUT xformers,
    # i.e. its vanilla CrossAttention with the log-entropy self-attn scale
    # (attention.py:175-177); our flag mirrors exactly that mode.
    cfg = UNetConfig(in_channels=8, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=2, transformer_depth=1,
                     context_dim=16, use_linear_in_transformer=True,
                     rescale_self_attention=True)
    params = jax.tree.map(jnp.asarray, convert_ldm_unet(sd, cfg))
    ours = np.asarray(apply_unet(
        params, cfg, _nhwc(inputs["x"]), jnp.asarray(inputs["t"]),
        context_ca=jnp.asarray(inputs["ctx"]),
        attn_impl="xla")).transpose(0, 3, 1, 2)

    assert golden.std() > 1e-3, f"flat golden (std {golden.std()})"
    diff = np.abs(ours - golden)
    assert diff.max() < 5e-4, f"max diff {diff.max()}"


def test_reference_raw_dav2_vits_rect(tmp_path):
    """Rectangular 56x84 input: aspect-aware pos-embed interpolation."""
    sd, inputs, golden = _split(_dump("raw_dav2_vits_rect", tmp_path))
    cfg = infer_dav2_config(sd)
    params = jax.tree.map(jnp.asarray, convert_dav2(sd, cfg))
    ours = np.asarray(apply_raw_dav2(params, cfg, _nhwc(inputs["x"]),
                                     attn_impl="xla"))
    assert golden.std() > 1e-3
    assert np.abs(ours - golden).max() < 5e-4


def test_reference_raw_dav2_vits(tmp_path):
    sd, inputs, golden = _split(_dump("raw_dav2_vits", tmp_path))
    cfg = infer_dav2_config(sd)
    assert cfg.encoder == "vits" and cfg.raw

    params = jax.tree.map(jnp.asarray, convert_dav2(sd, cfg))
    ours = np.asarray(apply_raw_dav2(params, cfg, _nhwc(inputs["x"]),
                                     attn_impl="xla"))

    assert golden.std() > 1e-3, f"flat golden (std {golden.std()})"
    diff = np.abs(ours - golden)
    assert diff.max() < 5e-4, f"max diff {diff.max()}"
