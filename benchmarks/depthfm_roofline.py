"""DepthFM serving roofline from XLA's cost model, scan-corrected.

Completes the speed-of-light accounting (flagship pipeline + train-step
rooflines live in docs/ROADMAP.md) for the 4-step DepthFMAmodal eval
(b8 @512 bf16, the bench configuration).

CAVEAT THIS SCRIPT CORRECTS: XLA's `cost_analysis()` counts a
`lax.scan`/while body ONCE regardless of trip count, so analyzing the
whole `depthfm_generate` program undercounts the Euler loop 4x (and the
same limitation makes whole-trunk analysis of the scanned ViT pipelines
useless). Here the UNet step is lowered SEPARATELY and multiplied by
the step count explicitly:

    total = CA(full_generate)          # encode + guides + 1x unet + decode
          + (num_steps - 1) * CA(unet_step)

`flops` is XLA's algebraic count (matmul/conv dominated); `bytes
accessed` is the UNFUSED per-HLO accounting — an upper bound on real
HBM traffic, so the bandwidth line is conservative.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_cpu_parallel_codegen_split_count=1 \
        python benchmarks/depthfm_roofline.py
"""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from amodal_depth_anything_tpu.models.depthfm import (DepthFMConfig,
                                                      _conditioning,
                                                      _guide_latents,
                                                      depthfm_generate,
                                                      init_depthfm)
from amodal_depth_anything_tpu.models.unet_ldm import apply_unet
from amodal_depth_anything_tpu.models.vae import vae_encode_mode

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
MEASURED_IMG_S = 14.34   # v5e b8 @512 bf16 4-step, fused upsamplers
MEASURED_B1_P50_MS = 137.0
STEPS = 4

cfg = DepthFMConfig(guide_type="mask+observation")
B, S = 8, 512

params_shape = jax.eval_shape(lambda k: init_depthfm(k, cfg),
                              jax.random.PRNGKey(0))
params_shape = jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16)
    if jnp.issubdtype(a.dtype, jnp.floating) else a, params_shape)

ims_s = jax.ShapeDtypeStruct((B, S, S, 3), jnp.bfloat16)
mask_s = jax.ShapeDtypeStruct((B, S, S, 1), jnp.bfloat16)
obs_s = jax.ShapeDtypeStruct((B, S, S, 1), jnp.bfloat16)
rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)


def ca_flops_bytes(lowered):
    ca = lowered.cost_analysis()
    return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))


def gen(params, rng, ims, mask, obs):
    return depthfm_generate(params, cfg, rng, ims, num_steps=STEPS,
                            guide_mask=mask, observation=obs,
                            attn_impl="xla")


print("lowering full generate (scan body counted once) ...", flush=True)
f_full, b_full = ca_flops_bytes(jax.jit(gen).lower(
    params_shape, rng_s, ims_s, mask_s, obs_s))

# intermediate shapes for the stand-alone UNet step
def pre(params, ims, mask, obs):
    rgb_latent = vae_encode_mode(params["vae"], ims, cfg.vae)
    cond_latent = _guide_latents(params, cfg, rgb_latent, None, mask, obs)
    conditioning = _conditioning(params, ims.shape[0], ims.dtype)
    return rgb_latent, cond_latent, conditioning


z_s, cond_s, ctx_s = jax.eval_shape(pre, params_shape, ims_s, mask_s,
                                    obs_s)


def unet_step(params, z, cond, ctx):
    return apply_unet(params["unet"], cfg.unet, z,
                      jnp.zeros((B,), z.dtype), context=cond,
                      context_ca=ctx, attn_impl="xla")


print("lowering one UNet step ...", flush=True)
f_unet, b_unet = ca_flops_bytes(jax.jit(unet_step).lower(
    params_shape, z_s, cond_s, ctx_s))

flops = f_full + (STEPS - 1) * f_unet
bytes_acc = b_full + (STEPS - 1) * b_unet

per_img_tf = flops / B / 1e12
per_img_gb = bytes_acc / B / 1e9
sol_compute_ms = per_img_tf / V5E_BF16_TFLOPS * 1e3
sol_hbm_ms = per_img_gb / V5E_HBM_GBPS * 1e3
meas_ms = 1e3 / MEASURED_IMG_S

print(f"\nUNet step: {f_unet / B / 1e12:.3f} TF/img, "
      f"{b_unet / B / 1e9:.2f} GB/img (unfused)")
print(f"encode+guides+decode (full - 1 unet): "
      f"{(f_full - f_unet) / B / 1e12:.3f} TF/img, "
      f"{(b_full - b_unet) / B / 1e9:.2f} GB/img")
print(f"4-step total per image: {per_img_tf:.3f} TF, {per_img_gb:.2f} GB")
print(f"speed-of-light: compute {sol_compute_ms:.1f} ms/img "
      f"({1e3 / sol_compute_ms:.1f} img/s), "
      f"HBM-unfused {sol_hbm_ms:.1f} ms/img "
      f"({1e3 / sol_hbm_ms:.1f} img/s)")
print(f"measured: {meas_ms:.1f} ms/img ({MEASURED_IMG_S} img/s) -> "
      f"{per_img_tf / (meas_ms / 1e3):.0f} TF/s achieved = "
      f"{per_img_tf / (meas_ms / 1e3) / V5E_BF16_TFLOPS:.0%} of bf16 peak")
print(f"(b1 p50 {MEASURED_B1_P50_MS} ms -> "
      f"{per_img_tf / (MEASURED_B1_P50_MS / 1e3):.0f} TF/s)")
