"""DepthFM serving roofline from XLA's own cost model.

Completes the speed-of-light accounting (flagship pipeline + train-step
rooflines live in docs/ROADMAP.md): lowers the EXACT 4-step
DepthFMAmodal eval program (b8 @512, the bench configuration) on CPU,
reads `cost_analysis()` (flops + bytes accessed) off the compiled
executable, and combines with the measured v5e throughput to report
achieved TF/s and % of the 197 TF/s bf16 MXU peak / 819 GB/s HBM.

XLA's `flops` counts every HLO's algebraic work (matmul/conv dominated
here); `bytes accessed` is the HBM traffic of the UNFUSED accounting —
an upper bound on real traffic after fusion, so the bandwidth line is
conservative.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_cpu_parallel_codegen_split_count=1 \
        python benchmarks/depthfm_roofline.py
"""
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from amodal_depth_anything_tpu.models.depthfm import (DepthFMConfig,
                                                      depthfm_generate,
                                                      init_depthfm)

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
MEASURED_IMG_S = 14.34   # v5e b8 @512 bf16 4-step, fused upsamplers
MEASURED_B1_P50_MS = 137.0

cfg = DepthFMConfig(guide_type="mask+observation")
B, S = 8, 512

# abstract init (no host RAM for 950M f32 params — eval_shape gives the
# tree structure; lower() only needs shapes/dtypes)
params_shape = jax.eval_shape(lambda k: init_depthfm(k, cfg),
                              jax.random.PRNGKey(0))
params_shape = jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, jnp.bfloat16)
    if jnp.issubdtype(a.dtype, jnp.floating) else a, params_shape)


def gen(params, rng, ims, mask, obs):
    return depthfm_generate(params, cfg, rng, ims, num_steps=4,
                            guide_mask=mask, observation=obs,
                            attn_impl="xla")


args = (params_shape, jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((B, S, S, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((B, S, S, 1), jnp.bfloat16),
        jax.ShapeDtypeStruct((B, S, S, 1), jnp.bfloat16))

print(f"lowering 4-step DepthFMAmodal eval b{B} @{S}px bf16 ...",
      flush=True)
compiled = jax.jit(gen).lower(*args).compile()
ca = compiled.cost_analysis()
flops = float(ca["flops"])
bytes_acc = float(ca.get("bytes accessed", 0.0))

per_img_tf = flops / B / 1e12
per_img_gb = bytes_acc / B / 1e9
sol_compute_ms = per_img_tf / V5E_BF16_TFLOPS * 1e3
sol_hbm_ms = per_img_gb / V5E_HBM_GBPS * 1e3
meas_ms = 1e3 / MEASURED_IMG_S

print(f"\nprogram totals (batch {B}): {flops / 1e12:.2f} TF, "
      f"{bytes_acc / 1e9:.1f} GB accessed (unfused upper bound)")
print(f"per image: {per_img_tf:.3f} TF, {per_img_gb:.2f} GB")
print(f"speed-of-light: compute {sol_compute_ms:.1f} ms/img "
      f"({1e3 / sol_compute_ms:.1f} img/s), "
      f"HBM {sol_hbm_ms:.1f} ms/img ({1e3 / sol_hbm_ms:.1f} img/s)")
print(f"measured: {meas_ms:.1f} ms/img ({MEASURED_IMG_S} img/s) -> "
      f"{per_img_tf / (meas_ms / 1e3):.0f} TF/s achieved = "
      f"{per_img_tf / (meas_ms / 1e3) / V5E_BF16_TFLOPS:.0%} of bf16 peak")
print(f"(b1 p50 {MEASURED_B1_P50_MS} ms -> "
      f"{per_img_tf / (MEASURED_B1_P50_MS / 1e3):.0f} TF/s)")
