"""A/B on the real TPU: q_split attention interleave at the serving
attention shapes. The residual over MXU speed-of-light at these shapes is
softmax VPU time that doesn't overlap the MXU (ROADMAP); q_split>1 makes
the per-chunk softmax independent of the next chunk's QK^T so the
scheduler MAY overlap the units. Row-exact — any win is free.

    python benchmarks/attn_qsplit_ab.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.ops.flash_attention import mha

key = jax.random.PRNGKey(0)


def timed(jf, *args, reps=20):
    t0 = time.time()
    float(jf(*args))
    tc = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = jf(*args)
    float(out)
    return (time.time() - t0) / reps * 1e3, tc


# (tag, B, H, N true, D): the two trunk serving shapes @1022 px
shapes = [("vitl [8,16,5330,64]", 8, 16, 5330, 64),
          ("vitg [8,24,5330,64]", 8, 24, 5330, 64)]
for tag, b, h, n, d in shapes:
    npad = ((n + 127) // 128) * 128
    q = jax.random.normal(key, (b, h, npad, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, npad, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, npad, d), jnp.bfloat16)
    # q_split=2 is the only aligned split at block_q=256 (bq 512 exceeds
    # scoped vmem at 5376 resident KV); repeat q_split=1 for a noise read
    for rep, qs in (("a", 1), ("a", 2), ("b", 1), ("b", 2)):
        jf = jax.jit(lambda qq, kk, vv, qs=qs, r=rep: jnp.sum(
            mha(qq, kk, vv, kv_len=n, q_split=qs)).astype(jnp.float32))
        dt, tc = timed(jf, q, k, v)
        print(f"{tag:22s} q_split={qs}/{rep}  {dt:8.2f} ms "
              f"(compile {tc:.1f}s)", flush=True)
