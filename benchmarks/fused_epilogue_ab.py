"""Single-session A/B on the real TPU: fused proj+LayerScale+residual
Pallas epilogue vs the XLA-emitted chain, at the vitg/vitl serving
shapes (round-3 VERDICT item 6 — one honest kernel-level attempt at the
~320 ms inter-matmul elementwise residue; see docs/ROADMAP.md roofline).

Measures the epilogue in isolation AND embedded in a 4-block mini-trunk
(isolated kernels can win while losing in situ to XLA's cross-op
fusion/scheduling).

    python benchmarks/fused_epilogue_ab.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.ops.fused_epilogue import (
    matmul_scale_residual, matmul_scale_residual_reference)

key = jax.random.PRNGKey(0)


def timed(jf, *args, reps=30):
    t0 = time.time()
    float(jf(*args))
    tc = time.time() - t0
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = jf(*args)
    float(out)
    return (time.time() - t0) / reps * 1e3, tc


# (tag, M = B * padded tokens, K=N=width): proj epilogue of the two
# trunks @1022 px batch 8
shapes = [("vitl proj [43008,1024]", 8 * 5376, 1024),
          ("vitg proj [43008,1536]", 8 * 5376, 1536)]

for tag, m, d in shapes:
    x = jax.random.normal(key, (m, d), jnp.bfloat16)
    w = jax.random.normal(key, (d, d), jnp.bfloat16) * 0.02
    b = jax.random.normal(key, (d,), jnp.float32) * 0.02
    g = jnp.full((d,), 1e-5, jnp.float32)
    r = jax.random.normal(key, (m, d), jnp.bfloat16)

    fx = jax.jit(lambda *a: jnp.sum(
        matmul_scale_residual_reference(*a)).astype(jnp.float32))
    for bm in (256, 512):
        fp = jax.jit(lambda *a, bm=bm: jnp.sum(
            matmul_scale_residual(*a, block_m=bm)).astype(jnp.float32))
        dt, tc = timed(fp, x, w, b, g, r)
        print(f"{tag:26s} pallas bm={bm:4d}  {dt:8.2f} ms (compile "
              f"{tc:.1f}s)", flush=True)
    # interleave XLA reads to bracket drift
    dt, tc = timed(fx, x, w, b, g, r)
    print(f"{tag:26s} xla            {dt:8.2f} ms (compile {tc:.1f}s)",
          flush=True)
    dt, _ = timed(fx, x, w, b, g, r)
    print(f"{tag:26s} xla (repeat)   {dt:8.2f} ms", flush=True)

# in-situ: 4 chained blocks of (attn-proj epilogue -> fc2 epilogue),
# mimicking the per-block elementwise structure without attention
print("\nin-situ 4-block chain (proj + fc2 epilogues, vitg width):",
      flush=True)
m, d = 8 * 5376, 1536
x = jax.random.normal(key, (m, d), jnp.bfloat16)
w1 = jax.random.normal(key, (d, d), jnp.bfloat16) * 0.02
b1 = jnp.zeros((d,), jnp.float32)
g1 = jnp.full((d,), 1e-5, jnp.float32)


def chain(fused):
    def f(x):
        for _ in range(4):
            if fused:
                x = matmul_scale_residual(x, w1, b1, g1, x)
            else:
                x = matmul_scale_residual_reference(x, w1, b1, g1, x)
        return jnp.sum(x).astype(jnp.float32)
    return jax.jit(f)


for rep in ("a", "b"):
    dt, tc = timed(chain(True), x)
    print(f"  pallas/{rep}  {dt:8.2f} ms (compile {tc:.1f}s)", flush=True)
    dt, tc = timed(chain(False), x)
    print(f"  xla/{rep}     {dt:8.2f} ms (compile {tc:.1f}s)", flush=True)
