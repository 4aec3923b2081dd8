"""Tunnel transfer-rate microbench (round-4 VERDICT weak #3 evidence).

The load_serving wall was ~305 s for SAM's params in BOTH v20/v21 rows
while the probed device->host rate was 29.8 MB/s — a ~4x shortfall that
smelled like per-array dispatch latency, not bandwidth. This probe
separates the two directions and the two shapes of host->device traffic:

  d2h        one 17 MB fetch (the CLAUDE.md health probe)
  h2d bulk   one 256 MB device_put + scalar-sync
  h2d leaves N x 64 KB device_put (the lazy per-leaf restore pattern)
  h2d chunked-tree  bulk_to_device on a synthetic 600-leaf f32 tree

Prints one JSON line per measurement. Run on the real TPU behind the
runbook probe gate; rates through the tunnel are only comparable
back-to-back in one session (~±8% noise).
"""

import json
import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/transfer_probe.py` (script dir is not
# the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x) -> float:
    # scalar fetch is the only reliable device barrier through the tunnel
    return float(jnp.sum(x.astype(jnp.float32)))


def row(name, seconds, mbytes):
    print(json.dumps({"metric": f"transfer {name}", "value":
                      round(mbytes / seconds, 2), "unit": "MB/s",
                      "seconds": round(seconds, 2), "MB": round(mbytes, 1)}),
          flush=True)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"metric": "platform", "value": dev.platform}),
          flush=True)
    # warm the dispatch path
    sync(jax.device_put(np.ones((8,), np.float32)))

    # d2h: 17 MB fetch (health-probe sized)
    a = jax.device_put(np.ones((17 * 1024 * 1024 // 4,), np.float32))
    sync(a)
    t0 = time.perf_counter()
    np.asarray(a)
    row("d2h 17MB fetch", time.perf_counter() - t0, 17)

    # h2d bulk: one large device_put
    for mb in (64, 256):
        h = np.random.default_rng(0).standard_normal(
            (mb * 1024 * 1024 // 4,)).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(h)
        sync(d[:8])
        row(f"h2d bulk {mb}MB", time.perf_counter() - t0, mb)
        del d

    # h2d per-leaf: the lazy restore pattern — many small arrays, one
    # jit consumer forcing them all on device (how the first SAM call
    # materializes a lazily-restored tree)
    n, kb = int(os.environ.get("N_LEAVES", "600")), 64
    leaves = [np.random.default_rng(i).standard_normal(
        (kb * 1024 // 4,)).astype(np.float32) for i in range(n)]
    t0 = time.perf_counter()
    devs = [jnp.asarray(x) for x in leaves]
    s = jax.jit(lambda ts: sum(jnp.sum(t) for t in ts))(devs)
    float(s)
    row(f"h2d per-leaf {n}x{kb}KB", time.perf_counter() - t0,
        n * kb / 1024)
    del devs

    # h2d chunked-tree: bulk_to_device on a 600-leaf tree (the new
    # restore path) — same bytes as per-leaf, few transfers
    from amodal_depth_anything_tpu.pipeline.serving_ckpt import \
        bulk_to_device
    tree = {f"l{i}": x for i, x in enumerate(leaves)}
    t0 = time.perf_counter()
    out = bulk_to_device(tree)
    sync(out["l0"][:8])
    row(f"h2d bulk_to_device {n}x{kb}KB", time.perf_counter() - t0,
        n * kb / 1024)


if __name__ == "__main__":
    main()
