"""Serving-state checkpoints: persist a READY-TO-SERVE pipeline.

The serving-optimization ladder mutates the param pytrees in place
(bf16 cast, W8A8 int8 weights + scale leaves from `quantize_int8`). The
calibrated int8 path in particular costs ~2 extra large jit programs
(~65 min of compiles through a tunneled TPU) plus a calibration forward —
per process. `save_serving` writes the EXACT post-optimization pytree
(mixed dtypes preserved: int8 kernels, f32/bf16 scales) plus the pipeline
construction metadata; `load_serving` restores a bit-identical serving
instance with zero re-quantization/calibration work. The reference has no
equivalent (its serving state is just the torch checkpoint; it has no
post-load optimization to persist).

Layout on disk:
  <path>/params/             Orbax PyTree checkpoint (dtypes preserved)
  <path>/flat/               restore-accelerator sidecar (round 5):
      plan.json              leaf keys + (chunk, offset, size, shape)
      chunk_<i>.bin          raw concatenated same-dtype leaf bytes
  <path>/serving_meta.json   pipeline kind + configs + runtime knobs

Why the sidecar: restoring multi-GB states through the tunneled TPU was
overhead-bound, not transfer-bound (runbooks v22-v26: link rate
30.8 MB/s, effective restore 9.4 MB/s). The Orbax host read, the host
re-concatenation, and ~one small split-program compile per 64 MB chunk
each cost more than the bytes. The sidecar stores the chunk buffers
EXACTLY as they are transferred (mmap-able raw bytes, no host rework)
and the on-device split runs as a few GROUP programs (deterministic ->
persistent-compile-cache hits) instead of one per chunk.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_serving_state", "restore_serving_state", "cfg_from_dict",
           "bulk_to_device"]

_META = "serving_meta.json"
_FLAT = "flat"

# One eager transfer per ~chunk instead of one per leaf: through the
# tunneled TPU, per-array dispatch pays a full roundtrip each (~0.5 s x
# ~600 SAM leaves ~= the 305 s "8 MB/s" load_serving wall, round-4
# VERDICT weak #3) while a single large device_put runs at the probed
# link rate. Chunk size from the v22 transfer probe (one session,
# back-to-back): 64 MB chunks sustain 30.8 MB/s while a single 256 MB
# put dropped to 16.0 MB/s (per-leaf lazy: 4.3 MB/s) — the tunnel
# throttles very large single transfers, so 64 MB is the sweet spot.
_CHUNK_BYTES = 64 * 1024 * 1024
# On-device split-program granularity: one jit per <=group of chunks.
# Whole-tree (one program) holds chunks + leaves live at once — 2x the
# stack transiently, which OOMed the 16 GB chip on the ~7 GB f32 stack
# (v22 row 3); per-chunk programs bound memory but cost ~one tunnel
# compile per 64 MB (the v26 restore wall). Groups bound the transient
# to leaves + ~1.5 GB while cutting program count ~24x.
_GROUP_BYTES = 1536 * 1024 * 1024


def _plan(leaves, chunk_bytes):
    """Pack leaf order into same-dtype chunks of <= chunk_bytes.

    Returns (plans, chunk_dtypes): plans[i] = (cid, offset, size, shape)
    per leaf in tree-flatten order; chunk_dtypes[cid] = np.dtype."""
    plans = [None] * len(leaves)
    chunk_dtypes: list = []
    open_chunks: dict = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dt = a.dtype
        per = max(1, chunk_bytes // max(dt.itemsize, 1))
        cur = open_chunks.get(dt)
        if cur is None or cur[1] + a.size > per:
            chunk_dtypes.append(dt)
            open_chunks[dt] = [len(chunk_dtypes) - 1, 0]
            cur = open_chunks[dt]
        plans[i] = (cur[0], cur[1], a.size, a.shape)
        cur[1] += a.size
    return plans, chunk_dtypes


def _split_on_host(next_buf, n_chunks, per_chunk, plans, treedef, *,
                   debug=False):
    """AMODAL_FLAT_SPLIT=host: slice leaves as zero-copy NUMPY views of
    the host chunk buffer and ship them with one batched
    `jax.device_put(list)` per chunk — no on-device split programs at
    all. Rationale (runbook v30): with the compile cache warm the
    device-split restore is NOT byte-bound (put-dispatch 23 s for
    2.3 GB) but split-PROGRAM-bound (124.7 s to reload two giant
    hundreds-of-outputs executables; 906 s cold). Batched device_put
    pays neither compile nor executable-deserialize cost, and the
    transfers pipeline inside one dispatch (the old 4.3 MB/s "per-leaf"
    number was N sequential put+sync roundtrips — transfer_probe.py).
    Transient memory is bounded by construction: leaves land in their
    final buffers, the chunk itself never reaches the device."""
    t0 = time.perf_counter()
    new_leaves: list = [None] * len(plans)
    lasts = []
    for cid in range(n_chunks):
        buf = next_buf()
        entries = per_chunk[cid]
        views = [buf[off:off + size].reshape(shape)
                 for (_, off, size, shape) in entries]
        devs = jax.device_put(views)
        for (i, *_), d in zip(entries, devs):
            new_leaves[i] = d
        if devs:
            lasts = devs[-1:]
    t_put = time.perf_counter() - t0
    # hard sync on the final transfer: device_put is async — without it
    # the caller would time dispatch, not arrival. One scalar fetch
    # (the repo's sync primitive; block_until_ready is unreliable
    # through the tunnel) — h2d copies to the one device drain FIFO, so
    # the last leaf arriving bounds the rest; consumers of any leaf
    # block on its own transfer regardless, this sync is for timing.
    for d in lasts:
        float(jnp.sum(d))
    if debug:
        import sys
        print(f"split_on_host: {n_chunks} chunks, {len(plans)} leaves, "
              f"put-dispatch {t_put:.1f}s sync "
              f"{time.perf_counter() - t0 - t_put:.1f}s",
              file=sys.stderr, flush=True)
    return jax.tree.unflatten(treedef, new_leaves)


def _split_groups(next_buf, n_chunks, chunk_nbytes, plans, treedef, *,
                  group_bytes, debug=False):
    """Stream host chunk buffers (from `next_buf()`, in chunk order) to
    device and slice leaves back out with one jit per <=group_bytes
    worth of chunks. Transient device memory stays bounded at
    leaves-so-far + one group (a whole-tree program OOMed at 2x the
    stack, v22 row 3), and the group programs are deterministic —
    repeat restores hit the persistent compile cache."""
    per_chunk: list = [[] for _ in range(n_chunks)]
    for i, (cid, off, size, shape) in enumerate(plans):
        per_chunk[cid].append((i, off, size, shape))

    # host is the DEFAULT since the runbook v35 A/B (fresh-host min-
    # bytes stack, back-to-back): host 66.9-72.1 s vs device-warm
    # 86.7 s param_init — and the device mode's cold-restore cliff
    # (906 s of split-program compiles, v30 row A) does not exist at
    # all. AMODAL_FLAT_SPLIT=device keeps the split-program path.
    if os.environ.get("AMODAL_FLAT_SPLIT", "host") == "host":
        return _split_on_host(next_buf, n_chunks, per_chunk, plans,
                              treedef, debug=debug)

    groups: list = []
    acc, acc_bytes = [], 0
    for cid in range(n_chunks):
        if acc and acc_bytes + chunk_nbytes[cid] > group_bytes:
            groups.append(acc)
            acc, acc_bytes = [], 0
        acc.append(cid)
        acc_bytes += chunk_nbytes[cid]
    if acc:
        groups.append(acc)

    t_put = t_split = 0.0
    new_leaves: list = [None] * len(plans)
    for cids in groups:
        t0 = time.perf_counter()
        # async dispatch: the transfers execute while next_buf() reads
        # the following chunks from disk (flat path's prefetch thread)
        dbufs = [jax.device_put(next_buf()) for _ in cids]
        t1 = time.perf_counter()

        def split_group(bs, plan=tuple(
                (k, tuple(per_chunk[c])) for k, c in enumerate(cids))):
            out = []
            for k, entries in plan:
                for _, off, size, shape in entries:
                    out.append(jax.lax.dynamic_slice_in_dim(
                        bs[k], off, size).reshape(shape))
            return out

        outs = jax.jit(split_group)(dbufs)
        # HARD sync before dispatching the next group: dispatch is
        # async, so without it the python loop enqueues every group's
        # puts+splits while execution lags behind the slow transfers —
        # all chunks AND all leaves get allocated up front (the 2x peak
        # this grouping exists to avoid; OOMed the f32 stack, v28 row
        # 3). One scalar fetch per ~1.5 GB group is noise; the disk
        # prefetch thread keeps reading ahead during the wait.
        float(jnp.sum(outs[0]))
        t2 = time.perf_counter()
        t_put += t1 - t0
        t_split += t2 - t1
        j = 0
        for c in cids:
            for (i, *_) in per_chunk[c]:
                new_leaves[i] = outs[j]
                j += 1
        del dbufs  # refcount drop; freed once the split has consumed them
    if debug:
        import sys
        print(f"split_groups: {n_chunks} chunks in {len(groups)} "
              f"programs, put-dispatch {t_put:.1f}s split-jit "
              f"{t_split:.1f}s", file=sys.stderr, flush=True)
    return jax.tree.unflatten(treedef, new_leaves)


def bulk_to_device(tree, *, chunk_bytes: int = _CHUNK_BYTES,
                   group_bytes: int = _GROUP_BYTES):
    """Host (numpy-leaf) pytree -> committed device pytree, transferring
    same-dtype leaves concatenated into few large buffers (the per-leaf
    lazy path — `jax.tree.map(jnp.asarray, tree)` — defers each transfer
    to first use and pays per-op tunnel latency)."""
    leaves, treedef = jax.tree.flatten(tree)
    plans, chunk_dtypes = _plan(leaves, chunk_bytes)
    debug = os.environ.get("AMODAL_RESTORE_DEBUG", "") == "1"

    if os.environ.get("AMODAL_FLAT_SPLIT", "host") == "host":
        # host-split default (runbook v35): batched device_put of the
        # leaves themselves — the concat+split dance exists only to
        # feed the device split programs, which host mode doesn't use.
        # Batch in plan-order groups so dispatch stays chunk-granular.
        t0 = time.perf_counter()
        new_leaves: list = [None] * len(leaves)
        by_chunk: list = [[] for _ in chunk_dtypes]
        for i, p in enumerate(plans):
            by_chunk[p[0]].append(i)
        last = None
        for idxs in by_chunk:
            devs = jax.device_put([np.asarray(leaves[i]) for i in idxs])
            for i, d in zip(idxs, devs):
                new_leaves[i] = d
                last = d
        if last is not None:
            float(jnp.sum(last))  # timing sync (see _split_on_host)
        if debug:
            import sys
            print(f"bulk_to_device(host): {len(leaves)} leaves in "
                  f"{len(by_chunk)} batches, "
                  f"{time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        return jax.tree.unflatten(treedef, new_leaves)

    t0 = time.perf_counter()
    parts: list = [[] for _ in chunk_dtypes]
    for i, leaf in enumerate(leaves):
        parts[plans[i][0]].append(np.asarray(leaf).ravel())
    host_bufs = [np.concatenate(p) if len(p) > 1 else p[0] for p in parts]
    if debug:
        import sys
        print(f"bulk_to_device: host concat "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
              flush=True)
    it = iter(host_bufs)
    return _split_groups(lambda: next(it), len(host_bufs),
                         [b.nbytes for b in host_bufs], plans, treedef,
                         group_bytes=group_bytes, debug=debug)


def bulk_to_host(tree, *, chunk_bytes: int = _CHUNK_BYTES,
                 group_bytes: int = _GROUP_BYTES):
    """Device pytree -> (host pytree of views, host chunk buffers, plans).

    The save-side mirror of `bulk_to_device`: per-leaf `np.asarray`
    fetches pay one tunnel roundtrip each (the d2h version of the 305 s
    lazy-restore wall), so leaves are concatenated ON DEVICE into the
    same chunk layout the flat sidecar stores (one jit per group of
    chunks, deterministic -> compile-cache-friendly), each chunk is
    fetched as one bulk transfer, and the host leaves are ZERO-COPY
    views into the chunk buffers."""
    leaves, treedef = jax.tree.flatten(tree)
    plans, chunk_dtypes = _plan(leaves, chunk_bytes)
    debug = os.environ.get("AMODAL_RESTORE_DEBUG", "") == "1"

    per_chunk: list = [[] for _ in chunk_dtypes]
    for i, (cid, off, size, shape) in enumerate(plans):
        per_chunk[cid].append(i)
    chunk_nbytes = [sum(leaves[i].dtype.itemsize * leaves[i].size
                        for i in idxs) for idxs in per_chunk]

    groups: list = []
    acc, acc_b = [], 0
    for cid in range(len(chunk_dtypes)):
        if acc and acc_b + chunk_nbytes[cid] > group_bytes:
            groups.append(acc)
            acc, acc_b = [], 0
        acc.append(cid)
        acc_b += chunk_nbytes[cid]
    if acc:
        groups.append(acc)

    t_cat = t_fetch = 0.0
    host_bufs: list = [None] * len(chunk_dtypes)
    for cids in groups:
        t0 = time.perf_counter()

        def concat_group(ls, cids=tuple(cids)):
            return [jnp.concatenate([ls[i].ravel() for i in per_chunk[c]])
                    if len(per_chunk[c]) > 1 else ls[per_chunk[c][0]].ravel()
                    for c in cids]

        dev_chunks = jax.jit(concat_group)(leaves)
        t1 = time.perf_counter()
        for c, d in zip(cids, dev_chunks):
            host_bufs[c] = np.asarray(d)
        del dev_chunks
        t2 = time.perf_counter()
        t_cat += t1 - t0
        t_fetch += t2 - t1
    if debug:
        import sys
        print(f"bulk_to_host: {len(chunk_dtypes)} chunks in "
              f"{len(groups)} programs, concat-jit {t_cat:.1f}s "
              f"fetch {t_fetch:.1f}s", file=sys.stderr, flush=True)

    host_leaves: list = [None] * len(leaves)
    for i, (cid, off, size, shape) in enumerate(plans):
        host_leaves[i] = host_bufs[cid][off:off + size].reshape(shape)
    return jax.tree.unflatten(treedef, host_leaves), host_bufs, plans


# ------------------------------------------------------- flat key helpers
# plain nested dicts only (repo convention for param trees)


def _flatten_keys(tree) -> list:
    import jax.tree_util as jtu
    return ["/".join(str(p.key) for p in path)
            for path, _ in jtu.tree_flatten_with_path(tree)[0]]


def _unflatten_keys(keys, leaves) -> dict:
    tree: dict = {}
    for key, leaf in zip(keys, leaves):
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


def _write_flat(path: str, host_tree, host_bufs, plans) -> None:
    """Write the restore-accelerator sidecar: the chunk buffers exactly
    as `bulk_to_host` fetched them (restore transfers them verbatim),
    plus the slicing plan."""
    keys = _flatten_keys(host_tree)
    leaves = jax.tree.leaves(host_tree)

    flat_dir = os.path.join(path, _FLAT)
    os.makedirs(flat_dir, exist_ok=True)
    for c, buf in enumerate(host_bufs):
        tmp = os.path.join(flat_dir, f"chunk_{c}.bin.tmp")
        buf.tofile(tmp)
        os.replace(tmp, os.path.join(flat_dir, f"chunk_{c}.bin"))
    plan_doc = {
        "chunks": [{"file": f"chunk_{c}.bin", "dtype": str(b.dtype)}
                   for c, b in enumerate(host_bufs)],
        "leaves": [{"key": k, "cid": p[0], "off": p[1], "size": p[2],
                    "shape": list(p[3]), "dtype": str(np.asarray(le).dtype)}
                   for k, p, le in zip(keys, plans, leaves)],
    }
    tmp = os.path.join(flat_dir, "plan.json.tmp")
    with open(tmp, "w") as f:
        json.dump(plan_doc, f)
    os.replace(tmp, os.path.join(flat_dir, "plan.json"))


def _read_flat(path: str, *, group_bytes=_GROUP_BYTES) -> dict:
    """Restore from the flat sidecar: raw file reads (no Orbax walk, no
    host re-concatenation), chunked transfers, group split programs.
    Disk reads run on a prefetch thread one chunk AHEAD of the transfer
    loop, so the measured ~50 MB/s disk and the ~30 MB/s tunnel overlap
    instead of adding (the restore floor is max of the two, not sum)."""
    import queue
    import threading

    flat_dir = os.path.join(path, _FLAT)
    with open(os.path.join(flat_dir, "plan.json")) as f:
        doc = json.load(f)
    debug = os.environ.get("AMODAL_RESTORE_DEBUG", "") == "1"

    q: queue.Queue = queue.Queue(maxsize=3)

    def reader():
        try:
            for c in doc["chunks"]:
                q.put(np.fromfile(os.path.join(flat_dir, c["file"]),
                                  dtype=_np_dtype(c["dtype"])))
        except Exception as e:  # surfaces in the consumer
            q.put(e)

    threading.Thread(target=reader, daemon=True).start()

    def next_buf():
        item = q.get()
        if isinstance(item, Exception):
            raise item
        return item

    plans = [(le["cid"], le["off"], le["size"], tuple(le["shape"]))
             for le in doc["leaves"]]
    keys = [le["key"] for le in doc["leaves"]]
    # build an equal-structure skeleton so tree-flatten order matches
    skeleton = _unflatten_keys(keys, list(range(len(keys))))
    _, treedef = jax.tree.flatten(skeleton)
    # tree-flatten sorts dict keys; remap plans into flatten order
    order = jax.tree.leaves(skeleton)
    plans = [plans[i] for i in order]
    n_chunks = len(doc["chunks"])
    chunk_nbytes = [0] * n_chunks
    for le in doc["leaves"]:
        chunk_nbytes[le["cid"]] += le["size"] * \
            _np_dtype(le["dtype"]).itemsize
    return _split_groups(next_buf, n_chunks, chunk_nbytes, plans, treedef,
                         group_bytes=group_bytes, debug=debug)


def cfg_from_dict(cls, d: dict):
    """Rebuild a flat config dataclass from its JSON dict (tuples come
    back as lists — coerce; ignore unknown keys so configs can grow)."""
    names = {f.name for f in dataclasses.fields(cls)}
    kw = {k: (tuple(v) if isinstance(v, list) else v)
          for k, v in d.items() if k in names}
    return cls(**kw)


def save_serving_state(path: str, trees: dict, meta: dict) -> None:
    """trees: {name: param pytree}; meta: JSON-able construction info.

    Fetches the trees to host ONCE (multi-GB device->host through the
    tunnel is the dominant save cost) and writes both formats from the
    same host copy: the authoritative Orbax checkpoint and the flat
    restore-accelerator sidecar."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    # one bulk device->host fetch shared by both formats (per-leaf
    # fetches pay a tunnel roundtrip each — the d2h twin of the lazy-
    # restore wall); the Orbax leaves are zero-copy views into the same
    # chunk buffers the sidecar stores
    host_trees, host_bufs, plans = bulk_to_host(trees)
    ocp.PyTreeCheckpointer().save(os.path.join(path, "params"), host_trees,
                                  force=True)
    _write_flat(path, host_trees, host_bufs, plans)
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


def restore_serving_state(path: str, *, expect_kind: str):
    """-> (trees, meta). Leaves come back as device arrays with their
    saved dtypes (int8 kernels stay int8 — no cast)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    kind = meta.get("kind")
    if kind != expect_kind:
        raise ValueError(f"{path} holds a {kind!r} serving state, "
                         f"expected {expect_kind!r}")
    bulk = os.environ.get("AMODAL_BULK_RESTORE", "1") != "0"
    if bulk and os.path.exists(os.path.join(path, _FLAT, "plan.json")):
        return _read_flat(path), meta

    import orbax.checkpoint as ocp
    t0 = time.perf_counter()
    trees = ocp.PyTreeCheckpointer().restore(os.path.join(path, "params"))
    if os.environ.get("AMODAL_RESTORE_DEBUG", "") == "1":
        import sys
        print(f"restore: orbax host read "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
              flush=True)
    if bulk:
        trees = bulk_to_device(trees)
    else:
        # legacy per-leaf path (lazy through the axon plugin — first use
        # pays ~one tunnel roundtrip per leaf; keep for A/B)
        trees = jax.tree.map(jnp.asarray, trees)
    return trees, meta
