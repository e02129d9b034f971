"""Relay cost-structure probe: decomposes the serving cycle into its
transport terms so "tunnel weather" is a measured artifact, not prose.

The serving capacity model (RESULTS.md round 3) is
``QPS ≈ B / cycle(B)`` where the cycle is upload → execute → fetch,
serialized on the axon relay's command stream.  This probe prices each
term on the live relay:

- ``sync_rtt_ms``: fetch of a [1] scalar — the floor any synchronous
  interaction pays.
- ``fetch_per_array_ms`` / ``fetch_per_mb_ms``: a fixed-bytes fetch
  split across 1/3/9 arrays vs a fixed-count fetch of growing payload —
  separates the per-ARRAY round-trip term (which result packing
  removes) from the per-byte bandwidth term (which it can't).
- ``cycle_unpacked_ms`` / ``cycle_packed_ms``: the full serialized
  serving cycle at the given batch through the real IVF search fn, with
  the result tree fetched as 3 leaves vs as the executor's packed
  single array (``BatchingExecutor._maybe_pack``'s program).

Every timed interaction uses DISTINCT inputs (the relay serves repeated
identical calls from a cache — harness/timing.py) and drops the first
(warm/compile) sample.

Usage:
    python -m rag_on_edge_tpu.harness.relay_probe [--batch 16384] \
        [--nprobe 4] [--rounds 5] [--json]

The executor's packing decision (`pack="auto"`) is justified exactly
when ``fetch_per_array_ms`` dominates ``fetch_per_mb_ms * payload``;
record both next to any serving number.  (Reference latency schema:
``main.cpp:281-318`` — per-batch percentiles; this probe is the
transport-side analog the reference never needed because its device is
on-die.)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _median_timed(fn, rounds: int) -> float:
    """Median wall ms over ``rounds`` calls (caller guarantees each call
    does fresh work; the first sample is dropped as warmup)."""
    times = []
    for _ in range(rounds + 1):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times[1:]))


def _fresh_arrays(total_f32: int, n_arrays: int, seed_holder: list):
    """n device arrays of total_f32 floats total, DISTINCT values each
    call (defeats relay result caching), materialized on device before
    the timed fetch."""
    import jax
    import jax.numpy as jnp

    seed_holder[0] += 1
    rng = np.random.default_rng(seed_holder[0])
    per = total_f32 // n_arrays
    host = rng.uniform(0, 1, size=(n_arrays, per)).astype(np.float32)
    # A jitted +1 forces each upload into a device-resident EXECUTED
    # buffer (device_put alone can stay lazy on this stack).
    bump = jax.jit(lambda x: x + 1.0)
    arrs = [bump(jnp.asarray(host[i])) for i in range(n_arrays)]
    # Force every execute NOW via one dependent-scalar materialization
    # (block_until_ready does not force execution through the relay;
    # leaving the bumps lazy would bill their executes to the timed
    # fetch and contaminate the per-array slope with the per-execute
    # RPC).
    probe = arrs[0][:1]
    for a in arrs[1:]:
        probe = probe + a[:1]
    np.asarray(probe)
    return arrs


def probe_fetch(rounds: int = 5, total_mb: float = 1.25) -> dict:
    """Fetch-cost decomposition: per-array round-trip term vs per-byte
    bandwidth term."""
    import jax

    seed = [0]
    total = int(total_mb * (1 << 20) / 4)
    out = {}
    # Fixed bytes, varying array count → slope is the per-array term.
    for n in (1, 3, 9):
        arrs_box = {}

        def cycle(n=n):
            arrs_box["a"] = _fresh_arrays(total, n, seed)
            t0 = time.perf_counter()
            jax.device_get(arrs_box["a"])
            return (time.perf_counter() - t0) * 1e3

        samples = [cycle() for _ in range(rounds + 1)][1:]
        out[f"fetch_{n}_arrays_ms"] = round(float(np.median(samples)), 1)
    per_array = (out["fetch_9_arrays_ms"] - out["fetch_1_arrays_ms"]) / 8
    out["fetch_per_array_ms"] = round(per_array, 1)
    # Fixed count (1 array), varying bytes → slope is the per-MB term.
    for mb in (total_mb, total_mb * 4):
        def cycle(mb=mb):
            arrs = _fresh_arrays(int(mb * (1 << 20) / 4), 1, seed)
            t0 = time.perf_counter()
            jax.device_get(arrs)
            return (time.perf_counter() - t0) * 1e3

        samples = [cycle() for _ in range(rounds + 1)][1:]
        out[f"fetch_{mb:g}mb_ms"] = round(float(np.median(samples)), 1)
    out["fetch_per_mb_ms"] = round(
        (out[f"fetch_{total_mb * 4:g}mb_ms"] - out[f"fetch_{total_mb:g}mb_ms"])
        / (3 * total_mb), 1)
    # Sync RTT floor: a [1] fetch.
    def tiny():
        arrs = _fresh_arrays(1, 1, seed)
        t0 = time.perf_counter()
        jax.device_get(arrs)
        return (time.perf_counter() - t0) * 1e3

    out["sync_rtt_ms"] = round(float(np.median(
        [tiny() for _ in range(rounds + 1)][1:])), 1)
    return out


def probe_cycle(batch: int = 16384, nprobe: int = 4, k: int = 10,
                rounds: int = 5, dataset: str = "sift") -> dict:
    """Full serialized serving cycle through the real 1M IVF program:
    upload + execute + fetch, with the result tree fetched unpacked
    (3 leaves) vs packed (1 array via the executor's pack program)."""
    import jax
    import jax.numpy as jnp

    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.runtime.executor import BatchingExecutor
    from rag_on_edge_tpu.utils.datasets import load_dataset

    ds = load_dataset(dataset, gt_k=k)
    pad_block = 2048 if ds.base.shape[0] >= 500_000 else None
    index = build_or_load_index(ds, nlist=None, metric="l2", dtype="int8",
                                pad_block=pad_block)
    index.compile(batch, k, nprobe, mode="cluster", recover_passes=1)
    fn = lambda q: index.search_device(  # noqa: E731
        q, k, nprobe, mode="cluster", recover_passes=1)
    # Borrow the executor's pack program so the probe prices EXACTLY the
    # serving path's fused fetch (no second implementation to drift).
    ex = BatchingExecutor(fn, dim=ds.base.shape[1], batch_size=batch)
    try:
        rng = np.random.default_rng(7)
        dim = ds.base.shape[1]

        def mk():
            return jnp.asarray(np.resize(ds.queries, (batch, dim))
                               + rng.uniform(0, 1e-3, (batch, dim))
                               .astype(np.float32))

        def unpacked():
            jax.device_get(jax.tree_util.tree_leaves(fn(mk())))

        def packed():
            out, did = ex._maybe_pack(fn(mk()))
            assert did, "pack program did not engage"
            jax.device_get(out)

        res = {
            "batch": batch,
            "nprobe": nprobe,
            "cycle_unpacked_ms": round(_median_timed(unpacked, rounds), 1),
            "cycle_packed_ms": round(_median_timed(packed, rounds), 1),
        }
        res["capacity_unpacked_qps"] = round(
            batch / res["cycle_unpacked_ms"] * 1e3)
        res["capacity_packed_qps"] = round(
            batch / res["cycle_packed_ms"] * 1e3)
        return res
    finally:
        ex.close()


def main(argv=None) -> None:
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--skip-cycle", action="store_true",
                   help="transport terms only (no 1M index load)")
    p.add_argument("--json", action="store_true")
    p.add_argument("--outdir", default="results",
                   help="persist the decomposition as a stamped JSON "
                        'artifact ("" disables) — every weather claim '
                        "should point at one of these")
    args = p.parse_args(argv)
    out = probe_fetch(rounds=args.rounds)
    if not args.skip_cycle:
        out.update(probe_cycle(batch=args.batch, nprobe=args.nprobe,
                               rounds=args.rounds))
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:>28}: {v}")
    if args.outdir:
        import os

        os.makedirs(args.outdir, exist_ok=True)
        path = os.path.join(
            args.outdir,
            f"relay_probe_{time.strftime('%Y%m%d_%H%M%S')}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[relay_probe] artifact: {path}", flush=True)


if __name__ == "__main__":
    main()
