"""Pre-warm every artifact and executable ``bench.py`` needs.

Run this BEFORE the driver's benchmark (``python -m
rag_on_edge_tpu.harness.warmup``): it synthesizes/caches the datasets and
ground truth, builds the canonical 1M IVF index, and compiles every
program the bench runs into the persistent compilation cache
(``utils/cache.py``) — so the driver run pays zero cold remote compiles.

This is the TPU analog of the reference's context-binary pre-generation
(``deploy.sh:200-232``: QNN binaries are built once, the benchmark run
only loads them; ``run_all_ivf.sh:72-94`` regenerates only if missing).
The round-2 driver bench timed out (>25 min, rc=124) largely on cold
remote compiles of that round's new kernels — this entrypoint makes the
failure mode structurally impossible as long as it has been run once on
the same machine.

Each stage prints wall time (flushed) so a relay outage is visible
immediately; every stage is resumable (dataset files, kmeans checkpoint,
index artifacts, compile cache are all persistent).
"""

from __future__ import annotations

import os
import sys
import time


def _stage(name: str):
    print(f"[warmup] {name} ...", flush=True)
    return time.monotonic()


def _done(t0: float) -> None:
    print(f"[warmup]   done in {time.monotonic() - t0:.1f}s", flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    cache_dir = enable_compilation_cache()
    print(f"[warmup] compile cache at {cache_dir}", flush=True)

    t = _stage("siftsmall dataset (synth + GT)")
    ds_small = load_dataset("siftsmall", gt_k=10)
    _done(t)

    t = _stage("sift (1M) dataset (synth + GT; first run ~minutes)")
    ds = load_dataset("sift", gt_k=10)
    _done(t)

    t = _stage("1M IVF index build/load (nlist=1024 l2 int8 pb=2048)")
    idx = build_or_load_index(ds, nlist=1024, metric="l2", dtype="int8",
                              pad_block=2048)
    _done(t)

    t = _stage("compile+run: IVF search_device B=8192 np=4 k=10")
    qs = jnp.asarray(np.resize(ds.queries, (8192, ds.queries.shape[1])))
    jax.block_until_ready(idx.search_device(qs, 10, 4, mode="cluster"))
    _done(t)

    t = _stage("1M IVF pb=512 variant build/load + compile (672K dial point)")
    idx512 = build_or_load_index(ds, nlist=1024, metric="l2", dtype="int8",
                                 pad_block=512)
    jax.block_until_ready(idx512.search_device(qs, 10, 4, mode="cluster"))
    del idx512
    _done(t)

    t = _stage("compile+run: serving program B=16384 np=4 rp=1 (bench serving + relay probe)")
    qs16 = jnp.asarray(np.resize(ds.queries, (16384, ds.queries.shape[1])))
    jax.block_until_ready(
        idx.search_device(qs16, 10, 4, mode="cluster", recover_passes=1))
    # The serving path uploads uint8 (lossless for integral corpora) and
    # casts to f32 inside the jit — a DISTINCT traced program from f32's.
    jax.block_until_ready(
        idx.search_device(qs16.astype(jnp.uint8), 10, 4, mode="cluster",
                          recover_passes=1))
    del qs16
    _done(t)

    t = _stage("compile+run: brute 1M rescored (accum) + exact (pallas) B=8192 k=10")
    brute = BruteForceIndex(ds.base, metric="l2", dtype="int8")
    jax.block_until_ready(brute.search_device(qs, 10))
    del brute
    brute_x = BruteForceIndex(ds.base, metric="l2", dtype="int8",
                              engine="pallas")
    jax.block_until_ready(brute_x.search_device(qs, 10))
    del brute_x
    _done(t)

    # 10M flagship: compile only when the cached artifacts exist (the
    # build is ~45 min — sweep10m owns it; bench.py skips when absent).
    from rag_on_edge_tpu.harness.bench_ivf import DEFAULT_DATA_ROOT

    # Flagship = nlist=8192/np=4 (round-4 frontier); round-3 4096/np=8
    # is the fallback — match bench.py._sift10m's resolution order.
    for nlist10, np10 in ((8192, 4), (4096, 8)):
        cache10 = os.path.join(
            DEFAULT_DATA_ROOT, "sift10m",
            f"ivf_nlist{nlist10}_l2_int8_seed42_pb2048_pp_sp0.1",
            "ivf_config.json")
        if os.path.exists(cache10):
            t = _stage(f"10M IVF load + compile (nlist={nlist10} eps=0.1 "
                       f"np={np10} B=8192)")
            ds10 = load_dataset("sift10m", gt_k=10)
            idx10 = build_or_load_index(ds10, nlist=nlist10, metric="l2",
                                        dtype="int8", pad_block=2048,
                                        store="compact", spill_eps=0.1)
            qs10 = jnp.asarray(np.resize(ds10.queries, (8192, ds10.queries.shape[1])))
            jax.block_until_ready(idx10.search_device(qs10, 10, np10, mode="cluster"))
            del idx10, ds10, qs10
            _done(t)
            break
    else:
        print("[warmup] 10M index cache absent — skipping (run sweep10m "
              "to build it)", flush=True)

    t = _stage("compile+run: siftsmall brute (single-dispatch + stream-64)")
    small = BruteForceIndex(ds_small.base, dtype="int8")
    small.compile(32, 5)
    stream = jnp.asarray(
        np.resize(ds_small.queries, (64 * 32, ds_small.queries.shape[1]))
        .reshape(64, 32, -1)
    )
    jax.block_until_ready(small.search_stream_device(stream, 5))
    _done(t)

    print("[warmup] all bench programs compiled and cached", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
