"""Per-stage device-time breakdown of the SHARDED cluster-major search.

Times cumulative prefixes of the shard_map program (coarse → invert →
route/gather → kernel → join → rescore → full-with-merge) with the
chained-dependency protocol (:mod:`rag_on_edge_tpu.harness.timing`);
stage cost = difference between successive prefixes.  The prefixes are
early returns inside the PRODUCTION shard body
(``ShardedIVFIndex._make_cluster_major_fn``, ``stage=`` static arg), so
every stage is timed with the exact arrays, specs, and collectives the
full program uses — this names the residual single-chip gap (VERDICT r4
item 3: replicated coarse vs masked join vs all-gather merge).

Single-chip analog: :mod:`rag_on_edge_tpu.harness.profile_ivf` (the
reference reports the same split as ``SearchTiming{centroid, gather,
fine}``, ``IVFIndex.h:31-36``).

Usage (1-device mesh on the real chip, or CPU mesh for smoke):
    python -m rag_on_edge_tpu.harness.profile_sharded --dataset sift \
        --dtype int8 --batch 8192 --nprobe 4 --pad-block 2048
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.harness import timing

STAGES = ("coarse", "invert", "route", "kernel", "join", "rescore", "full")


def profile(sidx, queries: np.ndarray, k: int, nprobe: int,
            engine: str = "auto", repeats: int = 6):
    """Cumulative-prefix timing rows [(stage, cum_ms, delta_ms)] for the
    sharded cluster-major program."""
    sidx._ensure_cluster_state()
    if engine == "auto":
        engine = "pallas_accum" if sidx._cm_accum_ok else "pallas"
    a = sidx._cm_arrays
    c_norms = (sidx._centroid_norms if sidx._centroid_norms is not None
               else jnp.zeros(()))
    b = queries.shape[0]
    qcap = sidx._auto_qcap(b, nprobe)

    def call(stage):
        def f(q):
            return sidx._search_cm_jit(
                q, sidx._centroids, c_norms,
                a["vectors_t"], a["vectors_c"], a["crow_map"], a["reorder_c"],
                a["bc"], a["bf"], a["bl"], a["rv"],
                a["lb"], a["norms_pad"], a["cluster_shard"], a["sizes"],
                k, nprobe, qcap, 0, 0, 1, engine, stage)
        return f

    rows, prev = [], 0.0
    for stage in STAGES:
        qps = timing.measure_throughput(call(stage), [jnp.asarray(queries)],
                                        repeats=repeats)
        ms = b / qps * 1e3
        rows.append((stage, ms, ms - prev))
        prev = ms
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="siftsmall")
    ap.add_argument("--metric", default="l2")
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--nlist", type=int, default=None)
    ap.add_argument("--pad-block", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "pallas_accum"])
    args = ap.parse_args()

    import jax

    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.parallel.sharded import ShardedIVFIndex
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    enable_compilation_cache()
    ds = load_dataset(args.dataset, gt_k=args.k)
    index = build_or_load_index(ds, nlist=args.nlist, metric=args.metric,
                                dtype=args.dtype, pad_block=args.pad_block)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("shard",))
    sidx = ShardedIVFIndex(index, mesh)
    rng = np.random.default_rng(0)
    q = rng.permuted(
        np.resize(ds.queries, (args.batch, ds.queries.shape[1])), axis=0
    ).astype(np.float32)
    rows = profile(sidx, q, args.k, args.nprobe, engine=args.engine)
    print(f"mesh={len(jax.devices())}dev batch={args.batch} "
          f"nprobe={args.nprobe} k={args.k} dtype={args.dtype} "
          f"engine={sidx.last_engine or args.engine} "
          f"qcap={sidx._auto_qcap(args.batch, args.nprobe)}")
    for name, cum, delta in rows:
        print(f"  {name:<10} cumulative {cum:8.2f} ms   stage {delta:8.2f} ms")


if __name__ == "__main__":
    main()
