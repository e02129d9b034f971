"""End-to-end serving benchmark: singleton submits through the executor.

Measures what a caller of a search SERVICE sees — per-request Futures,
micro-batching, pipelined device dispatch — as opposed to the device
capacity numbers of bench_ivf (pre-batched, no serving glue).  The
reference has no serving layer; its closest analog is the per-query
`executeRaw` loop (``main.cpp:155-193``).

Usage:
    python -m rag_on_edge_tpu.harness.bench_executor --dataset sift \
        --batch 2048 --nprobe 4 --requests 20000
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from rag_on_edge_tpu.runtime.executor import BatchingExecutor
from rag_on_edge_tpu.utils import metrics
from rag_on_edge_tpu.utils.cache import enable_compilation_cache
from rag_on_edge_tpu.utils.datasets import load_dataset


def run(dataset: str = "sift", batch: int = 2048, nprobe: int = 4, k: int = 10,
        requests: int = 20000, max_delay_ms: float = 5.0, inflight: int = 8,
        quiet: bool = False) -> dict:
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index

    ds = load_dataset(dataset, gt_k=k)
    pad_block = 2048 if ds.base.shape[0] >= 500_000 else None
    index = build_or_load_index(ds, nlist=None, metric="l2", dtype="int8",
                                pad_block=pad_block)
    index.compile(batch, k, nprobe, mode="cluster")
    fn = lambda q: index.search_device(q, k, nprobe, mode="cluster")  # noqa: E731

    nq = ds.queries.shape[0]
    reqs = np.resize(ds.queries, (requests, ds.queries.shape[1])).astype(np.float32)

    with BatchingExecutor(fn, dim=ds.base.shape[1], batch_size=batch,
                          max_delay_ms=max_delay_ms, inflight=inflight) as ex:
        # Warm the pipeline (compile happens on the first dispatch).
        ex.submit(reqs[0]).result(timeout=600)
        t_submit = np.empty(requests)
        futs = []
        t0 = time.perf_counter()
        for i in range(requests):
            t_submit[i] = time.perf_counter()
            futs.append(ex.submit(reqs[i]))
        t_done = np.empty(requests)
        ids = np.empty((requests, k), np.int32)
        for i, f in enumerate(futs):
            r = f.result(timeout=600)
            t_done[i] = time.perf_counter()
            ids[i] = np.asarray(r[1])
        wall = time.perf_counter() - t0
    qps = requests / wall
    lat = metrics.LatencyStats.from_samples(((t_done - t_submit) * 1e3).tolist())
    # Recall over the requests actually issued (requests < nq would
    # otherwise crash the row-count check AFTER the whole timed run).
    nr = min(nq, requests)
    recall = metrics.recall_at_k(ids[:nr], ds.ground_truth_l2[:nr], k)
    out = {
        "dataset": dataset, "requests": requests, "batch": batch,
        "nprobe": nprobe, "k": k, "inflight": inflight,
        "max_delay_ms": max_delay_ms,
        "qps_end_to_end": round(qps, 1),
        "recall": round(float(recall), 4),
        "latency_ms": {"mean": round(lat.mean, 3), "p50": round(lat.p50, 3),
                       "p95": round(lat.p95, 3), "p99": round(lat.p99, 3)},
    }
    if not quiet:
        print(f"[executor] {dataset} B={batch} np={nprobe} inflight={inflight}: "
              f"{qps:,.0f} QPS end-to-end, recall@{k}={recall:.4f}, "
              f"lat ms p50={lat.p50:.1f} p95={lat.p95:.1f} p99={lat.p99:.1f}")
    return out


def main(argv=None) -> None:
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="sift")
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--requests", type=int, default=20000)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--inflight", type=int, default=8)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    r = run(dataset=args.dataset, batch=args.batch, nprobe=args.nprobe,
            k=args.k, requests=args.requests, max_delay_ms=args.max_delay_ms,
            inflight=args.inflight, quiet=args.json)
    if args.json:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
