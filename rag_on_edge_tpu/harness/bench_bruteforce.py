"""Brute-force benchmark harness.

The TPU rebuild of the reference's on-device benchmark main
(``qidk_bruteforce/.../main.cpp:73-406``): loads a dataset, drives batched
search, and writes ``results.txt`` (per-query top-k rows), ``metrics.txt``
(sectioned report) and a sweep-CSV row with the reference's schema
(``run_all.sh:57``: ``dataset,batch,qps,gflops,avg_ms,p95_ms,p99_ms``).

Usage:
    python -m rag_on_edge_tpu.harness.bench_bruteforce \
        --dataset siftsmall --batch 32 --k 5 --dtype int8
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.harness import timing
from rag_on_edge_tpu.utils.cache import enable_compilation_cache
from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.utils import metrics
from rag_on_edge_tpu.utils.datasets import load_dataset

__all__ = ["run", "main"]


def _device_batches(queries: np.ndarray, batch: int, min_batches: int = 8):
    """Pre-staged device batches (padded tail, the role of
    main.cpp:206-211's tail handling); tiled up to ``min_batches`` so
    throughput timing has enough work.  The tail pads by CYCLIC REPEAT,
    not zeros: a block of identical zero queries all probes the same few
    IVF cells, which both exhausts those clusters' routing capacity
    (evicting real pairs) and makes the padded batch unrepresentatively
    slow/spilly in the timing loop (measured round 4 — see
    IVFIndex.search)."""
    nq = queries.shape[0]
    batches = []
    for start in range(0, nq, batch):
        chunk = queries[start : start + batch]
        if chunk.shape[0] < batch:
            chunk = np.resize(chunk, (batch, chunk.shape[1]))
        batches.append(jnp.asarray(chunk))
    while len(batches) < min_batches:
        batches = batches + batches
    return batches


def run(
    dataset: str = "siftsmall",
    batch: int = 32,
    k: int = 5,
    dtype: str = "int8",
    metric: str = "ip",
    select: str = "auto",
    repeats: int = 10,
    outdir: str | None = None,
    quiet: bool = False,
    profile: bool = False,
) -> dict:
    ds = load_dataset(dataset, gt_k=max(k, 10))
    index = BruteForceIndex(ds.base, metric=metric, dtype=dtype, select=select)
    index.compile(batch, k)

    search = lambda q: index.search_device(q, k)  # noqa: E731
    batches = _device_batches(ds.queries, batch)
    lat = timing.measure_latency(search, batches)
    if profile:
        # Device trace of the throughput loop (the analog of the AIE
        # hardware-trace buffer, test.cpp:152-155/368-371) — inspect with
        # TensorBoard or Perfetto.
        import jax

        trace_dir = os.environ.get("RAG_EDGE_TPU_PROFILE_DIR", "/tmp/rag_edge_tpu_trace")
        with jax.profiler.trace(trace_dir):
            qps = timing.measure_throughput(search, batches, repeats=repeats)
        if not quiet:
            print(f"[profile] trace written to {trace_dir}")
    else:
        qps = timing.measure_throughput(search, batches, repeats=repeats)

    ids, scores = index.search(ds.queries, k=k, batch_size=batch)
    gt = ds.gt(metric)
    recall = metrics.recall_at_k(ids, gt, k) if gt is not None else float("nan")

    n, dim = ds.base.shape
    flops_per_batch = 2.0 * batch * dim * n
    gflops = flops_per_batch / (lat.mean * 1e-3) / 1e9 if lat.mean else 0.0
    oi = metrics.operational_intensity(batch, dim, n, dtype_bytes={"int8": 1, "bf16": 2}.get(dtype, 4))

    # Time breakdown — the honest TPU analog of the reference's
    # quantize/execute/top-k/post-processing percentages (main.cpp:383-388):
    # the fused kernel dissolves those phases on purpose, so the split that
    # remains is device compute (sustained, amortized) vs host dispatch +
    # result round trip (single-dispatch latency minus the device share).
    device_ms = 1e3 * batch / qps if qps else float("nan")
    dispatch_ms = max(lat.mean - device_ms, 0.0)
    breakdown = [
        f"device_compute_ms_per_batch (sustained): {device_ms:.4f} "
        f"({100 * device_ms / lat.mean:.1f}%)" if lat.mean else "n/a",
        f"dispatch_and_roundtrip_ms (single-dispatch - device): {dispatch_ms:.4f} "
        f"({100 * dispatch_ms / lat.mean:.1f}%)" if lat.mean else "n/a",
        f"single_dispatch_total_ms: {lat.mean:.4f}",
    ]

    result = {
        "dataset": dataset,
        "n_base": n,
        "dim": dim,
        "batch": batch,
        "k": k,
        "dtype": dtype,
        "metric": metric,
        "recall": recall,
        "qps": qps,
        "gflops": gflops,
        "oi": oi["oi"],
        "latency": lat,
    }

    if outdir:
        cfg = f"{dataset}_b{batch}_k{k}_{dtype}"
        d = os.path.join(outdir, cfg)
        metrics.write_results_txt(os.path.join(d, "results.txt"), ids, scores)
        metrics.write_metrics_txt(
            os.path.join(d, "metrics.txt"),
            {
                "Dataset Info": [
                    f"dataset: {dataset}",
                    f"num_docs: {n}",
                    f"num_queries: {ds.queries.shape[0]}",
                    f"dim: {dim}",
                    f"batch_size: {batch}",
                    f"top_k: {k}",
                    f"dtype: {dtype}  metric: {metric}  select: {select}",
                ],
                "Operational Intensity Analysis": [
                    f"flops_per_batch: {oi['flops']:.3e}",
                    f"bytes_per_batch: {oi['bytes']:.3e}",
                    f"operational_intensity: {oi['oi']:.2f} FLOPs/byte",
                ],
                "Overall Performance": [
                    f"throughput_qps: {qps:.1f}",
                    f"per_query_latency_amortized_ms: {1e3 / qps:.4f}",
                ],
                "Device Execution": lat.lines("batch"),
                "Time Breakdown": breakdown,
                "Compute Performance": [
                    f"gflops (batch-latency based): {gflops:.1f}",
                ],
                "Accuracy": [f"recall@{k}: {recall:.4f}"],
            },
        )
        metrics.append_sweep_csv(
            os.path.join(outdir, "benchmark_bruteforce.csv"),
            "dataset,batch,qps,gflops,avg_ms,p95_ms,p99_ms",
            f"{dataset},{batch},{qps:.1f},{gflops:.1f},{lat.mean:.4f},{lat.p95:.4f},{lat.p99:.4f}",
        )
    if not quiet:
        print(
            f"[brute {dtype}] {dataset} B={batch} K={k}: recall@{k}={recall:.4f} "
            f"QPS={qps:,.0f} GFLOPS={gflops:.1f} "
            f"lat(ms) mean={lat.mean:.3f} p95={lat.p95:.3f} p99={lat.p99:.3f}"
        )
    return result


def main(argv=None) -> None:
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="siftsmall")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--dtype", default="int8", choices=["fp32", "bf16", "int8"])
    p.add_argument("--metric", default="ip", choices=["ip", "l2"])
    p.add_argument("--select", default="auto", choices=["auto", "exact", "two_stage", "iterative", "approx"])
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--outdir", default="results")
    p.add_argument("--json", action="store_true", help="print one JSON line")
    p.add_argument("--profile", action="store_true", help="write a device trace")
    args = p.parse_args(argv)
    r = run(
        dataset=args.dataset, batch=args.batch, k=args.k, dtype=args.dtype,
        metric=args.metric, select=args.select, repeats=args.repeats,
        outdir=args.outdir, quiet=args.json, profile=args.profile,
    )
    if args.json:
        r = {**r, "latency": r["latency"].__dict__}
        print(json.dumps(r))


if __name__ == "__main__":
    main()
