#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Headline: SIFT-small INT8 batched brute-force throughput (batch=32, k=5),
the reference's flagship config — Snapdragon 8 Gen 2 HTP achieved 5208 QPS
at 100% recall (reference README.md:143, BASELINE.md).  ``vs_baseline`` is
our QPS / 5208.
"""

import json
import sys

REFERENCE_QPS = 5208.0  # reference README.md:143 (batch=32 INT8 brute force)


def _stream_qps(micro_batches: int = 16, batch: int = 32, k: int = 5) -> float:
    """Sustained QPS in stream mode: one dispatch drains `micro_batches`
    batch-32 searches (a serving queue's behavior)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.utils.datasets import load_dataset

    from rag_on_edge_tpu.harness.timing import measure_throughput

    ds = load_dataset("siftsmall", gt_k=k)
    index = BruteForceIndex(ds.base, dtype="int8")
    rng = np.random.default_rng(0)
    base_stream = jnp.asarray(
        rng.permuted(
            np.resize(ds.queries, (micro_batches * batch, ds.queries.shape[1])), axis=0
        ).reshape(micro_batches, batch, -1)
    )
    qps_per_row = measure_throughput(
        lambda s: index.search_stream_device(s, k), [base_stream], repeats=16
    )
    return qps_per_row * batch  # rows are micro-batches of `batch` queries


def _ivf_1m_qps(batch: int = 8192, nprobe: int = 4, k: int = 10):
    """SIFT-1M IVF capacity point (B=8192, int8 cluster-major kernel,
    fp32 rescore) — see RESULTS.md batch-scaling table.  Guarded: any
    failure (cold caches, memory) must not cost the primary headline."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rag_on_edge_tpu.harness import timing
        from rag_on_edge_tpu.models.ivf import IVFIndex
        from rag_on_edge_tpu.utils.datasets import load_dataset
        from rag_on_edge_tpu.utils.metrics import recall_at_k

        ds = load_dataset("sift", gt_k=k)
        idx = IVFIndex.build(ds.base, nlist=1024, metric="l2", dtype="int8",
                             seed=42, max_iter=20, pad_block=2048)
        nq = ds.queries.shape[0]
        qs = np.resize(ds.queries, (batch, ds.queries.shape[1]))
        gt = ds.ground_truth_l2
        f = lambda x: idx.search_device(x, k, nprobe, mode="cluster")  # noqa: E731
        _, ids, _ = jax.block_until_ready(f(jnp.asarray(qs)))
        recall = recall_at_k(np.asarray(ids)[:nq], gt[:nq], k)
        batches = [jnp.asarray(b) for b in timing.unique_variants([qs], copies=4)]
        qps = timing.measure_throughput(f, batches, repeats=3)
        return round(qps, 1), round(float(recall), 4)
    except Exception:
        return None, None


def main() -> None:
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from rag_on_edge_tpu.harness.bench_bruteforce import run

    r = run(
        dataset="siftsmall",
        batch=32,
        k=5,
        dtype="int8",
        repeats=50,
        outdir=None,
        quiet=True,
    )
    # Sustained throughput over a stream of batch-32 searches — the same
    # methodology as the reference's 5208 QPS (total queries / total time
    # across sequential batch-32 graph executions, main.cpp:258-270).
    # The 64-deep stream is the headline: it amortizes the axon relay's
    # per-dispatch sync cost (which varies 2.5-30 ms run to run and
    # dominates shallower chains), so it is both the capacity metric and
    # the stable one; the 16-deep number is reported alongside.
    stream16 = _stream_qps(16)
    stream64 = _stream_qps(64)
    ivf_qps, ivf_recall = _ivf_1m_qps()
    print(
        json.dumps(
            {
                "metric": "siftsmall_int8_bruteforce_sustained_qps_b32",
                "value": round(stream64, 1),
                "unit": "QPS",
                "vs_baseline": round(stream64 / REFERENCE_QPS, 3),
                "recall_at_5": round(r["recall"], 4),
                "single_dispatch_qps_b32": round(r["qps"], 1),
                "stream_qps_b32x16": round(stream16, 1),
                "batch_latency_ms_p50": round(r["latency"].p50, 4),
                "sift1m_ivf_qps_b8192_np4": ivf_qps,
                "sift1m_ivf_recall_at_10": ivf_recall,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
