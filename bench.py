#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Headline: SIFT-1M IVF sustained throughput (B=8192, nprobe=4, k=10,
int8 cluster-major Pallas kernel + fp32 rescore, recall@10 ≈ 0.995) —
the frontier config of BASELINE.json's north star ("≥91% recall@1 …
at ≥100K QPS per v5e chip"); ``vs_baseline`` is QPS / that 100K target.
This metric is DEVICE-bound: one dispatch scores 8192 queries, so the
axon relay's per-dispatch sync cost (2.5-30 ms, varies run to run) is
amortized away and the number is stable across tunnel weather —
measured 327K (bad weather) vs 332K (good) on the same code.

Secondary fields cover the reference's flagship SIFT-small INT8
brute-force config (5208 QPS on Snapdragon 8 Gen 2 HTP, README.md:143):
the 64-deep stream sustains 70K-559K QPS depending entirely on relay
sync cost (device time per batch-32 search is ~15-35 µs) — report them,
but never let them be the headline.
"""

import json
import sys

REFERENCE_QPS = 5208.0   # reference README.md:143 (batch=32 INT8 brute force)
TARGET_IVF_QPS = 100_000.0  # BASELINE.json north star, per v5e chip


def _stream_qps(micro_batches: int = 16, batch: int = 32, k: int = 5) -> float:
    """Sustained QPS in stream mode: one dispatch drains `micro_batches`
    batch-32 searches (a serving queue's behavior)."""
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.harness.timing import measure_throughput
    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.utils.datasets import load_dataset

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
    """SIFT-1M IVF capacity point — see RESULTS.md batch-scaling table."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.harness import timing
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.datasets import load_dataset
    from rag_on_edge_tpu.utils.metrics import recall_at_k

    ds = load_dataset("sift", gt_k=k)
    # ONE canonical 1M index (build_or_load_index owns the config and the
    # on-disk cache): BENCH_rNN and the harness/RESULTS.md sweeps quote
    # the same artifact.
    idx = build_or_load_index(ds, nlist=1024, metric="l2", dtype="int8",
                              pad_block=2048)
    nq = ds.queries.shape[0]
    qs = np.resize(ds.queries, (batch, ds.queries.shape[1]))
    gt = ds.ground_truth_l2
    f = lambda x: idx.search_device(x, k, nprobe, mode="cluster")  # noqa: E731
    _, ids, _ = jax.block_until_ready(f(jnp.asarray(qs)))
    recall = recall_at_k(np.asarray(ids)[:nq], gt[:nq], k)
    batches = [jnp.asarray(b) for b in timing.unique_variants([qs], copies=4)]
    qps = timing.measure_throughput(f, batches, repeats=3)
    return round(qps, 1), round(float(recall), 4)


def main() -> None:
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    out = {
        "metric": "sift1m_ivf_sustained_qps_b8192_np4",
        "value": None,
        "unit": "QPS",
        "vs_baseline": None,
    }
    try:
        ivf_qps, ivf_recall = _ivf_1m_qps()
        out["value"] = ivf_qps
        out["vs_baseline"] = round(ivf_qps / TARGET_IVF_QPS, 3)
        out["sift1m_ivf_recall_at_10"] = ivf_recall
    except Exception as e:  # keep the JSON line alive no matter what
        out["error_ivf_1m"] = repr(e)

    # Secondary: the reference's flagship SIFT-small config (relay-weather
    # sensitive — see module docstring).
    try:
        from rag_on_edge_tpu.harness.bench_bruteforce import run

        r = run(dataset="siftsmall", batch=32, k=5, dtype="int8",
                repeats=50, outdir=None, quiet=True)
        stream64 = _stream_qps(64)
        out["siftsmall_bruteforce_stream_qps_b32x64"] = round(stream64, 1)
        out["siftsmall_vs_reference_5208"] = round(stream64 / REFERENCE_QPS, 3)
        out["siftsmall_recall_at_5"] = round(r["recall"], 4)
        out["single_dispatch_qps_b32"] = round(r["qps"], 1)
        out["batch_latency_ms_p50"] = round(r["latency"].p50, 4)
    except Exception as e:
        out["error_siftsmall"] = repr(e)

    if out["value"] is None and "siftsmall_bruteforce_stream_qps_b32x64" in out:
        # Fallback headline if the 1M section failed.
        out["metric"] = "siftsmall_int8_bruteforce_sustained_qps_b32"
        out["value"] = out["siftsmall_bruteforce_stream_qps_b32x64"]
        out["vs_baseline"] = out["siftsmall_vs_reference_5208"]
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
