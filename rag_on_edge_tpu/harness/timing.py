"""Device-timing utilities for the benchmark harnesses.

Measures the two quantities the reference harnesses report
(``main.cpp:258-390``):

- **per-batch latency** (sync after every call → mean/σ/percentiles), the
  analog of its per-batch `graphExecute` timing, and
- **sustained throughput** (enqueue a stream of batches, block once at the
  end), which is what a serving deployment sees — the reference cannot
  separate these because QNN executes synchronously; on TPU the async
  dispatch pipeline makes the distinction real.
"""

from __future__ import annotations

import time

import jax

from rag_on_edge_tpu.utils.metrics import LatencyStats

__all__ = ["measure_latency", "measure_throughput"]


def measure_latency(fn, batches, warmup: int = 3) -> LatencyStats:
    """Per-call wall latencies (ms) with a block_until_ready after each call."""
    for i in range(min(warmup, len(batches))):
        jax.block_until_ready(fn(batches[i]))
    samples = []
    for b in batches:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(b))
        samples.append((time.perf_counter() - t0) * 1e3)
    return LatencyStats.from_samples(samples)


def measure_throughput(fn, batches, warmup: int = 3, repeats: int = 1) -> float:
    """Sustained queries/sec: enqueue everything, sync once. Returns QPS."""
    for i in range(min(warmup, len(batches))):
        jax.block_until_ready(fn(batches[i]))
    n_queries = sum(int(b.shape[0]) for b in batches) * repeats
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        for b in batches:
            out = fn(b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n_queries / dt
