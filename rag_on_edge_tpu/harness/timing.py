"""Device-timing utilities for the benchmark harnesses.

Measures the two quantities the reference harnesses report
(``main.cpp:258-390``):

- **per-batch latency** (sync after every call → mean/σ/percentiles), the
  analog of its per-batch `graphExecute` timing, and
- **sustained throughput** (enqueue a stream of batches, block once at the
  end), which is what a serving deployment sees — the reference cannot
  separate these because QNN executes synchronously; on TPU the async
  dispatch pipeline makes the distinction real.

Measurement integrity on this environment: the axon relay deduplicates
executions whose (executable, argument values) repeat, so every timed call
MUST receive a distinct input.  Both helpers materialize per-call variants
(tiny additive jitter) up front; reusing a batch object across iterations
silently measures the dispatch floor instead of the device.
"""

from __future__ import annotations

import time

import jax

from rag_on_edge_tpu.utils.metrics import LatencyStats

__all__ = ["measure_latency", "measure_throughput", "unique_variants"]


def unique_variants(batches, copies: int, jitter: float = 1e-3):
    """[b0, b1, ...] → copies × len(batches) distinct device arrays.

    Adds r·jitter to replica r — numerically irrelevant for scoring, but
    defeats value-level result caching in the execution path.
    """
    out = []
    for r in range(copies):
        for b in batches:
            out.append(b if r == 0 else b + (r * jitter))
    return jax.block_until_ready(out)


def measure_latency(fn, batches, warmup: int = 3) -> LatencyStats:
    """Per-call wall latencies (ms), block_until_ready after each call.

    Note: on tunnelled devices the sync round trip (≈29 ms here) dominates
    small workloads; use :func:`measure_throughput` for capacity numbers.
    """
    variants = unique_variants(batches, 2)
    n = len(batches)
    for i in range(min(warmup, n)):
        jax.block_until_ready(fn(variants[i]))
    samples = []
    for b in variants[n:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(b))
        samples.append((time.perf_counter() - t0) * 1e3)
    return LatencyStats.from_samples(samples)


def measure_throughput(fn, batches, warmup: int = 3, repeats: int = 10) -> float:
    """Sustained queries/sec: enqueue repeats×len(batches) distinct calls,
    sync once.  Returns QPS."""
    variants = unique_variants(batches, repeats + 1)
    n = len(batches)
    for i in range(min(max(warmup, 1), n)):
        jax.block_until_ready(fn(variants[i]))
    timed = variants[n:]
    n_queries = sum(int(b.shape[0]) for b in timed)
    t0 = time.perf_counter()
    out = None
    for b in timed:
        out = fn(b)
    jax.block_until_ready(out)
    return n_queries / (time.perf_counter() - t0)
