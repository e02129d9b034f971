"""Device-timing utilities for the benchmark harnesses.

Measures the two quantities the reference harnesses report
(``main.cpp:258-390``): per-batch latency (mean/σ/percentiles) and
sustained throughput.

Measurement integrity on this environment (axon-tunnelled TPU) requires
two defenses, both learned the hard way:

1. **Distinct inputs per call** — repeated identical executions can be
   served from a cache, silently measuring the dispatch path.
2. **Forced execution via a dependency chain** — ``block_until_ready``
   through the relay does not reliably force execution (lazy/on-demand
   evaluation), so throughput timing threads a scalar from each call's
   output into the next call's input and materializes the final scalar to
   the host: one transfer forces every execution in order.  Numbers from
   unchained async loops on this stack can be off by the loop length.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.utils.metrics import LatencyStats

__all__ = ["measure_latency", "measure_throughput", "unique_variants"]


def unique_variants(batches, copies: int, jitter: float = 1e-3):
    """[b0, b1, ...] → copies × len(batches) distinct device arrays.

    Float inputs get r·jitter added to replica r — numerically irrelevant
    for scoring, but defeats value-level result caching in the execution
    path.  Integer inputs are ROW-ROLLED by r instead: adding a float
    would silently promote them (an int8 input becomes f32 and times the
    wrong kernel), and adding an int below 1 quantum is a no-op.
    """
    out = []
    for r in range(copies):
        for b in batches:
            if r == 0:
                out.append(b)
            elif jnp.issubdtype(b.dtype, jnp.floating):
                out.append(b + jnp.asarray(r * jitter, b.dtype))
            else:
                # Roll is periodic in the row count, so a roll alone
                # repeats bitwise once r reaches rows (73 of 200 variants
                # were duplicates at iters=200 on a 128-row batch); the
                # +r//rows constant keeps every variant distinct (an
                # integer add is a bijection mod 2^bits — equal only if
                # the constants collide, which r//rows < 2^bits prevents).
                rows = int(b.shape[0])
                out.append(jnp.roll(b, r % rows, axis=0)
                           + jnp.asarray(r // rows, b.dtype))
    return jax.block_until_ready(out)


def _first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def measure_latency(fn, batches, warmup: int = 3) -> LatencyStats:
    """Per-call wall latencies (ms); each call's output is materialized to
    the host, so a sample = dispatch + execution + result round trip."""
    variants = unique_variants(batches, 2)
    n = len(batches)
    for i in range(min(warmup, n)):
        np.asarray(_first_leaf(fn(variants[i])))
    samples = []
    for b in variants[n:]:
        t0 = time.perf_counter()
        np.asarray(_first_leaf(fn(b)))
        samples.append((time.perf_counter() - t0) * 1e3)
    return LatencyStats.from_samples(samples)


def measure_throughput(fn, batches, warmup: int = 2, repeats: int = 10) -> float:
    """Sustained queries/sec over repeats×len(batches) distinct calls.

    Calls are chained (input i+1 depends on output i) and only the final
    scalar is materialized, so the wall time covers every execution with
    one host round trip.  ``fn`` must take one array and return a pytree
    whose first leaf is a float array.
    """
    variants = unique_variants(batches, repeats + 1)
    n = len(batches)

    def run_chain(chain):
        carry = None
        for v in chain:
            out = fn(v if carry is None else v + carry)
            leaf = _first_leaf(out)
            carry = (leaf[(0,) * leaf.ndim] * 0.0).astype(v.dtype)
        return float(np.asarray(carry))

    # Warmup compiles both call forms (plain first call + chained call)
    # on ad-hoc variants that never reappear in the timed chain: the
    # feature-axis roll is disjoint from the row-axis transforms that
    # generate timed variants (a row roll-by-7 warmup was bitwise equal
    # to the r=7 timed variant).  Integer inputs are rolled, not offset —
    # adding a float would silently promote them and compile (and warm)
    # the wrong kernel.
    if warmup > 0:
        v0 = variants[0]
        if jnp.issubdtype(v0.dtype, jnp.floating):
            w0 = v0 + jnp.asarray(7.7, v0.dtype)
        else:
            w0 = jnp.roll(v0, 3, axis=-1)
        # A 2-element chain exercises BOTH call forms (plain first call and
        # chained v+carry call); warming with a single element would leave
        # the chained form to compile inside the timed region.  warmup=0
        # remains the explicit skip.
        run_chain([v0, w0])
    timed = variants[n:]
    n_queries = sum(int(b.shape[0]) for b in timed)
    t0 = time.perf_counter()
    run_chain(timed)
    return n_queries / (time.perf_counter() - t0)
