"""End-to-end serving benchmark: singleton submits through the executor.

Measures what a caller of a search SERVICE sees — per-request Futures,
micro-batching, pipelined device dispatch — as opposed to the device
capacity numbers of bench_ivf (pre-batched, no serving glue).  The
reference has no serving layer; its closest analog is the per-query
`executeRaw` loop (``main.cpp:155-193``), and its per-batch latency
percentiles (``main.cpp:281-318``) are the schema the open-loop table
mirrors.

Two protocols:

- **saturated** (default): all requests submitted up front.  The QPS is
  the serving CAPACITY; the latency percentiles are queue depth, not
  service time — never quote them as latency.
- **open loop** (``--open-loop``): Poisson arrivals at fractions of the
  measured capacity (``--loads``).  Latency is measured from each
  request's SCHEDULED arrival to its completion, so producer lag counts
  as queueing (the honest open-loop convention) — this is the
  latency-vs-offered-load curve a capacity number says nothing about.

Usage:
    python -m rag_on_edge_tpu.harness.bench_executor --dataset sift \
        --batch 2048 --nprobe 4 --requests 20000 [--open-loop]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from rag_on_edge_tpu.runtime.executor import BatchingExecutor
from rag_on_edge_tpu.utils import metrics
from rag_on_edge_tpu.utils.cache import enable_compilation_cache
from rag_on_edge_tpu.utils.datasets import load_dataset


def _wire_dtype(queries: np.ndarray, wire: str):
    """Resolve the upload wire format.  "auto": uint8 when the query
    corpus is integral in [0, 255] (real SIFT and the synthetic sets
    both are) — a LOSSLESS 4x upload shrink, decisive on bandwidth-
    priced relay windows (~24 ms/MB round 5: the fp32 upload was ~80%
    of the serving cycle).  The device program casts back to f32 in its
    own jit (search_device does)."""
    if wire == "f32":
        return None
    integral = (queries.min() >= 0 and queries.max() <= 255
                and np.all(queries == np.rint(queries)))
    if wire == "uint8":
        if not integral:
            raise ValueError("wire='uint8' needs integral queries in [0,255]")
        return np.uint8
    return np.uint8 if integral else None  # auto


def run(dataset: str = "sift", batch: int = 2048, nprobe: int = 4, k: int = 10,
        requests: int = 20000, max_delay_ms: float = 5.0, inflight: int = 8,
        recover_passes: int | None = None, quiet: bool = False,
        index=None, wire: str = "auto") -> dict:
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index

    ds = load_dataset(dataset, gt_k=k)
    if index is None:
        # Callers that already hold the index (serve_hunt's weather
        # probe) pass it in — two device-resident copies of the padded
        # slabs + fp32 store would otherwise coexist for the whole run.
        pad_block = 2048 if ds.base.shape[0] >= 500_000 else None
        index = build_or_load_index(ds, nlist=None, metric="l2", dtype="int8",
                                    pad_block=pad_block)
    # recover_passes: the auto heuristic scales passes with batch, which
    # at B>=32K picks multi-pass recovery programs; at nprobe<=4 residual
    # spill is recall-neutral (RESULTS round 2), so serving configs pin
    # recover_passes=1 for max throughput.
    rp = recover_passes
    fn = lambda q: index.search_device(q, k, nprobe, mode="cluster",  # noqa: E731
                                       recover_passes=rp)

    nq = ds.queries.shape[0]
    reqs = np.resize(ds.queries, (requests, ds.queries.shape[1])).astype(np.float32)
    wd = _wire_dtype(ds.queries, wire)
    # Warm-compile the search program at the WIRE dtype (the executor's
    # first dispatch would otherwise pay the compile inside the timed
    # pipeline warmup; the uint8-traced program is distinct from f32's).
    import jax

    import jax.numpy as jnp

    jax.block_until_ready(fn(jnp.zeros((batch, ds.base.shape[1]),
                                       dtype=wd or np.float32)))

    import gc

    with BatchingExecutor(fn, dim=ds.base.shape[1], batch_size=batch,
                          max_delay_ms=max_delay_ms, inflight=inflight,
                          wire_dtype=wd) as ex:
        # Warm the pipeline (compile happens on the first dispatch).
        ex.submit(reqs[0]).result(timeout=600)
        stats0 = ex.stats()
        t_submit = np.empty(requests)
        futs = []
        # GC freeze for the timed region (see run_open_loop: one gen-2
        # pass measured as a ~200 ms pipeline stall).
        gc.collect()
        gc.freeze()
        gc.disable()
        try:
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
        finally:
            gc.enable()
            gc.unfreeze()
        stats = {k: (round(v - stats0[k], 2) if isinstance(v, (int, float))
                     and k in ("batches_dispatched", "rows_dispatched",
                               "underfull_launches", "drains",
                               "batches_collected", "packed_batches",
                               "fused_drains") else v)
                 for k, v in ex.stats().items()}
        b, d = stats["batches_dispatched"], stats["drains"]
        stats["avg_rows_per_batch"] = (
            round(stats["rows_dispatched"] / b, 1) if b else 0.0)
        stats["batches_per_drain"] = (
            round(stats["batches_collected"] / d, 2) if d else 0.0)
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
        "wire": str(np.dtype(wd)) if wd is not None else "float32",
        "qps_end_to_end": round(qps, 1),
        "recall": round(float(recall), 4),
        "latency_ms": {"mean": round(lat.mean, 3), "p50": round(lat.p50, 3),
                       "p95": round(lat.p95, 3), "p99": round(lat.p99, 3)},
        "pipeline": stats,
    }
    if not quiet:
        print(f"[executor] {dataset} B={batch} np={nprobe} inflight={inflight}: "
              f"{qps:,.0f} QPS end-to-end, recall@{k}={recall:.4f}, "
              f"lat ms p50={lat.p50:.1f} p95={lat.p95:.1f} p99={lat.p99:.1f}, "
              f"{stats['batches_per_drain']} batches/drain, "
              f"{stats['underfull_launches']} underfull")
    return out


def relay_cycle_probe(fn, dim: int, batch: int, cycles: int = 4,
                      seed: int = 0, wire_dtype=None) -> float:
    """Serialized upload→execute→fetch cost, ms per batch (the "weather"
    reading).  Each cycle uploads a DISTINCT host batch, runs ``fn`` and
    fetches the full result before the next starts — no pipelining, so
    the number is the per-interaction relay latency serving capacity
    divides by (capacity ≈ B / cycle).  Identical inputs can be served
    from a relay cache (harness/timing.py), hence fresh randoms per
    cycle; the first (warm) cycle is dropped.  ``wire_dtype`` must match
    the serving path's upload format (uint8 vs f32 is a 4x payload
    difference — a different cycle on bandwidth-priced windows)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    qs = rng.uniform(0.0, 100.0, size=(cycles + 1, batch, dim)).astype(
        wire_dtype or np.float32)
    times = []
    for i in range(cycles + 1):
        t0 = time.perf_counter()
        jax.device_get(fn(jnp.asarray(qs[i])))
        times.append(time.perf_counter() - t0)
    return float(np.median(times[1:]) * 1e3)


def run_open_loop(ex, reqs: np.ndarray, rate_qps: float, max_delay_ms: float,
                  seed: int = 0) -> dict:
    """One open-loop run: Poisson arrivals at ``rate_qps`` through an
    already-warm executor.  Latency for request i = completion − its
    SCHEDULED arrival (includes any producer lag — at offered loads the
    producer can't sustain, the lag IS queueing delay and must count).

    Pacing: sleep when >1 ms ahead of schedule, YIELDING spins
    (``sleep(0)``) for the last stretch — a pure-Python spin would hold
    the GIL for a full switch interval (default 5 ms) and starve the
    dispatcher/collector on this 1-core host, quantizing every measured
    latency to GIL-switch multiples.  The switch interval is dropped to
    1 ms for the run for the same reason."""
    import gc
    import sys as _sys
    import threading

    n = len(reqs)
    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / rate_qps, size=n))
    t_done = np.empty(n)
    futs: list = [None] * n
    done_count = [0]

    def collect():
        # Futures resolve batch-at-a-time in FIFO order; waiting in submit
        # order wakes once per batch and stamps its members back-to-back.
        i = 0
        while i < n:
            f = futs[i]
            if f is None:  # producer hasn't minted it yet
                time.sleep(1e-4)
                continue
            f.result(timeout=600)
            t_done[i] = time.perf_counter()
            i += 1
        done_count[0] = i

    col = threading.Thread(target=collect)
    col.start()
    perf = time.perf_counter
    sleep = time.sleep
    submit = ex.submit
    old_switch = _sys.getswitchinterval()
    _sys.setswitchinterval(1e-3)
    # Cyclic GC off for the timed region (standard serving practice —
    # gc.freeze after warmup): a gen-2 collection over the request
    # objects measured as ONE ~200 ms pipeline stall (~3K requests late
    # in a single contiguous span).  Executor objects are cycle-free, so
    # refcounting reclaims everything; collect+freeze keeps the heap we
    # can't avoid out of future scans.
    gc.collect()
    gc.freeze()
    gc.disable()
    try:
        t0 = perf()
        for i in range(n):
            target = t0 + arrivals[i]
            while True:
                lag = target - perf()
                if lag <= 0:
                    break
                sleep(lag - 5e-4 if lag > 1e-3 else 0)
            futs[i] = submit(reqs[i])
        col.join()
    finally:
        _sys.setswitchinterval(old_switch)
        gc.enable()
        gc.unfreeze()
    wall = time.perf_counter() - t0
    lat_ms = (t_done - (t0 + arrivals)) * 1e3
    lat = metrics.LatencyStats.from_samples(lat_ms.tolist())
    achieved = n / wall
    return {
        "offered_qps": round(rate_qps, 1),
        "achieved_qps": round(achieved, 1),
        "latency_ms": {"mean": round(lat.mean, 3), "p50": round(lat.p50, 3),
                       "p95": round(lat.p95, 3), "p99": round(lat.p99, 3)},
    }


def auto_max_delay_ms(batch: int, offered_qps: float,
                      capacity_qps: float) -> float:
    """The measured latency knee for the batching window (VERDICT r3
    item 6; RESULTS.md round-3 serving: 5 -> 50 ms moved p50 261 -> 101
    ms at 25% load with HIGHER throughput).  Two ceilings, take the min:

    - ``fill``: time for the offered load to fill one batch — waiting
      longer adds pure latency with zero extra batch fill;
    - ``cycle``: the relay round-trip, estimated from saturated capacity
      (capacity ≈ B / cycle on this relay) — once a batch carries a
      cycle's worth of arrivals the pipeline is dispatch-bound and more
      waiting only delays the head request.
    """
    fill_ms = 1e3 * batch / max(offered_qps, 1.0)
    cycle_ms = 1e3 * batch / max(capacity_qps, 1.0)
    return float(max(5.0, min(fill_ms, cycle_ms, 200.0)))


def run_load_curve(dataset: str = "sift", batch: int = 4096, nprobe: int = 4,
                   k: int = 10, requests: int = 20000,
                   max_delay_ms="auto", inflight: int = 8,
                   loads: tuple = (0.25, 0.5, 0.8), capacity: float | None = None,
                   quiet: bool = False, wire: str = "auto") -> dict:
    """Latency-vs-offered-load table: a saturated run measures capacity,
    then one open-loop run per load fraction.  ``max_delay_ms="auto"``
    retunes the batching window per offered load via
    :func:`auto_max_delay_ms` (the capacity and latency protocols want
    OPPOSITE windows — RESULTS.md round-3 serving)."""
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index

    ds = load_dataset(dataset, gt_k=k)
    pad_block = 2048 if ds.base.shape[0] >= 500_000 else None
    index = build_or_load_index(ds, nlist=None, metric="l2", dtype="int8",
                                pad_block=pad_block)
    fn = lambda q: index.search_device(q, k, nprobe, mode="cluster")  # noqa: E731
    reqs = np.resize(ds.queries, (requests, ds.queries.shape[1])).astype(np.float32)
    wd = _wire_dtype(ds.queries, wire)
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(fn(jnp.zeros((batch, ds.base.shape[1]),
                                       dtype=wd or np.float32)))

    auto = max_delay_ms == "auto"
    # The saturated capacity probe wants FULL batches: the submit loop
    # costs ~4-5 µs/request, so a window below ~5 µs x B fires underfull
    # launches (measured round 4: B=16384 at the old 5 ms default
    # averaged 10.9K rows/launch — a 33% capacity leak).
    probe_delay = max(10.0, batch * 5e-3) if auto else max_delay_ms
    out = {"dataset": dataset, "batch": batch, "nprobe": nprobe, "k": k,
           "inflight": inflight, "max_delay_ms": max_delay_ms,
           "wire": str(np.dtype(wd)) if wd is not None else "float32",
           "curve": []}
    with BatchingExecutor(fn, dim=ds.base.shape[1], batch_size=batch,
                          max_delay_ms=probe_delay, inflight=inflight,
                          wire_dtype=wd) as ex:
        ex.submit(reqs[0]).result(timeout=600)
        if capacity is None:
            # Saturated capacity probe on the same executor (GC frozen —
            # see run_open_loop).
            import gc

            gc.collect(), gc.freeze(), gc.disable()
            try:
                t0 = time.perf_counter()
                futs = [ex.submit(reqs[i]) for i in range(requests)]
                for f in futs:
                    f.result(timeout=600)
                capacity = requests / (time.perf_counter() - t0)
            finally:
                gc.enable(), gc.unfreeze()
        out["capacity_qps"] = round(capacity, 1)
        if not quiet:
            print(f"[executor open-loop] capacity={capacity:,.0f} QPS "
                  f"(B={batch} np={nprobe} inflight={inflight})", flush=True)
        for frac in loads:
            delay = (auto_max_delay_ms(batch, frac * capacity, capacity)
                     if auto else max_delay_ms)
            ex.set_max_delay_ms(delay)
            row = run_open_loop(ex, reqs, frac * capacity, delay)
            row["load"] = frac
            row["max_delay_ms"] = round(delay, 1)
            out["curve"].append(row)
            if not quiet:
                lm = row["latency_ms"]
                print(f"[executor open-loop] load={frac:.0%} "
                      f"offered={row['offered_qps']:,.0f} "
                      f"achieved={row['achieved_qps']:,.0f} QPS  "
                      f"delay={delay:.0f} ms  "
                      f"lat ms p50={lm['p50']:.1f} p95={lm['p95']:.1f} "
                      f"p99={lm['p99']:.1f}", flush=True)
    return out


def main(argv=None) -> None:
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="sift")
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--requests", type=int, default=20000)
    p.add_argument("--max-delay-ms", default=5.0,
                   type=lambda s: s if s == "auto" else float(s),
                   help='batching window; "auto" (open-loop only) picks '
                        "the per-load knee via auto_max_delay_ms")
    p.add_argument("--inflight", type=int, default=8)
    p.add_argument("--recover-passes", type=int, default=None,
                   help="pin recovery passes (auto scales with batch; "
                        "serving configs at nprobe<=4 want 1)")
    p.add_argument("--open-loop", action="store_true",
                   help="latency-vs-offered-load curve (Poisson arrivals at "
                        "--loads fractions of measured capacity)")
    p.add_argument("--loads", type=float, nargs="+", default=[0.25, 0.5, 0.8])
    p.add_argument("--capacity", type=float, default=None,
                   help="skip the capacity probe and use this QPS")
    p.add_argument("--wire", default="auto", choices=["auto", "uint8", "f32"],
                   help="query upload format (auto: uint8 when the corpus "
                        "is integral in [0,255] — lossless, 4x less upload)")
    p.add_argument("--json", action="store_true")
    p.add_argument("--outdir", default="results",
                   help="persist the result dict as a stamped JSON artifact "
                        '("" disables)')
    args = p.parse_args(argv)
    if args.open_loop:
        r = run_load_curve(dataset=args.dataset, batch=args.batch,
                           nprobe=args.nprobe, k=args.k,
                           requests=args.requests,
                           max_delay_ms=args.max_delay_ms,
                           inflight=args.inflight, loads=tuple(args.loads),
                           capacity=args.capacity, quiet=args.json,
                           wire=args.wire)
    else:
        r = run(dataset=args.dataset, batch=args.batch, nprobe=args.nprobe,
                k=args.k, requests=args.requests,
                max_delay_ms=args.max_delay_ms,
                inflight=args.inflight, recover_passes=args.recover_passes,
                quiet=args.json, wire=args.wire)
    if args.json:
        print(json.dumps(r))
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        mode = "openloop" if args.open_loop else "serving"
        path = os.path.join(
            args.outdir,
            f"executor_{mode}_b{args.batch}_{time.strftime('%Y%m%d_%H%M%S')}.json")
        with open(path, "w") as f:
            json.dump(r, f, indent=1)
        print(f"[bench_executor] artifact: {path}", flush=True)


if __name__ == "__main__":
    main()
