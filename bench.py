#!/usr/bin/env python
"""Driver benchmark: prints the headline JSON line the moment the headline
section completes, then an enriched final line after the secondaries.

Headline: SIFT-1M IVF sustained throughput (B=8192, nprobe=4, k=10,
int8 cluster-major Pallas accum kernel + fp32 rescore, recall@10 ≈ 0.995)
— the frontier config of BASELINE.json's north star ("≥91% recall@1 …
at ≥100K QPS per v5e chip"); ``vs_baseline`` is QPS / that 100K target.
This metric is DEVICE-bound: one dispatch scores 8192 queries, so the
axon relay's per-dispatch sync cost (2.5-30 ms, varies run to run) is
amortized away and the number is stable across tunnel weather.

Survivability (the round-2 driver run timed out at >25 min and erased
every number because the old script printed once at exit):

- The headline JSON line is printed + flushed IMMEDIATELY when the 1M
  IVF section completes; the driver tails output, so a later timeout or
  relay outage can no longer destroy an already-measured headline.
  (Reference analog: metrics.txt is written incrementally per run,
  ``main.cpp:320-390`` — never only at process exit.)
- A wall-clock budget (``RAG_EDGE_BENCH_BUDGET_S``, default 1260 s) is
  checked before each secondary section; when exceeded, remaining
  sections are skipped and whatever was measured is emitted.
- ``rag_on_edge_tpu.harness.warmup`` pre-builds the datasets/indexes and
  pre-compiles every program this script runs into the persistent cache,
  so the driver run pays no cold remote compiles.

Secondary sections, in value order (serving runs FIRST — it needs only
the 1M index the headline just warmed; the 10M load is the expensive
section and must not gate it — VERDICT r4 item 1):

1. **Serving executor**: singleton submits through the BatchingExecutor
   at B=16384 (saturated protocol), plus a serialized relay-cycle probe
   (ms/batch) so "tunnel weather" is part of the record — capacity ≈
   B / cycle on this relay (RESULTS.md round-3 serving model).
2. **SIFT-10M flagship** (nlist=8192, spill_eps=0.1, np=4, compact
   store; round-3 nlist=4096/np=8 artifact as fallback) — LOADS the
   cached index only; a missing cache skips the section (the build is
   ~45 min — run sweep10m or warmup first).
3. The pad_block=512 dial point of the headline workload.
4. SIFT-1M brute force: the default accum config (``brute_rescored``,
   recall ≈ 0.998 — the residual loss is bin collisions, which NO
   rescore depth recovers; RESULTS.md pool-depth study) AND the exact
   fused kernel (``engine="pallas"``, in-kernel f32-unit selection)
   that matches the reference's exact-by-construction contract
   (``main.cpp:36-57``).
5. The reference's flagship SIFT-small INT8 config (5208 QPS on
   Snapdragon 8 Gen 2 HTP, README.md:143).  Stream numbers swing with
   relay sync cost (70K-637K across identical code) — report, never
   headline.
"""

import json
import os
import sys
import time

REFERENCE_QPS = 5208.0   # reference README.md:143 (batch=32 INT8 brute force)
TARGET_IVF_QPS = 100_000.0  # BASELINE.json north star, per v5e chip
BUDGET_S = float(os.environ.get("RAG_EDGE_BENCH_BUDGET_S", "1260"))

_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(out: dict) -> None:
    print(json.dumps(out), flush=True)


def _measure_search(idx, ds, batch: int, k: int, search_kw: dict):
    """Shared measurement body: recall over ALL query rows (the harness
    protocol — metrics.txt/RESULTS.md use the full 10K query set, so the
    bench must too; VERDICT r4 weak-5) + sustained throughput over
    distinct-input variants (relay caching — harness/timing.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.harness import timing
    from rag_on_edge_tpu.utils.metrics import recall_at_k

    nq = ds.queries.shape[0]
    f = lambda x: idx.search_device(x, k, **search_kw)  # noqa: E731
    ids_parts = []
    for s in range(0, nq, batch):
        chunk = ds.queries[s:s + batch]
        # Tail batches pad by cyclic repeat of the CHUNK (zero/identical
        # pads evict real pairs from qcap slots — RESULTS.md round 4).
        qs_c = np.resize(chunk, (batch, chunk.shape[1]))
        out = jax.block_until_ready(f(jnp.asarray(qs_c)))
        ids_parts.append(np.asarray(out[1])[: chunk.shape[0]])
    ids = np.concatenate(ids_parts)
    gt = ds.ground_truth_l2
    recall = recall_at_k(ids, gt[:nq], k)
    recall1 = recall_at_k(ids[:, :1], gt[:nq, :1], 1)
    qs = np.resize(ds.queries, (batch, ds.queries.shape[1]))
    batches = [jnp.asarray(b) for b in timing.unique_variants([qs], copies=4)]
    qps = timing.measure_throughput(f, batches, repeats=3)
    return round(qps, 1), round(float(recall), 4), round(float(recall1), 4)


def _ivf_1m(pad_block: int, batch: int = 8192, nprobe: int = 4, k: int = 10):
    """SIFT-1M IVF capacity point (pad_block is the recall-vs-QPS dial:
    2048 = headline 577K @ 0.9948, 512 = 672K @ 0.9900 — RESULTS.md)."""
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.datasets import load_dataset

    ds = load_dataset("sift", gt_k=max(k, 10))
    # ONE canonical 1M index per pad_block (build_or_load_index owns the
    # config and the on-disk cache): BENCH_rNN and the harness/RESULTS.md
    # sweeps quote the same artifact.
    idx = build_or_load_index(ds, nlist=1024, metric="l2", dtype="int8",
                              pad_block=pad_block)
    return _measure_search(idx, ds, batch, k,
                           {"nprobe": nprobe, "mode": "cluster"})


def _sift10m(batch: int = 8192, nprobe: int = 4, k: int = 10,
             nlist: int = 8192):
    """SIFT-10M flagship (nlist=8192, spill_eps=0.1, np=4, compact
    store — the round-4 frontier point: 0.9981 recall@10 / 0.9999
    recall@1 @ 350K QPS; RESULTS.md round-4 nlist frontier) — cached
    artifacts ONLY; raises FileNotFoundError when absent so the driver
    bench can never trigger the ~45-min build."""
    from rag_on_edge_tpu.harness.bench_ivf import DEFAULT_DATA_ROOT, build_or_load_index
    from rag_on_edge_tpu.utils.datasets import load_dataset

    cache = os.path.join(
        DEFAULT_DATA_ROOT, "sift10m",
        f"ivf_nlist{nlist}_l2_int8_seed42_pb2048_pp_sp0.1",
        "ivf_config.json")
    if not os.path.exists(cache):
        raise FileNotFoundError(
            f"cached 10M index missing ({cache}) — run sweep10m first")
    ds = load_dataset("sift10m", gt_k=max(k, 10))
    idx = build_or_load_index(ds, nlist=nlist, metric="l2", dtype="int8",
                              pad_block=2048, store="compact", spill_eps=0.1)
    return _measure_search(idx, ds, batch, k,
                           {"nprobe": nprobe, "mode": "cluster"})


def _serving(batch: int = 16384, requests: int = 131072, nprobe: int = 4,
             k: int = 10):
    """End-to-end serving: singleton submits through the BatchingExecutor
    (saturated protocol) + the serialized relay-cycle probe that prices
    this window's relay weather (capacity ≈ B / cycle).  max_delay=75 ms:
    the submit loop needs ~70 ms to fill a 16384-row batch (4.3 µs/req),
    so the 5 ms default fires batches ~67% full — measured round 4,
    avg 10.9K rows/launch, a weather-independent capacity leak."""
    from rag_on_edge_tpu.harness import bench_executor
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.datasets import load_dataset

    ds = load_dataset("sift", gt_k=k)
    idx = build_or_load_index(ds, nlist=1024, metric="l2", dtype="int8",
                              pad_block=2048)
    fn = lambda q: idx.search_device(  # noqa: E731
        q, k, nprobe, mode="cluster", recover_passes=1)
    # Probe at the serving wire format (uint8 for integral corpora —
    # round 5: the fp32 upload was ~80% of the cycle on a bandwidth-
    # priced relay window; the serving run below uploads uint8 too).
    wd = bench_executor._wire_dtype(ds.queries, "auto")
    cycle_ms = bench_executor.relay_cycle_probe(fn, ds.base.shape[1], batch,
                                                wire_dtype=wd)
    r = bench_executor.run(dataset="sift", batch=batch, nprobe=nprobe, k=k,
                           requests=requests, recover_passes=1, quiet=True,
                           max_delay_ms=75.0, index=idx)
    return r, round(cycle_ms, 1)


def _brute_1m(batch: int = 8192, k: int = 10, engine: str = "auto",
              rescore: bool | None = None):
    """SIFT-1M brute force.  engine="auto" picks the accum kernel + fp32
    rescore (recall@10 ≈ 0.998 — the residual loss is accum bin
    collisions, flat in rescore depth; RESULTS.md pool-depth study);
    engine="pallas" + rescore=True is the measured exact-contract config
    (per-tile binned selection has ~178x more candidate slots than
    accum's global lane fold, so the rescore pool keeps the true top-10:
    0.99995 recall@10 @ 124.1K — reference contract ``main.cpp:36-57``)."""
    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.utils.datasets import load_dataset

    ds = load_dataset("sift", gt_k=max(k, 10))
    index = BruteForceIndex(ds.base, metric="l2", dtype="int8",
                            engine=engine, rescore=rescore)
    q, r10, _ = _measure_search(index, ds, batch, k, {})
    return q, r10


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
        ivf_qps, ivf_recall, ivf_recall1 = _ivf_1m(pad_block=2048)
        out["value"] = ivf_qps
        out["vs_baseline"] = round(ivf_qps / TARGET_IVF_QPS, 3)
        out["sift1m_ivf_recall_at_10"] = ivf_recall
        out["sift1m_ivf_recall_at_1"] = ivf_recall1
    except Exception as e:  # keep the JSON line alive no matter what
        out["error_ivf_1m"] = repr(e)

    # Flush the headline NOW — a later timeout/outage can't erase it.
    if out["value"] is not None:
        _emit(out)

    # Secondary 1: serving executor at B=16384 + relay-cycle probe.
    # RUNS BEFORE the 10M section (VERDICT r4 item 1: the old ordering
    # put serving after the expensive 10M load, which ate the budget two
    # rounds running) — serving needs only the 1M index the headline
    # just warmed, so it is the cheap section.
    if _remaining() > 240:
        try:
            r, cycle_ms = _serving()
            out["serving_qps"] = r["qps_end_to_end"]
            out["serving_recall_at_10"] = r["recall"]
            out["serving_batch"] = r["batch"]
            out["serving_avg_rows_per_launch"] = r["pipeline"]["avg_rows_per_batch"]
            out["serving_wire"] = r["wire"]
            out["relay_cycle_ms_b16384"] = cycle_ms
        except Exception as e:
            out["error_serving"] = repr(e)
    else:
        out["skipped_serving"] = "budget"
    _emit(out)  # checkpoint: serving evidence survives a later timeout

    # Secondary 2: the SIFT-10M flagship (cached artifacts only) —
    # driver-captured evidence for the number RESULTS.md reports
    # (0.9981 recall@10 @ 350K QPS, nlist=8192/eps=0.1/np=4; falls back
    # to the round-3 nlist=4096/np=8 artifact if 8192 is absent).
    if _remaining() > 360:
        try:
            try:
                tq, tr10, tr1 = _sift10m()
                out["sift10m_config"] = "nlist8192_np4"
            except FileNotFoundError:
                tq, tr10, tr1 = _sift10m(nprobe=8, nlist=4096)
                out["sift10m_config"] = "nlist4096_np8"
            out["sift10m_qps_b8192"] = tq
            out["sift10m_recall_at_10"] = tr10
            out["sift10m_recall_at_1"] = tr1
        except FileNotFoundError as e:
            out["skipped_sift10m"] = f"no cached index: {e}"
        except Exception as e:
            out["error_sift10m"] = repr(e)
    else:
        out["skipped_sift10m"] = "budget"
    _emit(out)  # checkpoint: 10M evidence survives a later timeout

    # Secondary 3: the pad_block=512 dial point of the SAME headline
    # workload — the accum engine still engages at nlist=1024 (clusters
    # span <= 16 blocks of 512) and scans 4x less block padding:
    # measured 672K @ recall 0.990 vs 2048's 577K @ 0.9948 (RESULTS.md).
    if _remaining() > 180:
        try:
            pq, pr10, pr1 = _ivf_1m(pad_block=512)
            out["sift1m_ivf_pb512_qps_b8192_np4"] = pq
            out["sift1m_ivf_pb512_recall_at_10"] = pr10
            out["sift1m_ivf_pb512_recall_at_1"] = pr1
        except Exception as e:
            out["error_ivf_pb512"] = repr(e)
    else:
        out["skipped_ivf_pb512"] = "budget"

    # Secondary 4: SIFT-1M brute force — the default rescored config and
    # the exact fused kernel (RESULTS.md pool-depth study: the exactness
    # contract is an ENGINE choice, not a rescore depth).
    if _remaining() > 150:
        try:
            bq, br = _brute_1m(engine="auto")
            out["sift1m_brute_rescored_qps_b8192"] = bq
            out["sift1m_brute_rescored_recall_at_10"] = br
        except Exception as e:
            out["error_brute_1m"] = repr(e)
    else:
        out["skipped_brute_1m"] = "budget"
    if _remaining() > 120:
        try:
            bq, br = _brute_1m(engine="pallas", rescore=True)
            out["sift1m_brute_exact_qps_b8192"] = bq
            out["sift1m_brute_exact_recall_at_10"] = br
            out["sift1m_brute_exact_engine"] = "pallas+rescore"
        except Exception as e:
            out["error_brute_exact"] = repr(e)
    else:
        out["skipped_brute_exact"] = "budget"

    # Secondary 5: the reference's flagship SIFT-small config
    # (relay-weather sensitive — see module docstring).
    if _remaining() > 90:
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
    else:
        out["skipped_siftsmall"] = "budget"

    if out["value"] is None and "siftsmall_bruteforce_stream_qps_b32x64" in out:
        # Fallback headline if the 1M section failed.
        out["metric"] = "siftsmall_int8_bruteforce_sustained_qps_b32"
        out["value"] = out["siftsmall_bruteforce_stream_qps_b32x64"]
        out["vs_baseline"] = out["siftsmall_vs_reference_5208"]
    out["bench_wall_s"] = round(time.monotonic() - _T0, 1)
    _emit(out)


if __name__ == "__main__":
    sys.exit(main())
