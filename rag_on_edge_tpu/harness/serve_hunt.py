"""Weather-gated serving run: probe the relay cycle, fire the saturated
serving bench only when the window is good (VERDICT r3 item 2: break 100K).

The serving ceiling is relay weather (serialized cycle ~88 ms good /
~130 medium / ~340 bad on identical code — RESULTS.md round 3), so an
unconditional run under-reports capacity.  This runner polls the
serialized relay-cycle probe and launches the saturated B=16384
singleton-submit run the moment the cycle drops under ``--good-ms``; it
re-tries until the 100K bar is met or the wait budget expires.

Every probe reading and every completed run is appended to ONE JSON
artifact (``results/serving_hunt_<stamp>.json``, written incrementally)
so a hunt that never finds its window still leaves a dated table of
cycles proving it — and a relay outage mid-hunt (CLAUDE.md: 10+ minute
UNAVAILABLE drops) is logged and survived, not fatal (ADVICE r4).

Run AFTER ``harness.warmup`` (needs the cached 1M index + compiled
programs).  Reference analog: the serving numbers the reference
publishes are its own harness binaries' output (``main.cpp:281-318``);
this makes the weather gating part of the recorded artifact instead of
prose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="sift")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--requests", type=int, default=131072)
    ap.add_argument("--good-ms", type=float, default=115.0,
                    help="serialized cycle below this = good-enough window")
    ap.add_argument("--max-delay-ms", type=float, default=75.0)
    ap.add_argument("--max-wait-s", type=float, default=1500.0,
                    help="bounds when the FINAL run may start; total wall "
                         "time is up to this plus one full run")
    ap.add_argument("--poll-s", type=float, default=60.0)
    ap.add_argument("--target-qps", type=float, default=100_000.0)
    ap.add_argument("--outdir", default="results")
    args = ap.parse_args()

    from rag_on_edge_tpu.harness import bench_executor
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    enable_compilation_cache()

    ds = load_dataset(args.dataset, gt_k=10)
    # ONE index, shared with bench_executor.run via index= — a second
    # device-resident copy of the slabs + fp32 store (~1.1 GB) would
    # otherwise coexist for the whole serving run (ADVICE r4).
    pad_block = 2048 if ds.base.shape[0] >= 500_000 else None
    idx = build_or_load_index(ds, nlist=None, metric="l2", dtype="int8",
                              pad_block=pad_block)

    def fn(q):
        return idx.search_device(q, 10, args.nprobe, mode="cluster",
                                 recover_passes=1)

    # The weather probe must price the SAME wire format the serving run
    # uploads (uint8 for integral corpora — bench_executor._wire_dtype).
    wd = bench_executor._wire_dtype(ds.queries, "auto")

    os.makedirs(args.outdir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(args.outdir, f"serving_hunt_{stamp}.json")
    record = {
        "config": {k: getattr(args, k) for k in
                   ("batch", "nprobe", "requests", "good_ms", "max_delay_ms",
                    "max_wait_s", "target_qps")},
        "started": stamp, "probes": [], "runs": [], "best": None,
    }

    def save() -> None:
        with open(path, "w") as f:
            json.dump(record, f, indent=1)

    t0 = time.monotonic()
    best = None
    try:
        while True:
            now = round(time.monotonic() - t0, 1)
            try:
                cycle = bench_executor.relay_cycle_probe(
                    fn, ds.base.shape[1], args.batch, wire_dtype=wd)
            except Exception as e:  # relay outage — log, wait, re-poll
                print(f"[hunt] t={now}s probe FAILED: {e!r}", flush=True)
                record["probes"].append({"t_s": now, "error": repr(e)})
                save()
                time.sleep(args.poll_s)
                continue
            print(f"[hunt] t={now}s relay cycle {cycle:.1f} ms/batch",
                  flush=True)
            record["probes"].append({"t_s": now, "cycle_ms": round(cycle, 1)})
            save()
            out_of_time = time.monotonic() - t0 > args.max_wait_s
            if cycle <= args.good_ms or out_of_time:
                try:
                    r = bench_executor.run(
                        dataset="sift", batch=args.batch, nprobe=args.nprobe,
                        k=10, requests=args.requests, recover_passes=1,
                        max_delay_ms=args.max_delay_ms, quiet=False, index=idx)
                except Exception as e:  # outage mid-run — keep hunting
                    print(f"[hunt] t={now}s run FAILED: {e!r}", flush=True)
                    record["runs"].append(
                        {"t_s": now, "cycle_ms": round(cycle, 1),
                         "error": repr(e)})
                    save()
                    if out_of_time:
                        break
                    time.sleep(args.poll_s)
                    continue
                r["relay_cycle_ms"] = round(cycle, 1)
                r["t_s"] = now
                r["trigger"] = "out_of_time" if cycle > args.good_ms else "window"
                print(json.dumps(r), flush=True)
                record["runs"].append(r)
                if best is None or r["qps_end_to_end"] > best["qps_end_to_end"]:
                    best = r
                    record["best"] = best
                save()
                if r["qps_end_to_end"] >= args.target_qps or out_of_time:
                    break
                continue  # the run itself took ~minutes — re-probe now
            time.sleep(args.poll_s)
    finally:
        record["best"] = best
        save()
        print("[hunt] BEST:", json.dumps(best), flush=True)
        print(f"[hunt] artifact: {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
