"""Recovery-shape lab: price zero-spill at 10M scale (VERDICT r4 item 7).

The skew-aware auto-recovery defaults buy zero lossy spill at a steep
sustained-throughput cost on SIFT-10M/nlist=8192 (np=8: 308K→189K QPS,
−39%; np=16: 245K→83K, −66% — RESULTS.md round 4).  Each recovery pass
re-invers the still-unplaced pairs and runs the sparse grouped kernel
over ``recover_blocks`` gathered blocks — but the default tranche
(nblocks//4 ≈ 1284 blocks at 10M) is sized for the worst case while the
measured skew says spill concentrates in a handful of hot cells whose
slabs span only tens of blocks.  This lab sweeps the pass shape
(recover_qcap × recover_blocks × recover_passes) at fixed (nlist,
nprobe) and reports recall / residual lossy spill / sustained QPS per
shape, so the defaults can charge only for the capacity the measured
skew actually needs.

Reference analog: the qcap/capacity study the reference never ran — its
IVF drops nothing because it gathers exact per-cluster candidate lists
host-side (``main_ivf.cpp:212-273``); zero-spill pricing is a
TPU-routing concern.

Usage (cached 10M index; ~1-3 min compile per new shape):
    python -m rag_on_edge_tpu.harness.recover_lab --dataset sift10m \
        --nlist 8192 --nprobe 8 --shapes auto off 128x256x1 128x512x1 \
        256x256x1 --json
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def measure(idx, ds, batch: int, k: int, nprobe: int, shape: str):
    """One shape → dict(recall@10, recall@1, spill/batch, qps).

    shape: "off" (recover=False), "auto" (library defaults), or
    "RQxRBxRP" (explicit recover_qcap x recover_blocks x passes).
    Recall over ALL query rows (harness protocol); throughput via the
    distinct-input chained protocol (harness/timing.py).
    """
    import jax
    import jax.numpy as jnp

    from rag_on_edge_tpu.harness import timing
    from rag_on_edge_tpu.utils.metrics import recall_at_k

    kw = dict(mode="cluster")
    if shape == "off":
        kw["recover"] = False
    elif shape != "auto":
        rq, rb, rp = (int(x) for x in shape.split("x"))
        kw.update(recover=True, recover_qcap=rq, recover_blocks=rb,
                  recover_passes=rp)

    f = lambda x: idx.search_device(x, k, nprobe, **kw)  # noqa: E731
    nq = ds.queries.shape[0]
    ids_parts, spills = [], []
    for s in range(0, nq, batch):
        chunk = ds.queries[s:s + batch]
        qs_c = np.resize(chunk, (batch, chunk.shape[1]))  # cyclic tail pad
        out = jax.block_until_ready(f(jnp.asarray(qs_c)))
        ids_parts.append(np.asarray(out[1])[: chunk.shape[0]])
        spills.append(int(idx.last_spill))
    ids = np.concatenate(ids_parts)
    gt = ds.ground_truth_l2
    qs = np.resize(ds.queries, (batch, ds.queries.shape[1]))
    batches = [jnp.asarray(b) for b in timing.unique_variants([qs], copies=4)]
    qps = timing.measure_throughput(f, batches, repeats=3)
    return {
        "shape": shape, "nprobe": nprobe, "batch": batch,
        "recall_at_10": round(float(recall_at_k(ids, gt[:nq], k)), 4),
        "recall_at_1": round(float(recall_at_k(ids[:, :1], gt[:nq, :1], 1)), 4),
        "lossy_spill_per_batch": max(spills),
        "qps": round(qps, 1),
        "engine": idx.last_engine,
    }


def main(argv=None) -> None:
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="sift10m")
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--pad-block", type=int, default=2048)
    p.add_argument("--spill-eps", type=float, default=0.1)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, nargs="+", default=[8])
    p.add_argument("--shapes", nargs="+",
                   default=["off", "auto", "128x256x1", "128x512x1",
                            "256x256x1"])
    p.add_argument("--outdir", default="results")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.datasets import load_dataset

    ds = load_dataset(args.dataset, gt_k=max(args.k, 10))
    idx = build_or_load_index(
        ds, nlist=args.nlist, metric="l2", dtype="int8",
        pad_block=args.pad_block, store="compact", spill_eps=args.spill_eps)

    rows = []
    for nprobe in args.nprobe:
        est = idx._est_max_load(args.batch, nprobe)
        qcap = idx._auto_qcap(args.batch, nprobe)
        print(f"# nprobe={nprobe}: est hottest-cell load "
              f"{est:.0f}, qcap {qcap}", flush=True)
        for shape in args.shapes:
            t0 = time.perf_counter()
            r = measure(idx, ds, args.batch, args.k, nprobe, shape)
            r["wall_s"] = round(time.perf_counter() - t0, 1)
            rows.append(r)
            print(json.dumps(r) if args.json else
                  f"  {shape:>12}: recall@10 {r['recall_at_10']:.4f} "
                  f"spill {r['lossy_spill_per_batch']:>6} "
                  f"QPS {r['qps']:>10,.0f}", flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(
        args.outdir,
        f"recover_lab_{args.dataset}_nlist{args.nlist}_{stamp}.json")
    with open(path, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"# artifact: {path}", flush=True)


if __name__ == "__main__":
    main()
