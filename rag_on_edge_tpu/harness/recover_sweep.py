"""Recovery-shape sweep: the cheapest ZERO-SPILL recovery config at scale.

VERDICT r4 item 7: on SIFT-10M/nlist=8192 the auto recovery defaults buy
zero spill at a steep price (np=8: 308K→189K QPS, −39%; np=16: 245K→83K,
−66%).  The auto heuristic reuses the search qcap as ``recover_qcap`` and
sizes passes to reach the estimated hottest-cluster load — but each pass
re-inverts + re-runs the grouped kernel, so FEWER passes with a BIGGER
per-pass tranche may reach the same capacity cheaper (recover_qcap has
the same scoped-VMEM ceiling as qcap: ≤ ~384 at pad_block=2048).

This sweep measures (recall@10, recall@1, QPS, residual spill) over
recover_qcap × recover_passes × recover_blocks at fixed nprobe, plus the
recovery-off and auto-default rows as anchors, so RESULTS.md can state
the measured frontier and `_auto_recover_passes` can be recalibrated.

Usage (after the 10M index exists — sweep10m builds it):
    python -m rag_on_edge_tpu.harness.recover_sweep --nprobe 8 16 \
        --recover-qcap 256 384 --recover-passes 1 2 3 [--json]

Reference analog: the reference has no routing-capacity concept (its
CSR scan visits every assigned row, ``IVFIndex.cpp:675-686``); this
frontier is native to the MoE-dispatch design and must be measured, not
ported.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _measure(idx, ds, batch: int, k: int, nprobe: int, kw: dict,
             repeats: int = 3):
    """(recall@10, recall@1, qps, spill_pairs_total, spill_max_batch) over
    ALL queries — search_device per cyclic-padded chunk (search() doesn't
    plumb the recovery knobs; this mirrors its padding contract)."""
    import jax
    import jax.numpy as jnp

    from rag_on_edge_tpu.harness import timing
    from rag_on_edge_tpu.utils.metrics import recall_at_k

    nq = ds.queries.shape[0]
    f = lambda q: idx.search_device(q, k, nprobe, mode="cluster", **kw)  # noqa: E731
    ids_parts, spills = [], []
    for s in range(0, nq, batch):
        chunk = ds.queries[s:s + batch]
        qs = np.resize(chunk, (batch, chunk.shape[1]))
        out = jax.block_until_ready(f(jnp.asarray(qs)))
        ids_parts.append(np.asarray(out[1])[: chunk.shape[0]])
        spills.append(int(np.asarray(idx.last_spill)))
    ids = np.concatenate(ids_parts)
    gt = ds.ground_truth_l2
    r10 = float(recall_at_k(ids, gt[:nq], k))
    r1 = float(recall_at_k(ids[:, :1], gt[:nq, :1], 1))
    qs = np.resize(ds.queries, (batch, ds.queries.shape[1]))
    batches = [jnp.asarray(b) for b in timing.unique_variants([qs], copies=4)]
    qps = timing.measure_throughput(f, batches, repeats=repeats)
    return round(r10, 4), round(r1, 4), round(qps, 1), sum(spills), max(spills)


def main(argv=None) -> None:
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="sift10m")
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--spill-eps", type=float, default=0.1)
    p.add_argument("--pad-block", type=int, default=2048)
    p.add_argument("--store", default="compact")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, nargs="+", default=[8, 16])
    p.add_argument("--recover-qcap", type=int, nargs="+", default=[256, 384])
    p.add_argument("--recover-passes", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--recover-blocks", type=int, nargs="+", default=[0],
                   help="0 = default (nblocks/4)")
    p.add_argument("--outdir", default="results")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    ds = load_dataset(args.dataset, gt_k=max(args.k, 10))
    idx = build_or_load_index(ds, nlist=args.nlist, metric="l2", dtype="int8",
                              pad_block=args.pad_block, store=args.store,
                              spill_eps=args.spill_eps)

    rows = []

    def emit(row: dict) -> None:
        rows.append(row)
        line = (f"np={row['nprobe']:<3} {row['config']:<22} "
                f"r@10={row['recall']:<7.4f} r@1={row['recall_at_1']:<7.4f} "
                f"QPS={row['qps']:>9,.0f} spill(max/batch)={row['spill_max']}")
        print(json.dumps(row) if args.json else line, flush=True)

    for nprobe in args.nprobe:
        # Anchor 1: recovery OFF (the raw qcap-spill price).
        r10, r1, qps, sp, spm = _measure(idx, ds, args.batch, args.k, nprobe,
                                         {"recover": False})
        emit({"nprobe": nprobe, "config": "off", "recall": r10,
              "recall_at_1": r1, "qps": qps, "spill_total": sp,
              "spill_max": spm})
        # Anchor 2: auto defaults (what search_device picks today).
        r10, r1, qps, sp, spm = _measure(idx, ds, args.batch, args.k, nprobe, {})
        auto_rp = idx._auto_recover_passes(args.batch, nprobe,
                                           idx._auto_qcap(args.batch, nprobe))
        emit({"nprobe": nprobe, "config": f"auto(rq=qcap,rp={auto_rp})",
              "recall": r10, "recall_at_1": r1, "qps": qps,
              "spill_total": sp, "spill_max": spm})
        for rq in args.recover_qcap:
            for rp in args.recover_passes:
                for rb in args.recover_blocks:
                    kw = {"recover": True, "recover_qcap": rq,
                          "recover_passes": rp}
                    if rb:
                        kw["recover_blocks"] = rb
                    r10, r1, qps, sp, spm = _measure(
                        idx, ds, args.batch, args.k, nprobe, kw)
                    emit({"nprobe": nprobe,
                          "config": f"rq={rq},rp={rp},rb={rb or 'def'}",
                          "recall": r10, "recall_at_1": r1, "qps": qps,
                          "spill_total": sp, "spill_max": spm})

    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        path = os.path.join(
            args.outdir,
            f"recover_sweep_{args.dataset}_nlist{args.nlist}_{stamp}.json")
        with open(path, "w") as f:
            json.dump({"config": vars(args), "rows": rows}, f, indent=1)
        print(f"[recover_sweep] artifact: {path}", flush=True)


if __name__ == "__main__":
    main()
