"""Skew calibration: measured hottest-cluster load vs the `_est_max_load`
heuristic, per nlist (VERDICT r4 item 5).

`IVFIndex._est_max_load` drives the recovery defaults with a clipped-
linear skew term (max/mean ≈ clip(nlist/256, 8, 32)) calibrated on two
points (nlist=1024 and 8192).  This harness measures the TRUTH —
:meth:`required_qcap` (exact max cluster load of the probe map) on real
query batches — at any nlist, so new calibration points pin or correct
the clip.  One coarse pass + host sync per (nlist, nprobe): cheap.

Usage:
    python -m rag_on_edge_tpu.harness.qcap_calib --dataset sift \
        --nlist 4096 --nprobe 4 8 16 [--batch 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None) -> None:
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="sift")
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, nargs="+", default=[4, 8, 16])
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--pad-block", type=int, default=2048)
    # The measured quantity (required_qcap = the probe map's hottest-
    # cluster load) depends ONLY on the coarse quantizer, but the cache
    # key includes the fine-store config — accept it so the calibration
    # reuses whatever index variant is already on disk (a sift10m cache
    # miss is a ~15-min rebuild + 6.8 GB second copy).
    p.add_argument("--spill-eps", type=float, default=None,
                   help="default: 0.1 for >=5M-row datasets (the cached "
                        "flagship variant), else 0")
    p.add_argument("--store", default=None,
                   help="default: compact for >=5M-row datasets")
    p.add_argument("--outdir", default="results")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    ds = load_dataset(args.dataset, gt_k=10)
    big = ds.base.shape[0] >= 5_000_000
    spill_eps = args.spill_eps if args.spill_eps is not None else (
        0.1 if big else 0.0)
    store = args.store or ("compact" if big else "padded")
    idx = build_or_load_index(ds, nlist=args.nlist, metric="l2", dtype="int8",
                              pad_block=args.pad_block, store=store,
                              spill_eps=spill_eps)

    rows = []
    for nprobe in args.nprobe:
        # Exact max load over the real query batch (multiple=1: the raw
        # max, not the qcap rounding — this is a calibration, not a knob).
        need = idx.required_qcap(
            np.resize(ds.queries, (args.batch, ds.queries.shape[1])),
            nprobe, multiple=1)
        mean = args.batch * min(nprobe, idx.nlist) / idx.nlist
        est = idx._est_max_load(args.batch, nprobe)
        row = {
            "dataset": args.dataset, "nlist": idx.nlist, "batch": args.batch,
            "nprobe": nprobe, "measured_max_load": int(need),
            "mean_load": round(mean, 1),
            "max_over_mean": round(need / mean, 1),
            "est_max_load": round(est, 1),
            "est_over_measured": round(est / need, 2),
        }
        rows.append(row)
        print(json.dumps(row) if args.json else
              f"nlist={row['nlist']} np={nprobe:<3} max_load={need:<5} "
              f"mean={mean:<8.1f} max/mean={row['max_over_mean']:<5} "
              f"est={est:<7.1f} est/measured={row['est_over_measured']}",
              flush=True)

    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        path = os.path.join(
            args.outdir,
            f"qcap_calib_{args.dataset}_nlist{args.nlist}_{stamp}.json")
        with open(path, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[qcap_calib] artifact: {path}", flush=True)


if __name__ == "__main__":
    main()
