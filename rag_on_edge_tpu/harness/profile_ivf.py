"""Per-stage device-time breakdown of the cluster-major IVF search.

Times cumulative prefixes of the pipeline (coarse → invert → route/gather →
kernel → join/rescore) with the chained-dependency protocol
(:mod:`rag_on_edge_tpu.harness.timing`); stage cost = difference between
successive prefixes.  The reference reports the analogous split as
``SearchTiming{centroid, gather, fine}`` (``IVFIndex.h:31-36``).

Usage:
    python -m rag_on_edge_tpu.harness.profile_ivf --dataset sift \
        --dtype int8 --metric l2 --batch 2048 --nprobe 4
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.harness import timing
from rag_on_edge_tpu.models import ivf as ivf_mod
from rag_on_edge_tpu.ops import pallas_ivf, quantize


def _stage_fns(index: "ivf_mod.IVFIndex", k: int, nprobe: int, qcap: int,
               engine: str = "pallas"):
    """Cumulative-prefix jits; each returns one f32 leaf first (chainable)."""
    index._ensure_kernel_state()
    arrays = index._arrays
    int8 = index.dtype == "int8"

    def coarse(arrays, q):
        return index._coarse_probes(arrays, q, nprobe)  # the production stage 1

    def p_coarse(arrays, q):
        return coarse(arrays, q).astype(jnp.float32)

    def p_invert(arrays, q):
        probes = coarse(arrays, q)
        cq, slot, spill = ivf_mod.invert_probes(probes, index.nlist, qcap)
        return probes[:, :1].astype(jnp.float32) + spill.astype(jnp.float32), cq, slot

    def route(arrays, q):
        probes = coarse(arrays, q)
        cq, slot, _ = ivf_mod.invert_probes(probes, index.nlist, qcap)
        routed = (cq >= 0)[..., None]
        if int8:
            sq = quantize.calibrate_scale(q)
            qi = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
            qk = jnp.where(routed, qi[jnp.clip(cq, 0)], jnp.int8(0))
            alpha = sq * jnp.float32(index._base_scale)
            bias = None
            if index.metric == "l2":
                alpha = 2.0 * alpha
                # Per-block bias rows exactly like production: padded to
                # the table's dummy-block region (the kernel's bias index
                # map walks nblocks blocks, not n_padded columns).
                nblocks = arrays["vectors_t"].shape[0]
                norms = arrays["vector_norms"]
                pad = nblocks * index.PAD_BLOCK - norms.shape[0]
                if pad:
                    norms = jnp.pad(norms, (0, pad))
                bias = (norms / alpha).reshape(nblocks, 1, index.PAD_BLOCK)
            return qk, bias, probes, slot
        qg = jnp.where(routed, q[jnp.clip(cq, 0)], 0.0)
        qk = qg
        if index.metric == "l2":
            qk = jnp.concatenate([qg, jnp.where(routed, 1.0, 0.0)], axis=-1)
        return qk.astype(arrays["vectors_t"].dtype), None, probes, slot

    def p_route(arrays, q):
        qk, _, _, _ = route(arrays, q)
        return jnp.sum(qk.astype(jnp.float32), axis=(1, 2))

    def p_kernel(arrays, q):
        # The PRODUCTION grouped kernel over the per-block routed table
        # (engine='pallas'); the legacy per-cluster cluster_major_scan
        # profiled here before is a different kernel with a different
        # gather, which mis-attributed the '+join/rescore' delta.
        qk, bias, _, _ = route(arrays, q)
        qb = qk[arrays["block_cluster"]]
        pv, pr = pallas_ivf.cluster_major_scan_grouped(
            qb, arrays["vectors_t"],
            arrays["block_first"], arrays["block_last"], arrays["rows_valid"],
            k=2 * k, blk=index.PAD_BLOCK, group=index.CM_GROUP, bias=bias,
        )
        return pv[:, :, :1], pr

    def p_full(arrays, q):
        # engine='pallas' matches p_kernel's stage; pass --engine
        # pallas_accum to profile the auto default end-to-end instead
        # (its kernel stage has no standalone prefix here).
        return index._search_cluster_major_impl(
            arrays, q, k, nprobe, qcap, engine=engine, rescore=True
        )

    names = ["coarse+topk", "+invert", "+route/gather", "+kernel", "+join/rescore"]
    fns = [p_coarse, p_invert, p_route, p_kernel, p_full]
    return names, [functools.partial(jax.jit(f), arrays) for f in fns]


def profile(index, queries: np.ndarray, k: int, nprobe: int,
            qcap: int | None = None, repeats: int = 6,
            engine: str = "pallas"):
    b = queries.shape[0]
    qcap = qcap or index._auto_qcap(b, nprobe)
    names, fns = _stage_fns(index, k, nprobe, qcap, engine=engine)
    rows, prev = [], 0.0
    for name, fn in zip(names, fns):
        qps = timing.measure_throughput(fn, [jnp.asarray(queries)], repeats=repeats)
        ms = b / qps * 1e3
        rows.append((name, ms, ms - prev))
        prev = ms
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="siftsmall")
    ap.add_argument("--metric", default="l2")
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--nlist", type=int, default=None)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--qcap", type=int, default=None)
    ap.add_argument("--engine", default="pallas",
                    choices=["pallas", "pallas_routed", "pallas_accum"])
    args = ap.parse_args()

    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    enable_compilation_cache()
    ds = load_dataset(args.dataset, gt_k=args.k)
    index = ivf_mod.IVFIndex.build(
        ds.base, nlist=args.nlist, metric=args.metric, dtype=args.dtype, seed=42
    )
    rng = np.random.default_rng(0)
    q = rng.permuted(
        np.resize(ds.queries, (args.batch, ds.queries.shape[1])), axis=0
    ).astype(np.float32)
    rows = profile(index, q, args.k, args.nprobe, args.qcap,
                   engine=args.engine)
    print(f"batch={args.batch} nprobe={args.nprobe} k={args.k} "
          f"dtype={args.dtype} qcap={args.qcap or index._auto_qcap(args.batch, args.nprobe)}")
    for name, cum, delta in rows:
        print(f"  {name:<16} cumulative {cum:8.2f} ms   stage {delta:8.2f} ms")


if __name__ == "__main__":
    main()
