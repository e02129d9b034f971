"""Kernel-variant lab: isolate where the cluster-major scan's time goes.

The stage profiler (`profile_ivf.py`) showed the fine-scan kernel is bound
by a per-block fixed cost (~5 µs/block at blk=512), largely independent of
qcap.  This lab times stripped-down kernel variants over the same grid to
attribute that cost:

- ``full``     — the production kernel (binned top-2 + running merge).
- ``nogate``   — selection every block (no improves-threshold branch).
- ``maxonly``  — GEMM + row-max write only (no selection, no scratch
                 staging): the DMA/GEMM/grid floor.
- ``fixedout`` — maxonly with CONSTANT output index maps (results wrong;
                 timing only): isolates the cost of per-cluster output
                 window flushes vs ``maxonly``.

Usage:
    python -m rag_on_edge_tpu.harness.kernel_lab --dataset sift \
        --pad-block 2048 --qcap 128 --variants full maxonly
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_on_edge_tpu.harness import timing
from rag_on_edge_tpu.models.ivf import IVFIndex, invert_probes
from rag_on_edge_tpu.ops import pallas_ivf, quantize, topk
from rag_on_edge_tpu.ops.pallas_bruteforce import _extract_topk, binned_top2

_NEG_INF = float("-inf")


def _variant_kernel(block_cluster, block_first, block_last, rows_valid,
                    q_ref, vec_ref, out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref,
                    *, k, blk, nbins, variant):
    j = pl.program_id(0)
    fill = jnp.float32(_NEG_INF)
    qg = q_ref[0]
    int_path = qg.dtype == jnp.int8
    scores = jax.lax.dot_general(
        qg, vec_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if int_path else jnp.float32,
        precision=None if int_path else jax.lax.Precision.HIGHEST,
    )
    if int_path:
        scores = scores.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cols < rows_valid[j], scores, fill)

    if variant in ("maxonly", "fixedout"):
        m = jnp.max(scores, axis=1, keepdims=True)
        out_v_ref[0] = jnp.broadcast_to(m, out_v_ref.shape[1:])
        out_i_ref[0] = jnp.zeros(out_i_ref.shape[1:], jnp.int32)
        return

    @pl.when(block_first[j] == 1)
    def _init():
        sv_ref[:] = jnp.full_like(sv_ref, fill)
        si_ref[:] = jnp.zeros_like(si_ref)

    def _select():
        # Stored inside the gate, matching the production kernels (the
        # ungated store charged 'full' a per-block VMEM store the
        # production kernel no longer pays).
        sc_ref[:] = scores
        tv, ti = binned_top2(sc_ref, j * blk, blk, nbins, fill)
        cand_v = jnp.concatenate([sv_ref[:], tv], axis=1)
        cand_i = jnp.concatenate([si_ref[:], ti], axis=1)
        mv, mi = _extract_topk(cand_v, cand_i, k, fill)
        sv_ref[:] = mv
        si_ref[:] = mi

    if variant == "nogate":
        _select()
    else:  # full
        improves = jnp.any(jnp.max(scores, axis=1) > sv_ref[:, k - 1])
        pl.when(improves)(_select)

    @pl.when(block_last[j] == 1)
    def _emit():
        out_v_ref[0] = sv_ref[:]
        out_i_ref[0] = si_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "blk", "nbins", "variant"))
def _variant_scan(qg, vectors_t, bc, bf, bl, rv, k, blk, nbins, variant):
    nlist, qcap, d = qg.shape
    nblocks = vectors_t.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, qcap, d), lambda j, bc, bf, bl, rv: (bc[j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, blk), lambda j, bc, bf, bl, rv: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, qcap, k),
                (lambda j, bc, bf, bl, rv: (0, 0, 0)) if variant == "fixedout"
                else (lambda j, bc, bf, bl, rv: (bc[j], 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, qcap, k),
                (lambda j, bc, bf, bl, rv: (0, 0, 0)) if variant == "fixedout"
                else (lambda j, bc, bf, bl, rv: (bc[j], 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((qcap, k), jnp.float32),
            pltpu.VMEM((qcap, k), jnp.int32),
            pltpu.VMEM((qcap, blk), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _variant_kernel, k=k, blk=blk, nbins=nbins, variant=variant
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nlist, qcap, k), jnp.float32),
            jax.ShapeDtypeStruct((nlist, qcap, k), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(bc, bf, bl, rv, qg, vectors_t)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="sift")
    ap.add_argument("--pad-block", type=int, default=2048)
    ap.add_argument("--qcap", type=int, default=128)
    ap.add_argument("--nbins", type=int, default=128)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "nogate", "maxonly"])
    args = ap.parse_args()

    from rag_on_edge_tpu.utils.cache import enable_compilation_cache
    from rag_on_edge_tpu.utils.datasets import load_dataset

    enable_compilation_cache()
    ds = load_dataset(args.dataset, gt_k=10)
    idx = IVFIndex.build(ds.base, nlist=None, metric="l2", dtype="int8",
                         pad_block=args.pad_block, seed=42)
    idx._ensure_kernel_state()
    a = idx._arrays
    nblocks = a["vectors_t"].shape[0]

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.permuted(
        np.resize(ds.queries, (args.batch, ds.queries.shape[1])), axis=0
    ).astype(np.float32))

    # One fixed routing (built once, outside the timed region): the lab
    # times the KERNEL, so the routed table is part of the input.
    coarse = q @ a["centroids"].T
    _, probes = topk.small_topk(coarse, args.nprobe)
    cq, _, _ = invert_probes(probes, idx.nlist, args.qcap)
    sq = quantize.calibrate_scale(q)
    qi = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
    qg = jnp.where((cq >= 0)[..., None], qi[jnp.clip(cq, 0)], jnp.int8(0))
    # Keep qg int8: unique_variants row-rolls integer inputs (distinct
    # bitwise), while a float-staged copy's sub-quantum jitter would be
    # TRUNCATED AWAY by the astype(int8) inside the timed fn — every
    # repeat would then feed a value-identical input, which the relay can
    # serve from cache (the repo's own timing doctrine).
    qg = jax.block_until_ready(qg.astype(jnp.int8))

    print(f"{args.dataset}: nblocks={nblocks} blk={args.pad_block} "
          f"qcap={args.qcap} k={args.k} nbins={args.nbins}")
    for variant in args.variants:
        fn = lambda x: _variant_scan(  # noqa: E731
            x, a["vectors_t"], a["block_cluster"],
            a["block_first"], a["block_last"], a["rows_valid"], args.k,
            args.pad_block, args.nbins, variant,
        )
        # measure_throughput counts leading-dim rows (nlist here) per call.
        rows_ps = timing.measure_throughput(fn, [qg], repeats=args.repeats)
        per_call_ms = qg.shape[0] / rows_ps * 1e3
        print(f"  {variant:<9} {per_call_ms:8.2f} ms/call "
              f"({per_call_ms * 1e3 / nblocks:6.2f} us/block)")


if __name__ == "__main__":
    main()
