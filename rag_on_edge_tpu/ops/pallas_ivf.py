"""Cluster-major IVF fine-scan kernel.

One Pallas kernel performs the entire IVF fine stage for a batch: the grid
walks every block of the block-padded, cluster-contiguous database
(``IVFIndex`` device layout) in storage order; for each block it loads the
[D, BLK] slab tile and the *routed query set* of the block's cluster
(scalar-prefetch drives the BlockSpec index maps — the TPU version of the
reference's indirect cluster addressing, ``IVFIndex.cpp:604-620``), scores
them on the MXU, and maintains a per-slot running top-k in VMEM scratch
that is flushed to the per-cluster output when the cluster's last block
retires.

L2 ranking is folded in via augmentation (q' = [q, 1], b' = [b, -‖b‖²/2]),
so the kernel itself is metric-free.  Rows of empty routing slots produce
garbage per-slot results, but the stage-4 join only gathers (cluster, slot)
pairs recorded by the probe inversion, so they are never read.

Compared with the XLA ``lax.scan`` fallback (per-cluster max-size dynamic
slices): no max-cluster padding is ever read (blocks are exact), the slab
tile streams through the double-buffered grid pipeline, and selection is
gated by a running-threshold skip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_on_edge_tpu.ops.pallas_bruteforce import _extract_topk, binned_top2

__all__ = ["cluster_major_scan", "cluster_major_scan_grouped", "build_block_tables"]

_NEG_INF = float("-inf")


def build_block_tables(offsets: np.ndarray, sizes: np.ndarray, blk: int):
    """Static per-index tables for the block walk.

    offsets: [nlist] padded row starts (multiples of blk); sizes: [nlist]
    actual rows.  Returns (block_cluster [nblocks], block_is_first,
    block_is_last [nblocks] int32, rows_valid [nblocks] — valid rows in
    each block, 0..blk, last_block [nlist] — index of each cluster's last
    block, 0 for empty clusters, whose output the join must mask).
    """
    nlist = len(sizes)
    n_padded = int(offsets[-1] + -(-int(sizes[-1]) // blk) * blk) if nlist else 0
    nblocks = n_padded // blk
    block_cluster = np.zeros(nblocks, np.int32)
    first = np.zeros(nblocks, np.int32)
    last = np.zeros(nblocks, np.int32)
    rows_valid = np.zeros(nblocks, np.int32)
    last_block = np.zeros(nlist, np.int32)
    for c in range(nlist):
        b0 = int(offsets[c]) // blk
        nb = -(-int(sizes[c]) // blk)
        if nb == 0:
            # Empty clusters occupy zero rows and get zero blocks; their
            # (unwritten) output rows are excluded by the join's
            # sizes>0 mask.
            continue
        block_cluster[b0 : b0 + nb] = c
        first[b0] = 1
        last[b0 + nb - 1] = 1
        last_block[c] = b0 + nb - 1
        for j in range(nb):
            rows_valid[b0 + j] = min(blk, int(sizes[c]) - j * blk)
    return block_cluster, first, last, rows_valid, last_block


def _grouped_kernel(
    # scalar prefetch
    block_first, block_last, rows_valid, row_base,
    # inputs: qb_ref, vec_ref, [bias_ref], then outputs and scratch
    qb_ref, vec_ref, *rest,
    k, blk, group, nbins, bin_depth, has_bias,
):
    """Grouped walk: one grid step scores GROUP consecutive blocks with
    entirely regular index maps (the routed-query table is pre-gathered
    per block), amortizing the per-step dispatch/DMA overhead that
    dominates the per-cluster variant (kernel_lab: ~7 µs/step floor).

    ``row_base[j]`` is the global row id of block j's first column —
    ``j·blk`` for the dense walk, ``blocks_list[j]·blk`` when the caller
    walks a compacted subset of blocks (the spilled-pair recovery pass)."""
    if has_bias:
        bias_ref, out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref = rest
    else:
        bias_ref = None
        out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref = rest
    g = pl.program_id(0)
    fill = jnp.float32(_NEG_INF)

    for i in range(group):
        j = g * group + i

        @pl.when(block_first[j] == 1)
        def _init():
            sv_ref[:] = jnp.full_like(sv_ref, fill)
            si_ref[:] = jnp.zeros_like(si_ref)

        qg = qb_ref[0, i]  # [qcap, D]
        int_path = qg.dtype == jnp.int8
        scores = jax.lax.dot_general(
            qg, vec_ref[0, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int_path else jnp.float32,
            precision=jax.lax.Precision.HIGHEST
            if qg.dtype == jnp.float32 else None,
        )  # [qcap, BLK]
        if int_path:
            scores = scores.astype(jnp.float32)
        if bias_ref is not None:
            scores = scores - bias_ref[0, i]  # [1, BLK] broadcast
        qcap = scores.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (qcap, blk), 1)
        scores = jnp.where(cols < rows_valid[j], scores, fill)
        improves = jnp.any(jnp.max(scores, axis=1) > sv_ref[:, k - 1])

        @pl.when(improves)
        def _select():
            # Staged only when selection runs: binned_top2 slices the REF
            # (lane-aligned), and the store is dead on skipped blocks.
            sc_ref[:] = scores
            tv, ti = binned_top2(sc_ref, row_base[j], blk, nbins, fill, depth=bin_depth)
            cand_v = jnp.concatenate([sv_ref[:], tv], axis=1)
            cand_i = jnp.concatenate([si_ref[:], ti], axis=1)
            mv, mi = _extract_topk(cand_v, cand_i, k, fill)
            sv_ref[:] = mv
            si_ref[:] = mi

        @pl.when(block_last[j] == 1)
        def _emit():
            out_v_ref[0, i] = sv_ref[:]
            out_i_ref[0, i] = si_ref[:]


@functools.partial(
    jax.jit, static_argnames=("k", "blk", "group", "nbins", "bin_depth", "interpret")
)
def cluster_major_scan_grouped(
    qg_blocks: jax.Array,
    vectors_t: jax.Array,
    block_first: jax.Array,
    block_last: jax.Array,
    rows_valid: jax.Array,
    k: int,
    blk: int = 2048,
    group: int = 4,
    nbins: int = 128,
    bin_depth: int = 2,
    bias: jax.Array | None = None,
    row_base: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Grouped cluster-major fine scan (see :func:`_grouped_kernel`).

    qg_blocks: [nblocks, qcap, D] — the block's cluster's routed queries,
               pre-gathered (``qg[block_cluster]``).  Trades an extra XLA
               gather for fully regular kernel index maps.
    vectors_t: [nblocks, D, blk] block-tiled slabs; nblocks must be a
               multiple of ``group`` (pad with rows_valid == 0 dummies).
    bias:      optional [nblocks, 1, blk] (int8-L2 bias per block).
    row_base:  optional [nblocks] i32 global row id of each block's first
               column (defaults to ``arange(nblocks)·blk``); pass
               ``blocks_list·blk`` when scanning a compacted block subset.
    Returns (pv, pr) of shape [nblocks, qcap, k]; only rows at each
    cluster's ``last_block`` are defined — join via ``pv[last_block[c]]``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if blk % nbins:
        raise ValueError(f"blk={blk} must be a multiple of nbins={nbins}")
    nblocks, qcap, d = qg_blocks.shape
    if nblocks % group:
        raise ValueError(f"nblocks={nblocks} must be a multiple of group={group}")
    if vectors_t.shape != (nblocks, d, blk):
        raise ValueError(
            f"vectors_t must be [nblocks, {d}, {blk}], got {vectors_t.shape}"
        )
    if (qg_blocks.dtype == jnp.int8) != (vectors_t.dtype == jnp.int8):
        raise ValueError("int8 path requires BOTH qg_blocks and vectors_t int8")
    ngroups = nblocks // group
    if row_base is None:
        row_base = jnp.arange(nblocks, dtype=jnp.int32) * blk

    in_specs = [
        pl.BlockSpec((1, group, qcap, d), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, d, blk), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [
        qg_blocks.reshape(ngroups, group, qcap, d),
        vectors_t.reshape(ngroups, group, d, blk),
    ]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, group, 1, blk), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(bias.reshape(ngroups, group, 1, blk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ngroups,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, qcap, k), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, qcap, k), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qcap, k), jnp.float32),
            pltpu.VMEM((qcap, k), jnp.int32),
            pltpu.VMEM((qcap, blk), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _grouped_kernel, k=k, blk=blk, group=group, nbins=nbins, bin_depth=bin_depth,
        has_bias=bias is not None,
    )
    pv, pr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngroups, group, qcap, k), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, group, qcap, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * blk * d * qcap,
            bytes_accessed=nblocks * (blk * d * vectors_t.dtype.itemsize
                                      + qcap * d * qg_blocks.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_first, block_last, rows_valid, row_base, *inputs)
    return pv.reshape(nblocks, qcap, k), pr.reshape(nblocks, qcap, k)


def _routed_grouped_kernel(
    # scalar prefetch
    block_first, block_last, rows_valid, row_base,
    # inputs: qi_ref (resident), cq_ref, vec_ref, [bias_ref], outs, scratch
    qi_ref, cq_ref, vec_ref, *rest,
    k, blk, group, nbins, bin_depth, has_bias,
):
    """Grouped walk with IN-KERNEL routing: instead of reading a
    pre-gathered [nblocks, qcap, D] table from HBM, the whole query batch
    stays VMEM-resident and each block's routed set is materialized on
    the MXU as ``onehot(cq) @ q`` — a gather expressed as a matmul, the
    TPU-native way to do dynamic row selection."""
    if has_bias:
        bias_ref, out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref = rest
    else:
        bias_ref = None
        out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref = rest
    g = pl.program_id(0)
    fill = jnp.float32(_NEG_INF)
    qi = qi_ref[:]  # [B, D] resident across the whole grid
    b_total = qi.shape[0]
    int_path = qi.dtype == jnp.int8

    for i in range(group):
        j = g * group + i

        @pl.when(block_first[j] == 1)
        def _init():
            sv_ref[:] = jnp.full_like(sv_ref, fill)
            si_ref[:] = jnp.zeros_like(si_ref)

        cq = cq_ref[0, i]  # [qcap, 1]; -1 rows produce all-zero one-hots
        qcap = cq.shape[0]
        bcols = jax.lax.broadcasted_iota(jnp.int32, (qcap, b_total), 1)
        onehot = (cq == bcols).astype(qi.dtype)
        qg = jax.lax.dot_general(
            onehot, qi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int_path else jnp.float32,
            precision=None if int_path else jax.lax.Precision.HIGHEST,
        ).astype(qi.dtype)  # [qcap, D] — one-hot rows reproduce qi exactly
        scores = jax.lax.dot_general(
            qg, vec_ref[0, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int_path else jnp.float32,
            precision=jax.lax.Precision.HIGHEST
            if qg.dtype == jnp.float32 else None,
        )  # [qcap, BLK]
        if int_path:
            scores = scores.astype(jnp.float32)
        if bias_ref is not None:
            scores = scores - bias_ref[0, i]
        cols = jax.lax.broadcasted_iota(jnp.int32, (qcap, blk), 1)
        scores = jnp.where(cols < rows_valid[j], scores, fill)
        improves = jnp.any(jnp.max(scores, axis=1) > sv_ref[:, k - 1])

        @pl.when(improves)
        def _select():
            # Staged only when selection runs: binned_top2 slices the REF
            # (lane-aligned), and the store is dead on skipped blocks.
            sc_ref[:] = scores
            tv, ti = binned_top2(sc_ref, row_base[j], blk, nbins, fill, depth=bin_depth)
            cand_v = jnp.concatenate([sv_ref[:], tv], axis=1)
            cand_i = jnp.concatenate([si_ref[:], ti], axis=1)
            mv, mi = _extract_topk(cand_v, cand_i, k, fill)
            sv_ref[:] = mv
            si_ref[:] = mi

        @pl.when(block_last[j] == 1)
        def _emit():
            out_v_ref[0, i] = sv_ref[:]
            out_i_ref[0, i] = si_ref[:]


@functools.partial(
    jax.jit, static_argnames=("k", "blk", "group", "nbins", "bin_depth", "interpret")
)
def cluster_major_scan_routed(
    qi: jax.Array,
    cq_blocks: jax.Array,
    vectors_t: jax.Array,
    block_first: jax.Array,
    block_last: jax.Array,
    rows_valid: jax.Array,
    k: int,
    blk: int = 2048,
    group: int = 4,
    nbins: int = 128,
    bin_depth: int = 2,
    bias: jax.Array | None = None,
    row_base: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Grouped cluster-major scan with in-kernel one-hot routing.

    qi:        [B, D] the WHOLE query batch (int8 or f32; B ideally a
               multiple of 128 — pad with zero rows).  Resident in VMEM
               for the whole grid; no routed table ever exists in HBM.
    cq_blocks: [nblocks, qcap, 1] int32 — per block, the routed query
               indices of its cluster (−1 = empty slot).
    Other args/returns as :func:`cluster_major_scan_grouped`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if blk % nbins:
        raise ValueError(f"blk={blk} must be a multiple of nbins={nbins}")
    nblocks, qcap, one = cq_blocks.shape
    if one != 1:
        raise ValueError("cq_blocks must be [nblocks, qcap, 1]")
    if nblocks % group:
        raise ValueError(f"nblocks={nblocks} must be a multiple of group={group}")
    b_total, d = qi.shape
    if vectors_t.shape != (nblocks, d, blk):
        raise ValueError(
            f"vectors_t must be [nblocks, {d}, {blk}], got {vectors_t.shape}"
        )
    if (qi.dtype == jnp.int8) != (vectors_t.dtype == jnp.int8):
        raise ValueError("int8 path requires BOTH qi and vectors_t int8")
    ngroups = nblocks // group
    if row_base is None:
        row_base = jnp.arange(nblocks, dtype=jnp.int32) * blk

    in_specs = [
        pl.BlockSpec((b_total, d), lambda g, bf, bl, rv, rb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, qcap, 1), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, d, blk), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [
        qi,
        cq_blocks.reshape(ngroups, group, qcap, 1),
        vectors_t.reshape(ngroups, group, d, blk),
    ]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, group, 1, blk), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(bias.reshape(ngroups, group, 1, blk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ngroups,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, group, qcap, k), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, qcap, k), lambda g, bf, bl, rv, rb: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qcap, k), jnp.float32),
            pltpu.VMEM((qcap, k), jnp.int32),
            pltpu.VMEM((qcap, blk), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _routed_grouped_kernel, k=k, blk=blk, group=group, nbins=nbins, bin_depth=bin_depth,
        has_bias=bias is not None,
    )
    pv, pr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngroups, group, qcap, k), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, group, qcap, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * blk * d * qcap + 2 * nblocks * qcap * b_total * d,
            bytes_accessed=nblocks * blk * d * vectors_t.dtype.itemsize
            + b_total * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_first, block_last, rows_valid, row_base, *inputs)
    return pv.reshape(nblocks, qcap, k), pr.reshape(nblocks, qcap, k)


def _kernel(
    # scalar prefetch
    block_cluster, block_first, block_last, rows_valid, row_base,
    # inputs: q_ref, vec_ref, [bias_ref], then outputs and scratch
    q_ref, vec_ref, *rest,
    k, blk, nbins, bin_depth, has_bias,
):
    if has_bias:
        bias_ref, out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref = rest
    else:
        bias_ref = None
        out_v_ref, out_i_ref, sv_ref, si_ref, sc_ref = rest
    j = pl.program_id(0)
    fill = jnp.float32(_NEG_INF)

    @pl.when(block_first[j] == 1)
    def _init():
        sv_ref[:] = jnp.full_like(sv_ref, fill)
        si_ref[:] = jnp.zeros_like(si_ref)

    qg = q_ref[0]  # [qcap, D']
    int_path = qg.dtype == jnp.int8
    scores = jax.lax.dot_general(
        qg, vec_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if int_path else jnp.float32,
        precision=jax.lax.Precision.HIGHEST if qg.dtype == jnp.float32 else None,
    )  # [qcap, BLK]
    if int_path:
        # int32 dots are ≤ D·127² (< 2²⁴ for D ≤ 1024): exact in f32.
        scores = scores.astype(jnp.float32)
    if bias_ref is not None:
        scores = scores - bias_ref[:]  # [1, BLK] broadcast
    qcap = scores.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (qcap, blk), 1)
    scores = jnp.where(cols < rows_valid[j], scores, fill)
    improves = jnp.any(jnp.max(scores, axis=1) > sv_ref[:, k - 1])

    @pl.when(improves)
    def _select():
        # Stage scores in scratch: Mosaic cannot lane-slice computed
        # values, but slicing a VMEM ref is native — the binning below
        # reads chunks.  Stored only when selection runs (dead on skip).
        sc_ref[:] = scores
        # Top-2-per-strided-bin partial reduction (shared with the
        # brute-force kernel; TPU-KNN PartialReduce, arXiv:2206.14286) —
        # lost near-duplicates are recovered statistically by the k' > k
        # candidate pool + fp32 rescore downstream.
        tv, ti = binned_top2(sc_ref, row_base[j], blk, nbins, fill, depth=bin_depth)
        # Merge into the running top-k (narrow: k + 2*nbins wide).
        cand_v = jnp.concatenate([sv_ref[:], tv], axis=1)
        cand_i = jnp.concatenate([si_ref[:], ti], axis=1)
        mv, mi = _extract_topk(cand_v, cand_i, k, fill)
        sv_ref[:] = mv
        si_ref[:] = mi

    @pl.when(block_last[j] == 1)
    def _emit():
        out_v_ref[0] = sv_ref[:]
        out_i_ref[0] = si_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "blk", "nbins", "bin_depth", "interpret"))
def cluster_major_scan(
    qg: jax.Array,
    vectors_t: jax.Array,
    block_cluster: jax.Array,
    block_first: jax.Array,
    block_last: jax.Array,
    rows_valid: jax.Array,
    k: int,
    blk: int = 512,
    nbins: int = 128,
    bin_depth: int = 2,
    bias: jax.Array | None = None,
    row_base: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Inner-product fine-scan of every cluster against its routed queries.

    qg:        [nlist, qcap, D'] routed queries (zeros for empty slots;
               D' may include an L2 augmentation column).  int8 queries
               select the int8 MXU path (int32 accumulate → f32 scores) and
               require int8 ``vectors_t``.
    vectors_t: [nblocks, D', blk] BLOCK-TILED transposed database
               (f32/bf16/int8).  The tiled layout makes each grid step's
               slab fetch one contiguous HBM transfer; a flat [D', Npad]
               layout costs D' strided segments per block (measured ~2.5x
               bandwidth loss at blk=2048).
    block_*:   tables from :func:`build_block_tables`.
    bias:      optional [1, Npad] f32 subtracted from each score column —
               the int8 L2 path passes ``‖b‖² / (2·sq·sb)`` here so the
               kernel needs no quantization scales (per-row ranking is
               invariant to the positive factor 2·sq·sb).
    row_base:  optional [nblocks] i32 global row id of each block's first
               column (defaults to ``arange(nblocks)·blk``); pass
               ``blocks_list·blk`` when scanning a compacted block subset
               (the spilled-pair recovery pass).
    Returns (pv [nlist, qcap, k] f32, pr [nlist, qcap, k] i32 — global row
    ids into the padded layout).  Slots not recorded by the probe
    inversion carry garbage; the join must not read them.

    OUTPUT-WINDOW CONSTRAINT: the output refs are indexed by
    ``block_cluster[j]``, and Pallas requires each output block to be
    visited in ONE consecutive grid run.  Walk blocks sorted by cluster,
    and point any padding/excluded blocks at the cluster of the
    IMMEDIATELY PRECEDING real block (with rows_valid 0) — a dummy whose
    cluster id revisits an earlier cluster flushes stale scratch over its
    already-emitted rows.  (The grouped/routed variants return per-BLOCK
    outputs and have no such constraint.)
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if blk % nbins:
        raise ValueError(f"blk={blk} must be a multiple of nbins={nbins}")
    if (vectors_t.dtype == jnp.int8) != (qg.dtype == jnp.int8):
        raise ValueError("int8 path requires BOTH qg and vectors_t int8")
    nlist, qcap, d = qg.shape
    nblocks = vectors_t.shape[0]
    if vectors_t.shape[1:] != (d, blk):
        raise ValueError(
            f"vectors_t must be block-tiled [nblocks, {d}, {blk}], got {vectors_t.shape}"
        )

    if row_base is None:
        row_base = jnp.arange(nblocks, dtype=jnp.int32) * blk
    in_specs = [
        pl.BlockSpec(
            (1, qcap, d), lambda j, bc, bf, bl, rv, rb: (bc[j], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, d, blk), lambda j, bc, bf, bl, rv, rb: (j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [qg, vectors_t]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, blk), lambda j, bc, bf, bl, rv, rb: (0, j), memory_space=pltpu.VMEM
            )
        )
        inputs.append(bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, qcap, k), lambda j, bc, bf, bl, rv, rb: (bc[j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, qcap, k), lambda j, bc, bf, bl, rv, rb: (bc[j], 0, 0),
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
        _kernel, k=k, blk=blk, nbins=nbins, bin_depth=bin_depth, has_bias=bias is not None
    )
    pv, pr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nlist, qcap, k), jnp.float32),
            jax.ShapeDtypeStruct((nlist, qcap, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * blk * d * qcap,
            bytes_accessed=nblocks * blk * d * vectors_t.dtype.itemsize
            + nlist * qcap * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_cluster, block_first, block_last, rows_valid, row_base, *inputs)
    return pv, pr
