"""Cluster-major IVF fine scan: manual multi-DMA ring + packed accumulation.

Round-1's cluster-major kernels (:mod:`rag_on_edge_tpu.ops.pallas_ivf`)
are bound by the automatic Pallas grid pipeline's single-DMA-in-flight
streaming (~35-40 GB/s, kernel_lab "maxonly" floor: 8.2 ms of an 11.5 ms
batch) plus per-block top-k merges.  This kernel applies the two fixes
measured on the brute-force path (ops/pallas_bruteforce_dma.py):

1. **Manual DMA ring**: slabs, routed-query tables and bias rows live in
   HBM (`pl.ANY`) and stream through a ``depth``-deep VMEM ring of
   ``pltpu.make_async_copy`` transfers — the marginal-bandwidth probe
   (hw_probe pallas_dma) shows eight concurrent copies reach 839 GB/s,
   HBM speed-of-light on this chip, vs ~40 GB/s for the automatic grid
   pipeline.
2. **Packed accumulation selection**: scores are packed with a 4-bit
   block-in-cluster code in the low bits — ``key = (dots << 4) | code``
   (int path; the int8-L2 bias rows arrive pre-shifted so the pack is one
   subtract) or an order-preserving f32→i32 key with the low mantissa
   bits ceded to the code (float path) — and folded into a per-slot
   [qcap, blk] accumulator with ONE elementwise maximum per block.  The
   only top-k machinery runs once per cluster at its last block: a
   strided per-128-lane-bin partial reduction of the accumulator ref
   (top-1 or top-2 per bin) followed by one ``_extract_topk`` over the
   narrow candidate pool.

Rebuild of the reference's NEON cluster scan (``IVFIndex.cpp:604-693``)
under the same routed-capacity contract as ``cluster_major_scan_grouped``
(qg_blocks pre-gathered per block, per-block outputs joined at each
cluster's ``last_block``).

Constraints: the dense block walk only (``row_base == arange·blk``; the
spilled-pair recovery pass keeps the round-1 kernels), and at most 16
blocks (= ``CODE_BITS``) per cluster — the code identifies a candidate's
block as an offset behind the cluster's last block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_on_edge_tpu.ops.pallas_bruteforce import _extract_topk

__all__ = ["cluster_major_accum", "cluster_major_accum_planes", "CODE_MAX",
           "INT8_DIM_MAX", "INT8_DIM_MAX_BIAS", "KMIN"]

CODE_MAX = 16  # blocks-per-cluster cap (4 low bits of the packed key)
# int8-path dimension caps (int32 key headroom): |q.b| <= d*127^2 must stay
# below 2^23 after the 8-bit shift; the L2 bias path also subtracts rows
# pre-shifted to up to 2^29, tightening the bound.
INT8_DIM_MAX = 512
INT8_DIM_MAX_BIAS = 384
# Invalid-entry sentinel of the packed planes (the join filters on it —
# import KMIN there, never re-derive it).
KMIN = _KMIN = -(2**31) + 1


def _monotone_key(x: jax.Array) -> jax.Array:
    """f32 -> i32 order-preserving key (IEEE-754 total-order trick)."""
    m = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(m >= 0, m, m ^ jnp.int32(0x7FFFFFFF))


def _key_to_f32(kk: jax.Array) -> jax.Array:
    m = jnp.where(kk >= 0, kk, kk ^ jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(m, jnp.float32)


def _binned_packed_top(acc_ref, qcap, blk, depth):
    """Top-``depth`` per 128-lane strided bin of the packed accumulator.

    Returns [(packed [qcap, 128], chunk_id [qcap, 128]), ...] — the packed
    key carries score + block code; the chunk id recovers the column.
    """
    w = blk // 128
    big = jnp.int32(2**30)
    kmin = jnp.int32(_KMIN)
    chunks = [acc_ref[:, c * 128 : (c + 1) * 128] for c in range(w)]
    out = []
    for _ in range(depth):
        m = chunks[0]
        for c in chunks[1:]:
            m = jnp.maximum(m, c)
        cid = jnp.full((qcap, 128), big, jnp.int32)
        for ci, c in enumerate(chunks):
            cid = jnp.minimum(cid, jnp.where(c == m, ci, big))
        out.append((m, cid))
        chunks = [jnp.where(c == m, kmin, c) for c in chunks]
    return out


def _plane_max(acc_ref, blk, depth):
    """Per-128-lane-bin top-``depth`` of the packed accumulator, WITHOUT
    column recovery: with the chunk id packed into each key's low bits
    (planes mode), keys are distinct across chunks at a given bin, so the
    mask-out after each plane hits exactly the winning chunk and the
    column decodes later from the key itself.  ~(depth·w) elementwise ops
    vs the ~3x of :func:`_binned_packed_top`'s id tracking."""
    w = blk // 128
    kmin = jnp.int32(_KMIN)
    chunks = [acc_ref[:, c * 128 : (c + 1) * 128] for c in range(w)]
    out = []
    for p in range(depth):
        m = chunks[0]
        for c in chunks[1:]:
            m = jnp.maximum(m, c)
        out.append(m)
        if p + 1 < depth:
            chunks = [jnp.where(c == m, kmin, c) for c in chunks]
    return out


def _kernel(
    # scalar prefetch
    block_first, block_last, rows_valid,
    # refs
    *refs,
    k, blk, qcap, group, depth, nblocks, int_path, has_bias, mask_rows, bin2,
    planes=False,
):
    refs = list(refs)
    qg_hbm = refs.pop(0)
    vec_hbm = refs.pop(0)
    bias_hbm = refs.pop(0) if has_bias else None
    if planes:
        out_p_ref = refs.pop(0)
    else:
        out_v_ref, out_i_ref = refs.pop(0), refs.pop(0)
    ring_q = refs.pop(0)
    ring_v = refs.pop(0)
    ring_b = refs.pop(0) if has_bias else None
    acc_ref = refs.pop(0)
    sem_q, sem_v = refs.pop(0), refs.pop(0)
    sem_b = refs.pop(0) if has_bias else None

    g = pl.program_id(0)
    kmin = jnp.int32(_KMIN)

    def start(t, slot):
        pltpu.make_async_copy(qg_hbm.at[t], ring_q.at[slot], sem_q.at[slot]).start()
        pltpu.make_async_copy(vec_hbm.at[t], ring_v.at[slot], sem_v.at[slot]).start()
        if has_bias:
            pltpu.make_async_copy(
                bias_hbm.at[t], ring_b.at[slot], sem_b.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(ring_q.at[slot], ring_q.at[slot], sem_q.at[slot]).wait()
        pltpu.make_async_copy(ring_v.at[slot], ring_v.at[slot], sem_v.at[slot]).wait()
        if has_bias:
            pltpu.make_async_copy(
                ring_b.at[slot], ring_b.at[slot], sem_b.at[slot]).wait()

    @pl.when(g == 0)
    def _warm():
        for s in range(depth):
            start(s, s)

    for i in range(group):
        slot = i % depth  # static: group is a multiple of depth
        t = g * group + i
        wait(slot)

        @pl.when(block_first[t] == 1)
        def _init():
            acc_ref[:] = jnp.full_like(acc_ref, kmin)

        scores = jax.lax.dot_general(
            ring_q[slot], ring_v[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int_path else jnp.float32,
            precision=None if int_path else jax.lax.Precision.HIGHEST,
        )  # [qcap, blk]
        # Ties resolve toward the EARLIER block: lower t -> higher code.
        code = jnp.int32(CODE_MAX - 1) - (t & (CODE_MAX - 1))
        if planes:
            # Planes mode packs the CHUNK id too — (code << 4) | cid in the
            # low 8 bits — so the emit needs no column recovery and no
            # in-kernel extract at all; the join decodes rows from the key.
            cid = jax.lax.broadcasted_iota(jnp.int32, (qcap, blk), 1) >> 7
            pack = jax.lax.shift_left(code, 4) | cid
            if int_path:
                key = jax.lax.shift_left(scores, 8)
                # Bias rows arrive pre-shifted ((bias << 8) - pack), so the
                # pack rides the same single subtract.
                key = key - ring_b[slot] if has_bias else key | pack
            else:
                key = (_monotone_key(scores) & jnp.int32(~255)) | pack
        else:
            if int_path:
                key = jax.lax.shift_left(scores, 4)
                # Bias rows arrive pre-shifted (bias<<4 - code), so the pack
                # is one subtract and the low bits still decode to `code`.
                key = key - ring_b[slot] if has_bias else key | code
            else:
                key = _monotone_key(scores)
                key = (key & jnp.int32(~(CODE_MAX - 1))) | code
        if mask_rows:
            lane = jax.lax.broadcasted_iota(jnp.int32, (qcap, blk), 1)
            key = jnp.where(lane < rows_valid[t], key, kmin)
        acc_ref[:] = jnp.maximum(acc_ref[:], key)

        @pl.when(block_last[t] == 1)
        def _emit():
            if planes:
                # Emit the RAW per-bin planes — [qcap, depth·128] packed
                # keys; top-kk selection and row decode happen at the XLA
                # join, where k max-passes over the joined pool cost ~0 next
                # to this kernel.  An entry equal to _KMIN is invalid (init
                # value / rows_valid-masked padding).
                out_p_ref[0, i] = jnp.concatenate(
                    _plane_max(acc_ref, blk, 2 if bin2 else 1), axis=1)
                return
            lane = jax.lax.broadcasted_iota(jnp.int32, (qcap, 128), 1)
            vs, rs = [], []
            for m, cid in _binned_packed_top(acc_ref, qcap, blk, 2 if bin2 else 1):
                c = m & jnp.int32(CODE_MAX - 1)
                d = ((t & (CODE_MAX - 1)) - (jnp.int32(CODE_MAX - 1) - c)) & jnp.int32(
                    CODE_MAX - 1
                )
                row = (t - d) * blk + cid * 128 + lane
                invalid = m == kmin
                vs.append(jnp.where(
                    invalid, kmin,
                    jax.lax.shift_right_arithmetic(m, 4) if int_path else m))
                rs.append(jnp.where(invalid, 0, row))
            cand_v = jnp.concatenate(vs, axis=1)
            cand_r = jnp.concatenate(rs, axis=1)
            mv, mi = _extract_topk(cand_v, cand_r, k, kmin)
            # NOTE on a measured dead end: extracting k/2 per plane
            # ("plane-split") halves this pass count but only GUARANTEES
            # the per-cluster top-k/2 — and the fp32 rescore needs the full
            # int8-top-k per cluster (true neighbors routinely sit at
            # int8-rank k/2..k; SIFT-1M np=4 recall@10 0.995→0.951).  The
            # real escape from the extract cost is the planes emit.
            ninf = jnp.float32(float("-inf"))
            fv = mv.astype(jnp.float32) if int_path else _key_to_f32(mv)
            out_v_ref[0, i] = jnp.where(mv == kmin, ninf, fv)
            out_i_ref[0, i] = mi

        @pl.when(t + depth < nblocks)
        def _refill():
            start(t + depth, slot)


@functools.partial(
    jax.jit,
    static_argnames=("k", "blk", "group", "depth", "bin2", "mask_rows",
                     "interpret"),
)
def cluster_major_accum(
    qg_blocks: jax.Array,
    vectors_t: jax.Array,
    block_first: jax.Array,
    block_last: jax.Array,
    rows_valid: jax.Array,
    k: int,
    blk: int = 2048,
    group: int = 8,
    depth: int = 8,
    bin2: bool = True,
    bias_rows: jax.Array | None = None,
    mask_rows: bool | None = None,
    interpret: bool | None = None,
):
    """DMA-ring cluster-major fine scan with packed accumulation.

    qg_blocks: [nblocks, qcap, D] routed queries per block (int8 or float;
               pre-gathered ``qk[block_cluster]``).
    vectors_t: [nblocks, D, blk] block-tiled slabs (dense walk; nblocks a
               multiple of ``group`` via rows_valid==0 dummy blocks).
    block_first/block_last/rows_valid: tables from
               :func:`rag_on_edge_tpu.ops.pallas_ivf.build_block_tables`.
               Clusters must span <= ``CODE_MAX`` blocks.
    bias_rows: int8-L2 mode — [nblocks, 1, blk] int32 pre-shifted rows
               ``round(norms/alpha)<<4 - code(t)`` with padded columns set
               to a huge fill; when present the kernel skips the
               rows_valid mask (the fill already buries padding).
               CAUTION: this 4-bit layout is NOT the planes builder's —
               the model's inline builder (ivf.py, planes path) pre-shifts
               by 8 and subtracts the full ``(code<<4)|cid`` pack; reusing
               it here would scale scores by 256 and scramble block codes.
    mask_rows: force/skip the per-block rows_valid mask (default: skip
               exactly when bias_rows covers padding).
    Returns (pv [nblocks, qcap, k] f32, pr [nblocks, qcap, k] i32 global
    padded row ids); only each cluster's ``last_block`` rows are defined,
    and unroutable slots carry -inf/0.  int-path values are in
    ``dots - round(norms/alpha)`` units — multiply by alpha like the
    round-1 engines; float-path values lose <= 4 low mantissa bits.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if group % depth:
        raise ValueError(f"group={group} must be a multiple of depth={depth}")
    if blk % 128:
        raise ValueError(f"blk={blk} must be a multiple of 128")
    nblocks, qcap, d = qg_blocks.shape
    if nblocks % group or nblocks < depth:
        raise ValueError(
            f"nblocks={nblocks} must be a multiple of group={group} and >= depth"
        )
    if vectors_t.shape != (nblocks, d, blk):
        raise ValueError(
            f"vectors_t must be [nblocks, {d}, {blk}], got {vectors_t.shape}"
        )
    int_path = vectors_t.dtype == jnp.int8
    if int_path != (qg_blocks.dtype == jnp.int8):
        raise ValueError("int8 path requires BOTH qg_blocks and vectors_t int8")
    has_bias = bias_rows is not None
    if has_bias and not int_path:
        raise ValueError("bias_rows is the int8-L2 path; float bases fold "
                         "norms into an augmented dimension instead")
    if mask_rows is None:
        mask_rows = not has_bias
    ngroups = nblocks // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ngroups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 if has_bias else 2),
        out_specs=[
            pl.BlockSpec((1, group, qcap, k), lambda g, bf, bl, rv: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, qcap, k), lambda g, bf, bl, rv: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth, qcap, d), qg_blocks.dtype),
            pltpu.VMEM((depth, d, blk), vectors_t.dtype),
        ]
        + ([pltpu.VMEM((depth, 1, blk), jnp.int32)] if has_bias else [])
        + [
            pltpu.VMEM((qcap, blk), jnp.int32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ]
        + ([pltpu.SemaphoreType.DMA((depth,))] if has_bias else []),
    )
    inputs = [qg_blocks, vectors_t]
    if has_bias:
        inputs.append(bias_rows)
    kernel = functools.partial(
        _kernel, k=k, blk=blk, qcap=qcap, group=group, depth=depth,
        nblocks=nblocks, int_path=int_path, has_bias=has_bias,
        mask_rows=mask_rows, bin2=bin2,
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
    )(block_first, block_last, rows_valid, *inputs)
    return pv.reshape(nblocks, qcap, k), pr.reshape(nblocks, qcap, k)


@functools.partial(
    jax.jit,
    static_argnames=("blk", "group", "depth", "bin2", "interpret"),
)
def cluster_major_accum_planes(
    qg_blocks: jax.Array,
    vectors_t: jax.Array,
    block_first: jax.Array,
    block_last: jax.Array,
    rows_valid: jax.Array,
    blk: int = 2048,
    group: int = 8,
    depth: int = 8,
    bin2: bool = True,
    bias_rows: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Accum fine scan emitting RAW packed bin planes — no in-kernel top-k.

    The extract-emit variant (:func:`cluster_major_accum`) still pays
    ~k·(2·nbins) max-passes per cluster, which at one-block-per-cluster
    shapes (SIFT-1M, blk=2048) is most of the kernel (chip-measured:
    312K QPS ≈ the grouped engine's 323K at B=8192/np=4 — the selection
    cost just moved from per-block merges to per-cluster extracts).  This
    variant deletes in-kernel selection entirely: keys carry the CHUNK id
    too — ``key = (score << 8) | (code << 4) | cid`` (ties resolve toward
    earlier blocks/chunks; float keys cede 8 low mantissa bits) — so the
    emit is just the per-bin top-``depth`` plane maxes, written as
    [qcap, planes·128] packed i32.  Top-kk selection + row decode happen
    at the XLA join over the gathered (query, probe) pool — a pool that
    STRICTLY CONTAINS the extract emit's top-k, so recall can only match
    or improve.

    Requirements beyond :func:`cluster_major_accum`: ``blk ≤ 2048`` (4-bit
    chunk id), int dots |q·b| < 2**23 - 1 after the 8-bit shift (true for
    any D ≤ 512 int8 data), and bias_rows pre-shifted by 8 with the full
    pack subtracted (see the model's builder).  The rows_valid mask is
    ALWAYS applied (an entry == _KMIN is invalid; bias fill tricks cannot
    mark validity in the raw planes).

    Returns pp [nblocks, qcap, planes·128] i32 packed keys; only each
    cluster's ``last_block`` rows are defined.  Decode: score = key >> 8
    (arithmetic; int path — float path: ``_key_to_f32(key)`` within 8 low
    mantissa bits), d = (t_last - ((t_last & 15) - (15 - ((key >> 4) & 15))
    & 15)), row = d·blk + (key & 15)·128 + lane.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if group % depth:
        raise ValueError(f"group={group} must be a multiple of depth={depth}")
    if blk % 128 or blk > 128 * CODE_MAX:
        raise ValueError(f"blk={blk} must be a multiple of 128 and <= "
                         f"{128 * CODE_MAX} (4-bit chunk id)")
    nblocks, qcap, d = qg_blocks.shape
    if nblocks % group or nblocks < depth:
        raise ValueError(
            f"nblocks={nblocks} must be a multiple of group={group} and >= depth"
        )
    if vectors_t.shape != (nblocks, d, blk):
        raise ValueError(
            f"vectors_t must be [nblocks, {d}, {blk}], got {vectors_t.shape}"
        )
    int_path = vectors_t.dtype == jnp.int8
    if int_path != (qg_blocks.dtype == jnp.int8):
        raise ValueError("int8 path requires BOTH qg_blocks and vectors_t int8")
    has_bias = bias_rows is not None
    if has_bias and not int_path:
        raise ValueError("bias_rows is the int8-L2 path")
    if int_path:
        # int32 headroom for the packed key: |dots| <= d*127^2 must clear
        # the 8-bit shift (< 2^23), and the bias path additionally
        # subtracts pre-shifted rows clipped at |bias| <= 2^21 (a further
        # 2^29 after the shift) — without these bounds the shift wraps
        # and ranking is silently garbage.
        d_cap = INT8_DIM_MAX_BIAS if has_bias else INT8_DIM_MAX
        if d > d_cap:
            raise ValueError(
                f"int8 planes path supports dim <= {d_cap} "
                f"({'L2 bias' if has_bias else 'IP'}): |q.b| <= d*127^2 "
                f"must fit int32 after the 8-bit key shift; got d={d}. "
                "Use engine='pallas' (grouped kernel) for wider vectors."
            )
    nplanes = 2 if bin2 else 1
    w = nplanes * 128
    ngroups = nblocks // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ngroups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 if has_bias else 2),
        out_specs=[
            pl.BlockSpec((1, group, qcap, w), lambda g, bf, bl, rv: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth, qcap, d), qg_blocks.dtype),
            pltpu.VMEM((depth, d, blk), vectors_t.dtype),
        ]
        + ([pltpu.VMEM((depth, 1, blk), jnp.int32)] if has_bias else [])
        + [
            pltpu.VMEM((qcap, blk), jnp.int32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ]
        + ([pltpu.SemaphoreType.DMA((depth,))] if has_bias else []),
    )
    inputs = [qg_blocks, vectors_t]
    if has_bias:
        inputs.append(bias_rows)
    kernel = functools.partial(
        _kernel, k=w, blk=blk, qcap=qcap, group=group, depth=depth,
        nblocks=nblocks, int_path=int_path, has_bias=has_bias,
        mask_rows=True, bin2=bin2, planes=True,
    )
    pp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngroups, group, qcap, w), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * blk * d * qcap,
            bytes_accessed=nblocks * (blk * d * vectors_t.dtype.itemsize
                                      + qcap * d * qg_blocks.dtype.itemsize
                                      + qcap * w * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_first, block_last, rows_valid, *inputs)[0]
    return pp.reshape(nblocks, qcap, w)
