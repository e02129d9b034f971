"""Fused brute-force search with a MANUAL multi-DMA input pipeline.

The round-1 kernel (:mod:`rag_on_edge_tpu.ops.pallas_bruteforce`) relies on
the automatic Pallas grid pipeline, which keeps at most one input-window
DMA in flight and is therefore DMA-LATENCY-bound: measured ~30-70 GB/s
effective HBM streaming regardless of tile shape (hw_probe pallas_stream).
The same walk with eight concurrent ``pltpu.make_async_copy`` transfers
reaches 839 GB/s — HBM speed-of-light on this chip (hw_probe pallas_dma).

This kernel (``fused_topk_accum``) therefore keeps the database in HBM
(`pl.ANY`), block-tiled as [T, D, tile_n] (one contiguous transfer per
tile), and streams it through a ``depth``-deep VMEM ring with explicit
async copies: while tile t is scored on the MXU and folded into the
packed accumulator, tiles t+1..t+depth-1 are in flight.  (An earlier
``fused_topk_matmul_tiled`` variant that kept round-1's in-loop top-k
merges was superseded and removed — selection was 90% of its runtime;
see the accumulation design note below.)

Grid = (B / tile_b,): each grid step owns one query block and walks every
base tile with the ring; the [B, N] score matrix never exists anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_on_edge_tpu.ops.pallas_bruteforce import _extract_topk

__all__ = ["fused_topk_accum", "tile_base"]


def tile_base(base_t: np.ndarray, tile_n: int, depth: int):
    """[D, N] -> ([T, D, tile_n] block-tiled copy, T); pads N to a
    tile_n*depth multiple with zero columns (masked by n_valid)."""
    d, n = base_t.shape
    step = tile_n * depth
    pad = (-n) % step
    if pad:
        base_t = np.pad(base_t, ((0, 0), (0, pad)))
    t = (n + pad) // tile_n
    tiled = np.ascontiguousarray(
        base_t.reshape(d, t, tile_n).transpose(1, 0, 2)
    )
    return tiled, t


# --------------------------------------------------------------------------
# Tile-parallel packed accumulation: the hot loop is GEMM + 3 elementwise ops.
#
# The round-1 kernels ran per-tile top-k merges (k max-and-mask passes) in
# the hot loop; a stripped-variant bisect on the real chip measured them at
# ~12 us/tile vs 1.4 us for DMA+GEMM+mask — selection was 90% of the kernel.
# Here the 2048 lane positions of the score tile ARE the selection bins:
# each tile packs its scores with the tile-index-in-group in the low bits
# (one shift + one or/subtract) and folds into a [tile_b, tile_n] running
# accumulator with a single elementwise maximum.  Once per GROUP tiles the
# accumulator is unpacked (score, global column) and merged into running
# value/id planes with two selects; the only top-k extraction is one
# _extract_topk per query block over the tile_n-bin candidate pool.
#
# The price is per-bin top-1 over the whole database walk: two true top-k
# members colliding in the same (column mod tile_n) bin lose one.  For
# k=10, tile_n=2048 the expected loss is C(10,2)/2048 ~ 2% of batches one
# candidate — invisible next to int8 quantization, and recoverable with a
# k' > k pool + rescoring exactly like the binned merge path.


def _monotone_key(x: jax.Array) -> jax.Array:
    """f32 -> i32 order-preserving key (IEEE-754 total order trick)."""
    m = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(m >= 0, m, m ^ jnp.int32(0x7FFFFFFF))


def _key_to_f32(kk: jax.Array) -> jax.Array:
    m = jnp.where(kk >= 0, kk, kk ^ jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(m, jnp.float32)


def _accum_kernel(*refs, k, tile_n, depth, group, n, n_tiles, int_path,
                  l2, nbins):
    refs = list(refs)
    q_ref = refs.pop(0)
    base_any = refs.pop(0)
    bias_any = refs.pop(0) if l2 else None
    out_v_ref, out_i_ref = refs.pop(0), refs.pop(0)
    ring = refs.pop(0)
    bias_ring = refs.pop(0) if l2 else None
    acc_ref, rv_ref, ri_ref = refs.pop(0), refs.pop(0), refs.pop(0)
    sems = refs.pop(0)
    bsems = refs.pop(0) if l2 else None

    b = q_ref.shape[0]
    shift = group.bit_length() - 1  # group is a power of two
    kmin = jnp.int32(-(2**31) + 1)
    ngroups = n_tiles // group
    rv_ref[:] = jnp.full_like(rv_ref, kmin)
    ri_ref[:] = jnp.zeros_like(ri_ref)

    def copy_in(t, slot):
        pltpu.make_async_copy(base_any.at[t], ring.at[slot], sems.at[slot]).start()
        if bias_any is not None:
            pltpu.make_async_copy(
                bias_any.at[t], bias_ring.at[slot], bsems.at[slot]).start()

    def wait_in(slot):
        pltpu.make_async_copy(ring.at[slot], ring.at[slot], sems.at[slot]).wait()
        if bias_any is not None:
            pltpu.make_async_copy(
                bias_ring.at[slot], bias_ring.at[slot], bsems.at[slot]).wait()

    for j in range(depth):
        copy_in(j, j)

    def tile_step(g, j, *, valid_cols=None, skip=False, refill=True):
        """One tile: wait DMA, score, pack, max-accumulate, refill slot.

        valid_cols (static int or None): statically-known partial tile —
        mask columns >= valid_cols.  skip: fully padded tile (DMA is still
        waited to keep the slot's semaphore balanced, compute is elided).
        """
        slot = j % depth
        wait_in(slot)
        if not skip:
            scores = jax.lax.dot_general(
                q_ref[:], ring[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if int_path else jnp.float32,
                precision=None if int_path else jax.lax.Precision.HIGHEST,
            )
            code = jnp.int32(group - 1 - j)  # ties resolve to the EARLIER tile
            if int_path:
                # key = (score - bias)*G + code; the bias row arrives
                # pre-shifted as bias*G - code so pack is shift + subtract.
                key = jax.lax.shift_left(scores, shift)
                key = key - bias_ring[slot] if l2 else key | code
            else:
                # f32: order-preserving i32 key, low bits ceded to the code
                # (<= 2^-18 relative score error; callers rescore).
                key = _monotone_key(scores)
                key = (key & jnp.int32(~(group - 1))) | code
            if valid_cols is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
                key = jnp.where(lane < valid_cols, key, kmin)
            acc_ref[:] = jnp.maximum(acc_ref[:], key)
        if refill:
            t_next = g * group + j + depth
            if isinstance(t_next, int):
                if t_next < n_tiles:
                    copy_in(t_next, slot)
            else:
                copy_in(t_next, slot)

    def group_merge(g):
        """Unpack the group's accumulator and fold into the id'd running max."""
        acc = acc_ref[:]
        code = acc & jnp.int32(group - 1)
        merge_key = acc ^ code  # low bits cleared: cross-group comparable
        j_rec = jnp.int32(group - 1) - code
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
        col = (g * group + j_rec) * tile_n + lane
        better = merge_key > rv_ref[:]  # strict: ties keep the earlier group
        rv_ref[:] = jnp.where(better, merge_key, rv_ref[:])
        ri_ref[:] = jnp.where(better, col, ri_ref[:])

    def full_group(g, carry):
        # All tiles valid, all refills in range (the last group is peeled).
        acc_ref[:] = jnp.full_like(acc_ref, kmin)
        for j in range(group):
            tile_step(g, j)
        group_merge(g)
        return carry

    if ngroups > 1:
        jax.lax.fori_loop(0, ngroups - 1, full_group, jnp.int32(0))

    # Peeled last group: per-tile validity is static, so padded tiles cost
    # only their semaphore wait and the partial tile masks on a constant.
    g_last = ngroups - 1
    acc_ref[:] = jnp.full_like(acc_ref, kmin)
    for j in range(group):
        t = g_last * group + j
        lo = t * tile_n
        # Tiles t+depth.. of this same group still need their DMAs issued
        # (the fori refills only reach the first `depth` tiles of it).
        refill = t + depth < n_tiles
        if lo >= n:
            tile_step(g_last, j, skip=True, refill=refill)
        elif lo + tile_n <= n:
            tile_step(g_last, j, refill=refill)
        else:
            tile_step(g_last, j, valid_cols=n - lo, refill=refill)
    group_merge(jnp.int32(g_last))

    # One exact top-k extraction per query block over the tile_n-bin pool.
    sel = rv_ref[:]
    if int_path:
        sel = jax.lax.shift_right_arithmetic(sel, shift)
    mv, mi = _extract_topk(sel, ri_ref[:], k, kmin)
    out_v_ref[:] = mv
    out_i_ref[:] = mi


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "tile_b", "group", "depth", "interpret"),
)
def fused_topk_accum(
    queries: jax.Array,
    base_tiles: jax.Array,
    n: int,
    k: int,
    tile_b: int = 256,
    group: int = 16,
    depth: int = 8,
    bias_rows: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Approximate-by-bins fused top-k with packed max accumulation.

    queries:    [B, D] int8 (int path) or f32/bf16 (f32 accumulation).
    base_tiles: [T, D, tile_n] from :func:`tile_base` with ``depth=group``
                (N padded to a tile_n*group multiple).
    n:          static valid row count.
    group:      tiles per accumulation group (power of two; low-bit code
                width of the packed key).  Must be a multiple of ``depth``
                (DMA ring slots).
    bias_rows:  int8-L2 mode — [T, 1, tile_n] int32 rows, pre-shifted
                ``round(norms/(2*sq*sb)) * group - code(t % group)`` (see
                :func:`l2_bias_rows`); selection keys become
                ``(dots - bias)*group + code``, a monotone map of the true
                L2 score under one global query scale.
    Returns (vals [B, k], ids [B, k] i32), best first.  vals are raw int32
    dot units on the int path (f32 keys with ``log2(group)`` truncated
    mantissa bits on the float path) — callers rescore for reporting.
    Per-bin top-1 loses a candidate when two true top-k collide in the same
    (column mod tile_n) bin: expected C(k,2)/tile_n per query.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_tiles, d, tile_n = base_tiles.shape
    if group & (group - 1) or group < 2:
        raise ValueError(f"group={group} must be a power of two >= 2")
    if group % depth:
        raise ValueError(f"group={group} must be a multiple of depth={depth}")
    if n_tiles % group:
        raise ValueError(f"n_tiles={n_tiles} must be a multiple of group={group}")
    b = queries.shape[0]
    if queries.shape[1] != d:
        raise ValueError(f"dim mismatch: queries D={queries.shape[1]} vs base D={d}")
    int_path = base_tiles.dtype == jnp.int8
    if int_path and queries.dtype != jnp.int8:
        raise ValueError("int8 base requires int8 queries")
    l2 = bias_rows is not None
    if l2 and not int_path:
        raise ValueError("bias_rows is the int8-L2 path; float bases fold "
                         "norms into an augmented dimension instead")

    # Deep selection pools (the kk=2k rescore path) inflate the compiler's
    # scoped-VMEM stack: _extract_topk's per-pass temporaries are
    # [tile_b, tile_n] i32 planes, and at tile_b=256/k=20 the stack
    # measured 21.07 MB against the 16 MB limit (compile failure on the
    # exact-contract brute config, B=8192).  Halving tile_b halves every
    # selection temporary; 128 stays inside the measured 128-256 perf band.
    if k > 12:
        tile_b = min(tile_b, 128)
    tile_b = min(-(-b // (32 if int_path else 8)) * (32 if int_path else 8), tile_b)
    pad_b = (-b) % tile_b
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    bp = b + pad_b

    in_specs = [
        pl.BlockSpec((tile_b, d), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs: list[jax.Array] = [queries, base_tiles]
    if l2:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(bias_rows)

    scratch = [pltpu.VMEM((depth, d, tile_n), base_tiles.dtype)]
    if l2:
        scratch.append(pltpu.VMEM((depth, 1, tile_n), jnp.int32))
    scratch += [
        pltpu.VMEM((tile_b, tile_n), jnp.int32),  # packed group accumulator
        pltpu.VMEM((tile_b, tile_n), jnp.int32),  # running keys
        pltpu.VMEM((tile_b, tile_n), jnp.int32),  # running global columns
        pltpu.SemaphoreType.DMA((depth,)),
    ]
    if l2:
        scratch.append(pltpu.SemaphoreType.DMA((depth,)))

    kernel = functools.partial(
        _accum_kernel, k=k, tile_n=tile_n, depth=depth, group=group, n=n,
        n_tiles=n_tiles, int_path=int_path, l2=l2, nbins=0,
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=(bp // tile_b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * n_tiles * tile_n,
            bytes_accessed=(bp // tile_b) * n_tiles * tile_n * d
            * base_tiles.dtype.itemsize + bp * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    if not int_path:
        vals = _key_to_f32(vals)
    return vals[:b], ids[:b]


def l2_bias_rows(norms_tiled: jax.Array, alpha, group: int) -> jax.Array:
    """Pre-shifted int32 bias rows for :func:`fused_topk_accum`'s L2 mode.

    norms_tiled: [T, 1, tile_n] f32 — ||b||^2 tiled like the base (zero
    padding must be overwritten with +inf-like fill by the caller via
    :func:`tile_norms`).  alpha: scalar 2*sq*sb.  The returned rows fold the
    per-tile code constant in, so the kernel's pack is shift + subtract:
    ``key = dots*G - rows = (dots - round(norms/alpha))*G + code``.
    """
    t = norms_tiled.shape[0]
    shift = group.bit_length() - 1
    code = (group - 1 - (jnp.arange(t, dtype=jnp.int32) % group))
    # Clamp BEFORE the int cast/shift: the padding fill (2^24 raw units)
    # divided by a small alpha otherwise overflows int32 and wraps
    # unpredictably.  The cap keeps every key within int32 while still
    # guaranteeing capped columns lose (key <= -2^30 + dots*G): only
    # real rows whose norms/alpha exceed the cap would mis-rank, and the
    # host search() guard rejects that scale regime up front.
    cap = jnp.float32((1 << 30) >> shift)
    bias = jnp.minimum(jnp.round(norms_tiled / alpha), cap).astype(jnp.int32)
    return jax.lax.shift_left(bias, shift) - code[:, None, None]


def tile_norms(norms: jax.Array, tile_n: int, group: int, fill: float = 2.0**24):
    """[N] f32 -> [T, 1, tile_n] tiled norms, padding filled with ``fill``
    (large positive: padded columns can never win an L2 selection)."""
    import numpy as _np

    norms = _np.asarray(norms, _np.float32)
    step = tile_n * group
    pad = (-norms.shape[0]) % step
    if pad:
        norms = _np.pad(norms, (0, pad), constant_values=fill)
    return norms.reshape(-1, 1, tile_n)
