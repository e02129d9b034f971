"""Fused brute-force search with a MANUAL multi-DMA input pipeline.

The round-1 kernel (:mod:`rag_on_edge_tpu.ops.pallas_bruteforce`) relies on
the automatic Pallas grid pipeline, which keeps at most one input-window
DMA in flight and is therefore DMA-LATENCY-bound: measured ~30-70 GB/s
effective HBM streaming regardless of tile shape (hw_probe pallas_stream).
The same walk with eight concurrent ``pltpu.make_async_copy`` transfers
reaches 839 GB/s — HBM speed-of-light on this chip (hw_probe pallas_dma).

This kernel therefore keeps the database in HBM (`pl.ANY`), block-tiled as
[T, D, tile_n] (one contiguous transfer per tile), and streams it through
a ``depth``-deep VMEM ring with explicit async copies: while tile t is
scored on the MXU and folded into the running top-k, tiles t+1..t+depth-1
are in flight.  Selection (binned partial reduction + max-and-mask merge)
is shared with the round-1 kernel.

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

from rag_on_edge_tpu.ops.pallas_bruteforce import _extract_topk, binned_top2

__all__ = ["fused_topk_matmul_tiled", "tile_base"]


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


def _kernel(*refs, k, tile_n, depth, n, n_tiles, acc_dtype, nbins, l2, dyn_n):
    refs = list(refs)
    q_ref = refs.pop(0)
    base_any = refs.pop(0)
    nv_ref = refs.pop(0) if dyn_n else None
    alpha_ref = refs.pop(0) if l2 else None
    bias_any = refs.pop(0) if l2 else None
    out_v_ref, out_i_ref = refs.pop(0), refs.pop(0)
    ring = refs.pop(0)
    bias_ring = refs.pop(0) if l2 else None
    sv_ref, si_ref, sc_ref = refs.pop(0), refs.pop(0), refs.pop(0)
    sems = refs.pop(0)
    bsems = refs.pop(0) if l2 else None

    sel_dtype = jnp.float32 if l2 else acc_dtype
    fill = (jnp.iinfo(sel_dtype).min if jnp.issubdtype(sel_dtype, jnp.integer)
            else sel_dtype(-jnp.inf))
    sv_ref[:] = jnp.full_like(sv_ref, fill)
    si_ref[:] = jnp.zeros_like(si_ref)
    n_bound = nv_ref[0] if dyn_n else n
    b = q_ref.shape[0]
    ngroups = n_tiles // depth

    def copy_in(t, slot):
        c = pltpu.make_async_copy(base_any.at[t], ring.at[slot], sems.at[slot])
        if bias_any is None:
            return (c,)
        return (c, pltpu.make_async_copy(
            bias_any.at[t], bias_ring.at[slot], bsems.at[slot]))

    # Warm-up: fill the ring (depth tiles in flight before any compute).
    for j in range(depth):
        for c in copy_in(j, j):
            c.start()

    def group(g, carry):
        for j in range(depth):  # python-unrolled: static ring slots
            t = g * depth + j
            for c in copy_in(t, j):
                c.wait()
            scores = jax.lax.dot_general(
                q_ref[:], ring[j], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
                precision=jax.lax.Precision.HIGHEST
                if q_ref.dtype == jnp.float32 else None,
            )
            if l2:
                scores = scores.astype(jnp.float32) * alpha_ref[:] - bias_ring[j]
            cols = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1) + t * tile_n
            scores = jnp.where(cols < n_bound, scores, fill)
            if nbins:
                sc_ref[:] = scores

            improves = jnp.any(jnp.max(scores, axis=1) > sv_ref[:, k - 1])

            @pl.when(improves)
            def _select():
                if nbins:
                    tv, ti = binned_top2(sc_ref, t * tile_n, tile_n, nbins, fill)
                else:
                    tv, ti = _extract_topk(scores, cols, k, fill)
                cand_v = jnp.concatenate([sv_ref[:], tv], axis=1)
                cand_i = jnp.concatenate([si_ref[:], ti], axis=1)
                mv, mi = _extract_topk(cand_v, cand_i, k, fill)
                sv_ref[:] = mv
                si_ref[:] = mi

            # Refill the slot just consumed with the next group's tile.
            @pl.when(g + 1 < ngroups)
            def _refill():
                for c in copy_in(t + depth, j):
                    c.start()
        return carry

    jax.lax.fori_loop(0, ngroups, group, jnp.int32(0))
    out_v_ref[:] = sv_ref[:]
    out_i_ref[:] = si_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_b", "nbins", "depth", "interpret"),
)
def fused_topk_matmul_tiled(
    queries: jax.Array,
    base_tiles: jax.Array,
    n: int | jax.Array,
    k: int,
    tile_b: int = 256,
    nbins: int = 0,
    depth: int = 8,
    alpha: jax.Array | None = None,
    bias_tiles: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Fused top-k inner-product search over a block-tiled database.

    queries:    [B, D] int8 / f32 / bf16 (same family as base_tiles).
    base_tiles: [T, D, tile_n] from :func:`tile_base` (T % depth == 0).
    n:          valid row count (static int or traced scalar) — padded
                tile columns are masked.
    alpha/bias_tiles: int8-L2 mode — select on ``dots*alpha[row] −
                bias[col]`` in f32; bias_tiles is [T, 1, tile_n] f32.
    Returns (vals [B, k], ids [B, k] i32), best first, ties to lowest id.
    """
    if (alpha is None) != (bias_tiles is None):
        raise ValueError("alpha and bias_tiles must be passed together")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_tiles, d, tile_n = base_tiles.shape
    if n_tiles % depth:
        raise ValueError(f"n_tiles={n_tiles} must be a multiple of depth={depth}")
    b = queries.shape[0]
    if queries.shape[1] != d:
        raise ValueError(f"dim mismatch: queries D={queries.shape[1]} vs base D={d}")
    int_path = base_tiles.dtype == jnp.int8
    acc_dtype = jnp.int32 if int_path else jnp.float32
    if int_path and queries.dtype != jnp.int8:
        raise ValueError("int8 base requires int8 queries")
    if nbins and tile_n % nbins:
        raise ValueError(f"tile_n={tile_n} must be a multiple of nbins={nbins}")

    tile_b = min(-(-b // (32 if int_path else 8)) * (32 if int_path else 8), tile_b)
    pad_b = (-b) % tile_b
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    b_tiles = bp // tile_b

    l2 = bias_tiles is not None
    sel_dtype = jnp.float32 if l2 else acc_dtype
    dyn_n = not isinstance(n, int)

    in_specs = [
        pl.BlockSpec((tile_b, d), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs: list[jax.Array] = [queries, base_tiles]
    if dyn_n:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(n, jnp.int32).reshape(1))
    if l2:
        a = alpha.astype(jnp.float32).reshape(-1, 1)
        if pad_b:
            a = jnp.pad(a, ((0, pad_b), (0, 0)), constant_values=1.0)
        in_specs.append(
            pl.BlockSpec((tile_b, 1), lambda ib: (ib, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.extend([a, bias_tiles])

    scratch = [pltpu.VMEM((depth, d, tile_n), base_tiles.dtype)]
    if l2:
        scratch.append(pltpu.VMEM((depth, 1, tile_n), jnp.float32))
    scratch += [
        pltpu.VMEM((tile_b, k), sel_dtype),
        pltpu.VMEM((tile_b, k), jnp.int32),
        pltpu.VMEM((tile_b, tile_n if nbins else 8), sel_dtype),
        pltpu.SemaphoreType.DMA((depth,)),
    ]
    if l2:
        scratch.append(pltpu.SemaphoreType.DMA((depth,)))

    kernel = functools.partial(
        _kernel, k=k, tile_n=tile_n, depth=depth,
        n=n if not dyn_n else 0, n_tiles=n_tiles, acc_dtype=acc_dtype,
        nbins=nbins, l2=l2, dyn_n=dyn_n,
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=(b_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), sel_dtype),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * n_tiles * tile_n,
            bytes_accessed=b_tiles * n_tiles * tile_n * d
            * base_tiles.dtype.itemsize + bp * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return vals[:b], ids[:b]
