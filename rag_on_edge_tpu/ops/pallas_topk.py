"""Fused wide-row top-k: k max-and-mask passes over a VMEM-resident tile.

XLA's iterative top-k (ops/topk.iterative_topk) materializes the [B, W]
score matrix to HBM on every pass — at the planes-join shape ([32K, 1024]
i32, k=20) that is ~8 GB of traffic and 24.6 ms measured on chip, 4x the
fine-scan kernel it post-processes.  ``lax.top_k`` (sort) and
``approx_max_k`` measured 11.8 / 8.9 ms on the same shape.  This kernel
tiles rows, keeps each [tile_b, W] tile in VMEM across ALL k passes
(reads the matrix exactly once: 134 MB → ~0.2 ms of HBM time), and runs
the same compare/select/reduce passes as ``_extract_topk``.

Rebuild of the reference's host-side heap selection
(``main.cpp:36-57``, ``IVFIndex.cpp:449-496``) at the shape where the
XLA fallbacks stop being free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rag_on_edge_tpu.ops.pallas_bruteforce import _extract_topk

__all__ = ["fused_topk"]


def _kernel(x_ref, out_v_ref, out_i_ref, *, k, fill):
    x = x_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    v, i = _extract_topk(x, col, k, fill)
    out_v_ref[:] = v
    out_i_ref[:] = i


@functools.partial(jax.jit, static_argnames=("k", "tile_b", "interpret"))
def fused_topk(x: jax.Array, k: int, tile_b: int = 256,
               interpret: bool | None = None):
    """Exact top-k along axis 1 of ``x`` [B, W] (int32 or float32).

    Returns (vals [B, k], idx [B, k] int32 positions), best first; ties
    resolve to the lowest position (``iterative_topk`` semantics).  Rows
    are tiled ``tile_b`` at a time; W must be a multiple of 128 (lane
    width).  Rows are padded internally — callers never see the padding.
    """
    b, w = x.shape
    if w % 128 or w < 128:
        raise ValueError(f"W={w} must be a positive multiple of 128")
    if k > w:
        raise ValueError(f"k={k} > W={w}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # Python scalars, not jnp values: a traced fill would be captured as a
    # kernel constant (pallas_call rejects those).
    if jnp.issubdtype(x.dtype, jnp.integer):
        fill = -(2**31)
        x = x.astype(jnp.int32)
    else:
        fill = float("-inf")
        x = x.astype(jnp.float32)
    # Scoped-VMEM budget: the selection temporaries cost ~4x the live tile
    # (chip-measured: [256, 4096] i32 hit a 16.98M/16M scoped OOM), so cap
    # the row tile at ~3 MB of tile bytes and keep it sublane-aligned.
    tile_b = min(tile_b, max(8, (3 << 20) // (w * 4) // 8 * 8))
    tile_b = tile_b if b >= tile_b else -(-b // 8) * 8
    pad = (-b) % tile_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
    bp = b + pad
    vals, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, fill=fill),
        grid=(bp // tile_b,),
        in_specs=[pl.BlockSpec((tile_b, w), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), x.dtype),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        interpret=interpret,
    )(x)
    return vals[:b], idx[:b]
