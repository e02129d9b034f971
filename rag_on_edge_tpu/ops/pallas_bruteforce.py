"""Fused brute-force search kernel: score GEMM + running k-selection in VMEM.

The north-star replacement (BASELINE.json) for the reference's split
pipeline — NPU MatMul producing a full [B, N] score matrix
(``create_model.py:72-77``) followed by host-side heap top-k
(``main.cpp:36-71``).  One Pallas kernel streams base-vector tiles
HBM→VMEM (grid pipelining double-buffers the DMA — the analog of the AIE
design's ObjectFIFO ``fifo_depth=2``, ``whole_array.py:182``), computes the
score tile on the MXU, and folds it into a running per-query top-k held in
VMEM scratch: the [B, N] score matrix never exists in HBM.

Like the reference's ONNX model, the database is stored **transposed**
[D, N] (``create_model.py:61-77`` bakes docs as [D, N]); measured on
v5e this layout is ~1.5x faster than [N, D] for this kernel's GEMM.

Selection uses k max-and-mask passes (exact; ties to the lowest id),
matching :func:`rag_on_edge_tpu.ops.topk.iterative_topk`, gated by a
running-threshold skip so converged tiles cost only the GEMM + one
max-reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_topk_matmul", "auto_tile_n"]

def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def auto_tile_n(b: int, n: int, acc_bytes: int = 4, base_bytes: int = 1) -> int:
    """Largest tile_n (multiple of 512, ≤16384) whose score tile — plus the
    compiler's selection temporaries and the double-buffered base tiles —
    fits VMEM.  Measured on v5e (1M int8, B=2048, kk=20): score-tile
    budgets of 1→4→6 MB give 22K→64K→79K QPS and 8 MB fails to compile,
    so the budget sits at 6 MB for int8 bases and shrinks with the base
    element size (fatter base tiles need their share of VMEM)."""
    budget = {1: 6 << 20, 2: 3 << 20}.get(base_bytes, 2 << 20)
    t = budget // max(b * acc_bytes, 1)
    t = min(int(t), 16384, max(n, 512))
    return max(512, (t // 512) * 512)


def _extract_topk(scores, col_ids, k, fill):
    """k max-and-mask passes over scores [B, T]; returns (vals [B,k], ids [B,k]).

    All ops are VPU-friendly (compare/select/reduce — no sort, no argmax,
    no gather): the winner of each pass is recovered as the minimum id
    among positions equal to the row max, then masked out by id.  Requires
    ``col_ids`` unique per row (ties across equal scores resolve to the
    lowest id, matching ``iterative_topk``).
    """
    big = jnp.int32(2**30)
    vals, ids = [], []
    s = scores
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)  # [B, 1]
        at_max = s == m
        idx = jnp.min(jnp.where(at_max, col_ids, big), axis=1, keepdims=True)  # [B, 1]
        vals.append(m)
        ids.append(idx)
        s = jnp.where(col_ids == idx, fill, s)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(ids, axis=1)


def binned_top2(sc_ref, row0, tile_w, nbins, fill, depth: int = 2):
    """Top-``depth``-per-strided-bin partial reduction over a staged tile.

    sc_ref: VMEM ref [B, tile_w] (Mosaic cannot lane-slice computed values
    or reshape 2D→3D in registers, so chunks are ref slices); chunk i =
    cols [i·nbins, (i+1)·nbins), bin b = elementwise position b across
    chunks; row0 = global id of the tile's first column.  Returns
    (vals [B, depth·nbins], ids [B, depth·nbins]); per (row, bin) only the
    ``depth`` best members survive — callers recover statistically-lost
    near-duplicates with a k' > k pool + rescoring (the TPU-KNN
    PartialReduce trade, arXiv:2206.14286).  The strided bin assignment
    (bin = col % nbins) puts CONSECUTIVE rows in distinct bins, so the
    cluster-contiguous layout's near-duplicate neighbors rarely collide;
    raise ``depth`` when they still do (huge clusters, k close to
    depth·expected-per-bin).
    """
    b = sc_ref.shape[0]
    w = tile_w // nbins
    big = jnp.int32(2**30)
    base_iota = jax.lax.broadcasted_iota(jnp.int32, (b, nbins), 1)
    s_chunks = [sc_ref[:, i * nbins : (i + 1) * nbins] for i in range(w)]
    r_chunks = [base_iota + (row0 + i * nbins) for i in range(w)]

    def bin_top(chunks):
        bmax = chunks[0]
        for c in chunks[1:]:
            bmax = jnp.maximum(bmax, c)
        bid = jnp.full((b, nbins), big, jnp.int32)
        for sc, rc in zip(chunks, r_chunks):
            bid = jnp.minimum(bid, jnp.where(sc == bmax, rc, big))
        return bmax, bid

    vals, ids = [], []
    chunks = s_chunks
    for _ in range(depth):
        bmax, bid = bin_top(chunks)
        vals.append(bmax)
        ids.append(bid)
        chunks = [jnp.where(rc == bid, fill, sc) for sc, rc in zip(chunks, r_chunks)]
    return jnp.concatenate(vals, axis=1), jnp.concatenate(ids, axis=1)


def _kernel(q_ref, base_ref, *rest, k, n, tile_n, acc_dtype, nbins, dyn_n, l2):
    rest = list(rest)
    nv_ref = rest.pop(0) if dyn_n else None
    alpha_ref = bias_ref = None
    if l2:
        alpha_ref = rest.pop(0)
        bias_ref = rest.pop(0)
    out_vals_ref, out_ids_ref, sv_ref, si_ref, sc_ref = rest
    # grid = (B blocks, N tiles), N innermost: each query block walks every
    # base tile consecutively, so the running top-k scratch is private to
    # the current block and VMEM pressure is set by tile_b — not B.
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    # Selection domain: the raw accumulator, except the int8 L2 path where
    # the fractional norms bias forces f32 (alpha·dots − ‖b‖², exact in the
    # quantized model — the monotone per-row map of the L2 score).
    sel_dtype = jnp.float32 if l2 else acc_dtype
    fill = jnp.iinfo(sel_dtype).min if jnp.issubdtype(sel_dtype, jnp.integer) else sel_dtype(-jnp.inf)

    @pl.when(i == 0)
    def _init():
        sv_ref[:] = jnp.full_like(sv_ref, fill)
        si_ref[:] = jnp.zeros_like(si_ref)

    # Score tile on the MXU: [B, D] x [D, TILE_N] -> [B, TILE_N].
    scores = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
        precision=jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32 else None,
    )
    if l2:
        # alpha [tile_b, 1] = 2·sq_row·sb, bias [1, tile_n] = ‖b‖²: the
        # exact L2 score of the quantized model, selected in f32.
        scores = scores.astype(jnp.float32) * alpha_ref[:] - bias_ref[:]
    b = scores.shape[0]
    local_cols = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    global_cols = local_cols + i * tile_n
    # Mask the zero-padded tail of the last tile (dynamic bound when the
    # caller's valid-row count isn't static, e.g. per-shard tails).
    n_bound = nv_ref[0] if dyn_n else n
    scores = jnp.where(global_cols < n_bound, scores, fill)

    # Threshold skip: selection only runs when some query's tile max beats
    # its current k-th best.  Tiles arrive in ascending id order, so an
    # equal-score candidate in a later tile has a higher id and can never
    # displace a held entry (ties resolve to the lowest id) — strict `>`
    # keeps the exact path exact.
    improves = jnp.any(jnp.max(scores, axis=1) > sv_ref[:, k - 1])

    @pl.when(improves)
    def _select_and_merge():
        if nbins:
            sc_ref[:] = scores  # staged for ref-slice binning (dead on skip)
            tv, ti = binned_top2(sc_ref, i * tile_n, tile_n, nbins, fill)
        else:
            tv, ti = _extract_topk(scores, global_cols, k, fill)
        # Candidate ids are unique per row (scratch holds earlier tiles'
        # ids, the tile's ids are a fresh column range — except the id-0
        # init entries, which carry `fill` scores and can never win over a
        # real score), so selection keys directly on the id payload: no
        # gather needed.
        cand_v = jnp.concatenate([sv_ref[:], tv], axis=1)
        cand_i = jnp.concatenate([si_ref[:], ti], axis=1)
        mv, mi = _extract_topk(cand_v, cand_i, k, fill)
        sv_ref[:] = mv
        si_ref[:] = mi

    @pl.when(i == n_tiles - 1)
    def _emit():
        out_vals_ref[:] = sv_ref[:]
        out_ids_ref[:] = si_ref[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "nbins", "interpret")
)
def fused_topk_matmul(
    queries: jax.Array,
    base_t: jax.Array,
    k: int,
    tile_n: int | None = None,
    tile_b: int | None = None,
    nbins: int = 0,
    n_valid: jax.Array | None = None,
    alpha: jax.Array | None = None,
    bias: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Fused top-k inner-product search.

    queries: [B, D] — int8 or float (must match base's dtype family).
    base_t:  [D, N] — the **transposed** database; int8 (int32
             accumulation) or fp32/bf16 (f32 accumulation).
    n_valid: optional [1] int32 — dynamic count of valid leading columns
             (≤ N); the rest are masked.  For callers whose valid count
             isn't static, e.g. the padded tail shard of a sharded base.
    tile_b:  query-block rows (default ≤256): large batches are gridded
             over query blocks so the score tile stays wide — without
             this, tile_n ∝ 1/B collapses GEMM efficiency at B ≥ 1024.
    nbins:   0 → exact per-tile selection (k max-and-mask passes);
             >0 (e.g. 128) → top-2-per-bin partial reduction per tile —
             approximate, far cheaper for large B·k, pair with a k' > k
             candidate pool + rescoring.
    alpha/bias: int8 L2 mode (pass both) — select on
             ``dots·alpha[row] − bias[col]`` in f32, where alpha [B] =
             2·sq_row·sb and bias [N] = ‖b‖²: the L2-score analog of the
             IVF kernel's bias column (the norms' magnitude cannot live in
             int8, and the per-row query scale makes the bias
             row-dependent, so ranking happens in true-score units).
    Returns (vals [B, k] acc_dtype — f32 in L2 mode, ids [B, k] int32),
    best first, ties to the lowest id.  Requires N ≥ k.  N is padded
    internally to a tile multiple; B is padded to a tile_b multiple.
    """
    if (alpha is None) != (bias is None):
        raise ValueError("alpha and bias must be passed together")
    if interpret is None:
        interpret = _interpret_default()
    d, n = base_t.shape
    b = queries.shape[0]
    if queries.shape[1] != d:
        raise ValueError(f"dim mismatch: queries D={queries.shape[1]} vs base D={d}")
    if n < k:
        raise ValueError(f"k={k} > N={n}")
    int_path = base_t.dtype == jnp.int8
    acc_dtype = jnp.int32 if int_path else jnp.float32
    if int_path and queries.dtype != jnp.int8:
        raise ValueError("int8 base requires int8 queries")

    if tile_b is None:
        tile_b = min(-(-b // (32 if int_path else 8)) * (32 if int_path else 8), 256)
    pad_b = (-b) % tile_b
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    b_tiles = bp // tile_b

    if tile_n is None:
        tile_n = auto_tile_n(tile_b, n, 4, base_t.dtype.itemsize)
        if alpha is not None and tile_n > 512:
            # The L2 alpha/bias variant carries per-column f32 state
            # (bias tiles + the true-score conversion temporaries) on top
            # of the score tile; at the exact-budget tile it overflows
            # scoped VMEM by ~0.3 MB (measured v5e, B=8192 int8 l2 exact:
            # 16.29M vs the 16M limit) — one 512-column step clears it.
            tile_n -= 512
    if nbins and tile_n % nbins:
        raise ValueError(f"tile_n={tile_n} must be a multiple of nbins={nbins}")
    pad_n = (-n) % tile_n
    if pad_n:
        base_t = jnp.pad(base_t, ((0, 0), (0, pad_n)))
    n_tiles = (n + pad_n) // tile_n

    l2 = bias is not None
    sel_dtype = jnp.float32 if l2 else acc_dtype

    in_specs = [
        pl.BlockSpec((tile_b, d), lambda ib, i: (ib, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, tile_n), lambda ib, i: (0, i), memory_space=pltpu.VMEM),
    ]
    inputs = [queries, base_t]
    if n_valid is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(n_valid.astype(jnp.int32).reshape(1))
    if l2:
        a = alpha.astype(jnp.float32).reshape(-1, 1)
        if pad_b:
            a = jnp.pad(a, ((0, pad_b), (0, 0)), constant_values=1.0)
        bi = bias.astype(jnp.float32).reshape(1, -1)
        if pad_n:
            bi = jnp.pad(bi, ((0, 0), (0, pad_n)))
        in_specs.append(
            pl.BlockSpec((tile_b, 1), lambda ib, i: (ib, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, tile_n), lambda ib, i: (0, i), memory_space=pltpu.VMEM)
        )
        inputs.extend([a, bi])

    kernel = functools.partial(
        _kernel, k=k, n=n, tile_n=tile_n, acc_dtype=acc_dtype, nbins=nbins,
        dyn_n=n_valid is not None, l2=l2,
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=(b_tiles, n_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda ib, i: (ib, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda ib, i: (ib, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), sel_dtype),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, k), sel_dtype),
            pltpu.VMEM((tile_b, k), jnp.int32),
            pltpu.VMEM((tile_b, tile_n if nbins else 8), sel_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * (n + pad_n),
            bytes_accessed=b_tiles * (n + pad_n) * d * base_t.dtype.itemsize + bp * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return vals[:b], ids[:b]
