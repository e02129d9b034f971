"""Exact brute-force k-NN index on a single TPU chip.

This is the TPU-native replacement for the reference's entire brute-force
vertical slice: the database-baked ONNX MatMul model
(``qidk_bruteforce/prepare/create_model.py:40-108``), the ``QnnRunner``
device-runner abstraction (``QnnRunner.cpp``), and the host-side uint8 heap
top-k (``main.cpp:36-71``) collapse into one jitted score-GEMM +
on-device k-selection.  Like ``QnnRunner``, the index owns the compiled
executables (one per (batch, k) signature, cached by jit) and the on-device
database; unlike it, selection never leaves the device.

Precision paths:
- ``"fp32"`` — exact float32 (recall oracle on-device).
- ``"bf16"`` — bfloat16 GEMM inputs, f32 accumulation (MXU native).
- ``"int8"`` — symmetric int8 GEMM with int32 accumulation; raw-int
  ordering top-k (the ``executeRaw`` monotonicity trick,
  ``QnnRunner.h:28-29``) with dequantized scores only for reporting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.ops import distances, quantize, topk
from rag_on_edge_tpu.ops.pallas_bruteforce import fused_topk_matmul
from rag_on_edge_tpu.ops import pallas_bruteforce_dma as bf_dma

__all__ = ["BruteForceIndex"]

_SELECT_FNS = {
    "exact": lambda s, k: topk.topk(s, k),
    "two_stage": lambda s, k: topk.two_stage_topk(s, k),
    "iterative": lambda s, k: topk.iterative_topk(s, k),
    "auto": lambda s, k: (
        topk.iterative_topk(s, k) if k <= 32 else topk.two_stage_topk(s, k)
    ),
    "approx": lambda s, k: topk.approx_topk(s, k),
}


class BruteForceIndex:
    """Exact (or int8-quantized) brute-force search over a base matrix.

    Parameters
    ----------
    base : [N, D] float32 database vectors.
    metric : "ip" (inner product) or "l2".
    dtype : "fp32" | "bf16" | "int8" compute path.
    select : "auto" | "exact" | "two_stage" | "iterative" | "approx"
        k-selection strategy ("auto": exact — iterative argmax passes for
        small k, blocked two-stage otherwise).  XLA engine only.
    engine : "auto" | "xla" | "pallas" | "accum".  "xla" materializes the
        [B, N] score matrix then selects — fine while it fits comfortably;
        "pallas" is the fused streaming kernel (the score matrix never
        reaches HBM) — exact, but its per-tile top-k merges dominate
        (measured ~12 of 13.7 µs/tile); "accum" is the manual-DMA-ring
        packed-accumulation kernel (ops/pallas_bruteforce_dma.py) —
        ~4x faster (489K vs 114K QPS on SIFT-1M int8 B=8192),
        approximate by per-(column mod tile_n) bins: expected loss
        C(k,2)/tile_n per query (~0.2% at k=10).  The collision loss is
        NOT recoverable by rescoring at any pool depth — a collided item
        is dropped before the selection pool forms (measured flat 0.9980
        across rescore_depth 2/4/8, RESULTS.md pool-depth study); the
        exact contract is ``engine="pallas"``.  "auto" picks accum once
        N ≥ 100K.
    rescore : select 2k candidates in the engine's fast domain and
        recompute their exact fp32 scores before the final top-k —
        restores exact recall at the cost of keeping an fp32 copy of the
        base and a [B, 2k, D] gather per batch.  Default (None): ON for
        the bin-approximate accum engine (exactness is this class's
        contract — the raw accum ranking loses ~C(k,2)/tile_n of true
        top-k entries and truncates f32 scores to ~2^-18), OFF for the
        exact engines; pass False explicitly for the raw accum numbers.
        Applies to every dtype including fp32 (the approximation is the
        engine's, not the dtype's).
    rescore_depth : rescore pool = ``rescore_depth * k`` candidates (min
        k+1, capped at N).  Leave at 2 (default): the pool-depth study
        (RESULTS.md) measured recall@10 FLAT at 0.9980 across depths
        2/4/8 on SIFT-1M int8 B=8192 (444K → 275K QPS) — the residual
        loss is accum bin collisions, which happen before the pool
        forms — and depth 16's selection temporaries exceed scoped VMEM
        (compile failure).  The knob exists for corpora whose int8-vs-
        fp32 rank disagreement (the loss mode depth CAN fix) dominates
        collisions; SIFT is not one.
    device : optional jax.Device to place the index on.
    """

    def __init__(
        self,
        base: np.ndarray,
        metric: str = "ip",
        dtype: str = "bf16",
        select: str = "auto",
        engine: str = "auto",
        rescore: bool | None = None,
        rescore_depth: int = 2,
        device: jax.Device | None = None,
    ):
        if metric not in ("ip", "l2"):
            raise ValueError(f"unknown metric {metric!r}")
        if dtype not in ("fp32", "bf16", "int8"):
            raise ValueError(f"unknown dtype {dtype!r}")
        if select not in _SELECT_FNS:
            raise ValueError(f"unknown select {select!r}")
        if engine not in ("auto", "xla", "pallas", "accum"):
            raise ValueError(f"unknown engine {engine!r}")
        if engine == "auto":
            engine = "accum" if base.shape[0] >= 100_000 else "xla"
            if engine == "accum" and dtype == "int8" and base.shape[1] > 4096:
                # int32 packed-key headroom: |q.b| <= d*127^2 must clear the
                # 5-bit group-code shift; wider vectors fall back to the
                # exact fused kernel (see _search_accum's guard).
                engine = "pallas"
        if engine == "accum" and dtype == "int8" and base.shape[1] > 4096:
            raise ValueError(
                "engine='accum' int8 path supports dim <= 4096 (int32 "
                "packed-key headroom: |q.b| <= d*127^2 must clear the "
                f"group-code shift); got dim={base.shape[1]} — use "
                "engine='pallas'"
            )

        self.metric = metric
        self.dtype = dtype
        self.select = select
        self.engine = engine
        # Exactness contract: the accum engine's binned selection is
        # approximate, so it rescores by default (every dtype — the
        # approximation is the engine's, not the dtype's).
        self.rescore = engine == "accum" if rescore is None else bool(rescore)
        if rescore_depth < 1:
            raise ValueError(f"rescore_depth must be >= 1, got {rescore_depth}")
        self.rescore_depth = int(rescore_depth)
        self.n, self.dim = base.shape
        self._device = device

        # Index state is kept in a dict and passed to the jitted search as an
        # ARGUMENT (never a closure): jit inlines captured arrays as HLO
        # constants, which bloats every program with the whole database.
        put = functools.partial(jax.device_put, device=device)
        base_f32 = jnp.asarray(base, dtype=jnp.float32)
        arrays: dict[str, jax.Array] = {}
        if self.rescore:
            arrays["base_f32"] = put(base_f32)
            if metric == "l2":
                arrays["rescore_norms"] = put(distances.base_norms_sq(base_f32))
        # Accum-engine tiling: wide tiles amortize per-tile cost; the
        # group is the packed key's low-bit code width (measured best at
        # 32 on 1M).  Shrink both for small bases so the tile_n*group
        # padding granule stays bounded.
        self._acc_tile_n = 2048 if self.n >= 128_000 else 512
        self._acc_group = 32 if self.n >= 512_000 else 8
        self._acc_depth = 8 if dtype == "int8" else 4
        if dtype == "int8":
            qt = quantize.quantize_int8(base_f32)
            arrays["base_scale"] = put(qt.scale)
            if engine == "accum":
                tiles, _ = bf_dma.tile_base(
                    np.ascontiguousarray(np.asarray(qt.values).T),
                    self._acc_tile_n, self._acc_group,
                )
                arrays["base_tiles"] = put(jnp.asarray(tiles))
                if metric == "l2":
                    norms_np = np.asarray(distances.base_norms_sq(base_f32))
                    self._max_norm = float(norms_np.max()) if norms_np.size else 0.0
                    arrays["norms_tiled"] = put(jnp.asarray(bf_dma.tile_norms(
                        norms_np, self._acc_tile_n, self._acc_group,
                    )))
            elif engine == "pallas":
                arrays["base_t"] = put(qt.values.T)
            else:
                arrays["base"] = put(qt.values)
            if metric == "l2" and engine != "accum":
                # Norms bias: l2 = alpha·dots − ‖b‖² with alpha = 2·sq·sb
                # (the IVF int8 L2 scheme — the norms' magnitude cannot
                # ride inside int8, so ranking happens in f32 true-score
                # units with a per-column bias).
                arrays["base_norms"] = put(distances.base_norms_sq(base_f32))
        elif engine == "accum":
            # Float accum path: L2 folds in via augmentation like the
            # pallas engine; selection keys are order-preserving i32 casts
            # of the f32 scores (<= 2^-18 relative truncation).
            bt = base_f32.T
            if metric == "l2":
                bt = jnp.concatenate(
                    [bt, -0.5 * distances.base_norms_sq(base_f32)[None, :]], axis=0
                )
            bt = bt.astype(jnp.bfloat16) if dtype == "bf16" else bt
            tiles, _ = bf_dma.tile_base(
                np.ascontiguousarray(np.asarray(bt)),
                self._acc_tile_n, self._acc_group,
            )
            arrays["base_tiles"] = put(jnp.asarray(tiles))
        elif engine == "pallas":
            # Fused kernel computes inner products only; L2 ranking folds in
            # via augmentation: q' = [q, 1], b' = [b, -‖b‖²/2] gives
            # q'·b' = q·b - ‖b‖²/2, a monotone map of the L2 score.
            bt = base_f32.T
            if metric == "l2":
                bt = jnp.concatenate(
                    [bt, -0.5 * distances.base_norms_sq(base_f32)[None, :]], axis=0
                )
            arrays["base_t"] = put(bt.astype(jnp.bfloat16) if dtype == "bf16" else bt)
        else:
            arrays["base"] = put(
                base_f32.astype(jnp.bfloat16) if dtype == "bf16" else base_f32
            )
            if metric == "l2":
                arrays["base_norms"] = put(distances.base_norms_sq(base_f32))
        self._arrays = arrays
        self._search_jit = jax.jit(self._search_impl, static_argnames=("k",))
        self._stream_jit = jax.jit(
            lambda arrays, qq, k: jax.lax.map(
                lambda q: self._search_impl(arrays, q, k), qq
            ),
            static_argnames=("k",),
        )

    # ------------------------------------------------------------------ impl

    def _search_pallas(self, arrays, queries: jax.Array, k: int):
        # With rescoring downstream, the cheap binned tile selection is
        # safe; without it the kernel stays exact.
        nbins = 128 if self.rescore else 0
        if self.dtype == "int8":
            q = quantize.quantize_int8(queries, per_row=True)
            if self.metric == "l2":
                alpha = 2.0 * q.scale.reshape(-1) * arrays["base_scale"]
                return fused_topk_matmul(
                    q.values, arrays["base_t"], k, nbins=nbins,
                    alpha=alpha, bias=arrays["base_norms"],
                )  # vals already in true 2q·b − ‖b‖² units (f32)
            vals_i32, ids = fused_topk_matmul(q.values, arrays["base_t"], k, nbins=nbins)
            vals = quantize.dequantize(vals_i32, q.scale, arrays["base_scale"])
            return vals, ids
        if self.metric == "l2":
            queries = jnp.concatenate(
                [queries, jnp.ones((queries.shape[0], 1), queries.dtype)], axis=1
            )
        q = queries.astype(jnp.bfloat16) if self.dtype == "bf16" else queries
        vals, ids = fused_topk_matmul(q, arrays["base_t"], k, nbins=nbins)
        if self.metric == "l2":
            vals = 2.0 * vals  # back to the 2q·b - ‖b‖² convention
        return vals, ids

    def _search_accum(self, arrays, queries: jax.Array, k: int):
        """Manual-DMA packed-accumulation engine (ops/pallas_bruteforce_dma).

        int8-L2 CAUTION: the integer bias ``round(norms/alpha)`` with
        ``alpha = 2*sq*sb`` grows as the query scale sq SHRINKS — queries
        much smaller in magnitude than the base can overflow the packed
        key at runtime (not statically checkable; the host ``search()``
        wrapper validates it, ``search_device`` callers are on their own).
        With the default rescore the damage is bounded to candidate-set
        recall, never wrong scores."""
        tiles = arrays["base_tiles"]
        g, d = self._acc_group, self._acc_depth
        if k > self._acc_tile_n:
            # The accumulator has tile_n candidate bins; a selection pool
            # beyond that repeats bins -> duplicate ids, dropped truth.
            raise ValueError(
                f"engine='accum' supports k (and the 2k rescore pool) up "
                f"to its {self._acc_tile_n} selection bins; got pool {k} — "
                "use engine='pallas' or 'xla' for very deep top-k"
            )
        if self.dtype == "int8":
            if self.metric == "l2":
                # One global query scale: the integer bias round(norms/alpha)
                # must be row-independent for the packed key to stay a
                # monotone map of the true L2 score.
                q = quantize.quantize_int8(queries, per_row=False)
                alpha = 2.0 * q.scale * arrays["base_scale"]
                bias_rows = bf_dma.l2_bias_rows(arrays["norms_tiled"], alpha, g)
                vals, ids = bf_dma.fused_topk_accum(
                    q.values, tiles, self.n, k, group=g, depth=d,
                    bias_rows=bias_rows,
                )
                # (dots - round(norms/alpha))*alpha ~ 2q·b − ‖b‖², within
                # alpha/2 per column of the pallas engine's exact-int value.
                return vals.astype(jnp.float32) * alpha, ids
            q = quantize.quantize_int8(queries, per_row=True)
            vals, ids = bf_dma.fused_topk_accum(
                q.values, tiles, self.n, k, group=g, depth=d
            )
            return quantize.dequantize(vals, q.scale, arrays["base_scale"]), ids
        if self.metric == "l2":
            queries = jnp.concatenate(
                [queries, jnp.ones((queries.shape[0], 1), queries.dtype)], axis=1
            )
        q = queries.astype(jnp.bfloat16) if self.dtype == "bf16" else queries
        vals, ids = bf_dma.fused_topk_accum(q, tiles, self.n, k, group=g, depth=d)
        if self.metric == "l2":
            vals = 2.0 * vals
        return vals, ids

    def _rescore_exact(self, arrays, queries: jax.Array, cand_ids: jax.Array, k: int):
        """Recompute exact fp32 scores for the candidate set and re-select k.
        cand_ids: [B, k'] (k' ≥ k) from the quantized selection."""
        cand = arrays["base_f32"][cand_ids]  # [B, k', D]
        scores = jnp.einsum(
            "bcd,bd->bc", cand, queries,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.metric == "l2":
            scores = 2.0 * scores - arrays["rescore_norms"][cand_ids]
        vals, sel = jax.lax.top_k(scores, k)
        return vals, jnp.take_along_axis(cand_ids, sel, axis=1)

    def _search_impl(self, arrays, queries: jax.Array, k: int):
        """Device-side search: queries [B, D] f32 → (scores [B,k] f32, ids [B,k] i32)."""
        kq = min(max(self.rescore_depth * k, k + 1), self.n) if self.rescore else k
        if self.engine in ("pallas", "accum"):
            fn = (self._search_pallas if self.engine == "pallas"
                  else self._search_accum)
            vals, ids = fn(arrays, queries, kq)
            if self.rescore:
                vals, ids = self._rescore_exact(arrays, queries, ids, k)
            return vals.astype(jnp.float32), ids.astype(jnp.int32)
        sel = _SELECT_FNS[self.select]
        if self.dtype == "int8":
            q = quantize.quantize_int8(queries, per_row=True)
            raw = distances.score_matrix_int8(q.values, arrays["base"])
            if self.metric == "l2":
                alpha = (2.0 * q.scale.reshape(-1) * arrays["base_scale"])
                scores = raw.astype(jnp.float32) * alpha[:, None] - arrays["base_norms"][None, :]
                vals, ids = sel(scores, kq)
            else:
                vals_i32, ids = sel(raw, kq)
                vals = quantize.dequantize(vals_i32, q.scale, arrays["base_scale"])
            if self.rescore:
                vals, ids = self._rescore_exact(arrays, queries, ids, k)
            return vals, ids.astype(jnp.int32)
        compute_dtype = jnp.bfloat16 if self.dtype == "bf16" else None
        scores = distances.score_matrix(
            queries,
            arrays["base"],
            metric=self.metric,
            base_norms=arrays.get("base_norms"),
            compute_dtype=compute_dtype,
        )
        vals, ids = sel(scores, kq)
        if self.rescore:
            vals, ids = self._rescore_exact(arrays, queries, ids, k)
        return vals, ids.astype(jnp.int32)

    # ------------------------------------------------------------------ API

    def memory_report(self) -> dict[str, int]:
        """Device bytes per index array + TOTAL (utils.metrics.memory_report)."""
        from rag_on_edge_tpu.utils.metrics import memory_report

        return memory_report(self._arrays)

    def search_device(self, queries: jax.Array, k: int):
        """On-device search; inputs/outputs stay device arrays (the hot path)."""
        return self._search_jit(self._arrays, queries, k)

    def search_stream_device(self, query_stream: jax.Array, k: int):
        """Stream mode: one dispatch processes a stack of micro-batches
        [M, B, D] → (scores [M, B, k], ids [M, B, k]).

        A serving queue drains M waiting batches per device call,
        amortizing per-dispatch overhead (measured ~0.3 ms on this
        tunnelled v5e vs ~35 µs device time per batch-32 search).
        """
        return self._stream_jit(self._arrays, query_stream, k)

    def search(self, queries: np.ndarray, k: int, batch_size: int | None = None):
        """Host API: numpy queries [Q, D] → (ids [Q, k] i32, scores [Q, k] f32).

        Queries are processed in fixed-size batches (zero-padded like the
        reference's batched path, ``main.cpp:199-211``) so jit compiles one
        executable per batch size.
        """
        queries = np.asarray(queries, dtype=np.float32)
        nq = queries.shape[0]
        if batch_size is not None and batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        if nq == 0:
            return (np.empty((0, k), np.int32), np.empty((0, k), np.float32))
        if self.engine == "accum" and self.dtype == "int8" and self.metric == "l2":
            # Runtime packed-key headroom (see _search_accum): the bias
            # round(norms/alpha) with alpha = 2*sq*sb explodes when query
            # magnitudes are far below the base's.  Checkable here because
            # the queries are on the host.
            sq = max(float(np.abs(queries).max()), 1e-12) / 127.0
            alpha = 2.0 * sq * float(self._arrays["base_scale"])
            shift = self._acc_group.bit_length() - 1
            # Real rows only: l2_bias_rows clamps padding safely, but a
            # REAL row's bias hitting the clamp would mis-rank it upward.
            max_key = (self.dim * 127 * 127 + self._max_norm / alpha) * (1 << shift)
            if max_key >= 2.0**31:
                raise ValueError(
                    "engine='accum' int8-L2 packed keys would overflow "
                    f"int32 for this query/base scale ratio (max|q|="
                    f"{np.abs(queries).max():.3g} vs base scale "
                    f"{float(self._arrays['base_scale']):.3g}) — use "
                    "engine='pallas' (exact norms-bias kernel) or rescale"
                )
        bs = batch_size or nq
        ids_out = np.empty((nq, k), dtype=np.int32)
        scores_out = np.empty((nq, k), dtype=np.float32)
        for start in range(0, nq, bs):
            chunk = queries[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            vals, ids = self.search_device(jnp.asarray(chunk), k)
            got = bs - pad
            ids_out[start : start + got] = np.asarray(ids)[:got]
            scores_out[start : start + got] = np.asarray(vals)[:got]
        return ids_out, scores_out

    def compile(self, batch_size: int, k: int) -> None:
        """Ahead-of-time compile the (batch_size, k) executable (warmup)."""
        dummy = jnp.zeros((batch_size, self.dim), dtype=jnp.float32)
        jax.block_until_ready(self.search_device(dummy, k))
