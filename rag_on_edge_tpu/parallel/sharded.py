"""Multi-chip sharded search: database sharding + all-gather top-k merge.

The scaling design the reference could not express (its largest parallel
structure is the 4×4 AIE spatial GEMM, ``whole_array.py`` — SURVEY §2.6
maps it onto a TPU mesh):

- **Brute force**: base-vector rows shard across the mesh axis (the analog
  of N-sharding across AIE columns, ``whole_array.py:167-170, 308-348``);
  queries are replicated (the A-broadcast); each chip computes its
  [B, N/S] score tile and a local top-k; a tiled ``all_gather`` over ICI
  collects k·S candidates per query and a final top-k re-selects — the
  "join" of the ObjectFIFO design, done as one XLA collective.

- **IVF**: whole clusters (contiguous slabs of the reordered layout) are
  assigned to shards; the coarse centroid GEMM runs replicated (it is tiny)
  and each shard fine-scans only the probed clusters it owns (non-owned
  probes become size-0 sentinels that mask out), then the same all-gather
  top-k merge.

Everything is a single jitted ``jax.shard_map`` program over a
``jax.sharding.Mesh``; collectives ride ICI (SURVEY §2.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rag_on_edge_tpu.models.ivf import (
    IVFIndex, coarse_arrays_host, coarse_probes_tiered, coarse_tier,
    fine_scan,
)
from rag_on_edge_tpu.ops import distances, pallas_ivf_dma, pallas_topk, quantize, topk
from rag_on_edge_tpu.ops.pallas_bruteforce import fused_topk_matmul

__all__ = ["ShardedBruteForceIndex", "ShardedIVFIndex"]

_NEG_INF = float("-inf")
_INT32_MIN = jnp.iinfo(jnp.int32).min


def _gather_merge(vals: jax.Array, ids: jax.Array, k: int, axis_name: str,
                  dedup: bool = False):
    """All-gather per-shard top-k candidates and re-select the global top-k
    (the cross-shard "join"): k per shard → k·S candidates → k.  With
    ``dedup`` (spilled indexes), a vector surfacing from two shards — its
    two clusters landed on different shards — is counted once; killed
    duplicate slots must not leak their (real) ids into the output, so
    ids are re-masked to -1 wherever the selected value is -inf."""
    vg = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)  # [B, S*k]
    ig = jax.lax.all_gather(ids, axis_name, axis=1, tiled=True)
    if dedup:
        vg, ig = topk.dedup_rows_by_id(vg, ig)
    out_v, sel = jax.lax.top_k(vg, k)
    out_i = jnp.take_along_axis(ig, sel, axis=1)
    if dedup:
        out_i = jnp.where(out_v > _NEG_INF, out_i, -1)
    return out_v, out_i


class ShardedBruteForceIndex:
    """Exact brute-force search with base vectors sharded across a mesh.

    dtype "fp32" | "bf16" | "int8" — int8 uses one global base scale so raw
    int32 scores are comparable across shards before the merge.

    engine "pallas" (default — each shard runs the fused streaming
    GEMM+top-k kernel over its base columns; the [B, N/S] score tile never
    reaches HBM) or "xla" (score GEMM + separate selection).

    rescore: quantized paths (int8/bf16) select 2k candidates per shard and
    re-rank them against a local fp32 copy before the cross-shard merge —
    local candidates are local rows, so rescoring needs no collective.
    """

    def __init__(
        self,
        base: np.ndarray,
        mesh: jax.sharding.Mesh,
        metric: str = "ip",
        dtype: str = "bf16",
        engine: str = "pallas",
        rescore: bool = False,
    ):
        if metric not in ("ip", "l2"):
            raise ValueError(f"unknown metric {metric!r}")
        if dtype not in ("fp32", "bf16", "int8"):
            raise ValueError(f"unknown dtype {dtype!r}")
        if engine not in ("xla", "pallas"):
            raise ValueError(f"unknown engine {engine!r}")
        self.metric = metric
        self.dtype = dtype
        self.engine = engine
        self.rescore = rescore and dtype != "fp32"
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.devices.size
        self.n, self.dim = base.shape

        # Pad N to a shard multiple; padded rows are masked by global index
        # (xla engine) or the kernel's dynamic n_valid bound (pallas).
        self.rows_per_shard = -(-self.n // self.n_shards)
        pad = self.rows_per_shard * self.n_shards - self.n
        base_f32 = np.asarray(base, dtype=np.float32)
        base_padded = np.pad(base_f32, ((0, pad), (0, 0)))

        shard_spec = NamedSharding(mesh, P(self.axis, None))
        col_spec = NamedSharding(mesh, P(None, self.axis))
        norms = np.sum(base_padded.astype(np.float32) ** 2, axis=1)
        if dtype == "int8":
            self._base_scale = jnp.asarray(
                np.float32(max(np.abs(base_f32).max(), 1e-12) / 127.0)
            )
            qv = np.clip(np.round(base_padded / float(self._base_scale)), -127, 127)
            qv = qv.astype(np.int8)
            self._base = jax.device_put(
                qv.T.copy() if engine == "pallas" else qv,
                col_spec if engine == "pallas" else shard_spec,
            )
        else:
            self._base_scale = None
            arr = base_padded
            if engine == "pallas":
                bt = arr.T.copy()
                if metric == "l2":
                    # L2 via augmentation (see BruteForceIndex): q' = [q, 1],
                    # b' = [b, -‖b‖²/2] → q'·b' monotone in the L2 score.
                    bt = np.concatenate([bt, -0.5 * norms[None, :]], axis=0)
                self._base = jax.device_put(
                    jnp.asarray(bt, jnp.bfloat16 if dtype == "bf16" else jnp.float32),
                    col_spec,
                )
            else:
                self._base = jax.device_put(
                    jnp.asarray(arr, jnp.bfloat16 if dtype == "bf16" else jnp.float32),
                    shard_spec,
                )
        if metric == "l2" or self.rescore:
            self._base_norms = jax.device_put(
                jnp.asarray(norms), NamedSharding(mesh, P(self.axis))
            )
        else:
            self._base_norms = None
        if self.rescore:
            self._base_f32 = jax.device_put(jnp.asarray(base_padded), shard_spec)
        else:
            self._base_f32 = None

        self._search_jit = jax.jit(self._make_sharded_fn(), static_argnames=("k",))

    def _make_sharded_fn(self):
        axis = self.axis
        rows = self.rows_per_shard
        n_total = self.n
        metric, dtype = self.metric, self.dtype
        engine, rescore = self.engine, self.rescore

        def local_rescore(q, base_f32, base_norms, vals, ids, k):
            """Exact fp32 re-rank of the local 2k candidates (local rows)."""
            safe = jnp.clip(ids, 0, base_f32.shape[0] - 1)
            cand = base_f32[safe]  # [B, 2k, D]
            scores = jnp.einsum(
                "bcd,bd->bc", cand, q,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if metric == "l2":
                scores = 2.0 * scores - base_norms[safe]
            scores = jnp.where(vals > _NEG_INF, scores, _NEG_INF)
            best_v, sel = topk.small_topk(scores, k)
            return best_v, jnp.take_along_axis(safe, sel, axis=1)

        def shard_body(q, base_shard, base_f32, base_norms, base_scale, k):
            shard_id = jax.lax.axis_index(axis)
            row0 = shard_id * rows
            kk = 2 * k if rescore else k
            if engine == "pallas":
                nv = jnp.clip(n_total - row0, 0, rows).astype(jnp.int32)[None]
                nbins = 128 if rescore else 0
                if dtype == "int8":
                    qq = quantize.quantize_int8(q, per_row=True)
                    if metric == "l2":
                        # int8 L2: alpha-rescaled dots minus the local
                        # norms bias, selected in f32 inside the kernel
                        # (see fused_topk_matmul / IVF's bias column).
                        alpha = 2.0 * qq.scale.reshape(-1) * base_scale
                        vals, ids = fused_topk_matmul(
                            qq.values, base_shard, kk, nbins=nbins,
                            n_valid=nv, alpha=alpha, bias=base_norms,
                        )
                    else:
                        v_i32, ids = fused_topk_matmul(
                            qq.values, base_shard, kk, nbins=nbins, n_valid=nv
                        )
                        vals = quantize.dequantize(v_i32, qq.scale, base_scale)
                        vals = jnp.where(v_i32 == _INT32_MIN, _NEG_INF, vals)
                else:
                    qx = q
                    if metric == "l2":
                        qx = jnp.concatenate(
                            [qx, jnp.ones((qx.shape[0], 1), qx.dtype)], axis=1
                        )
                    qx = qx.astype(base_shard.dtype)
                    vals, ids = fused_topk_matmul(
                        qx, base_shard, kk, nbins=nbins, n_valid=nv
                    )
                    if metric == "l2":
                        vals = 2.0 * vals
            else:
                valid = (row0 + jnp.arange(rows)) < n_total  # [rows]
                if dtype == "int8":
                    qq = quantize.quantize_int8(q, per_row=True)
                    raw = distances.score_matrix_int8(qq.values, base_shard)
                    if metric == "l2":
                        alpha = 2.0 * qq.scale.reshape(-1) * base_scale
                        scores = raw.astype(jnp.float32) * alpha[:, None] \
                            - base_norms[None, :]
                        scores = jnp.where(valid[None, :], scores, _NEG_INF)
                        vals, ids = topk.two_stage_topk(scores, kk)
                    else:
                        raw = jnp.where(valid[None, :], raw, _INT32_MIN)
                        v_i32, ids = topk.two_stage_topk(raw, kk)
                        vals = quantize.dequantize(v_i32, qq.scale, base_scale)
                        vals = jnp.where(v_i32 == _INT32_MIN, _NEG_INF, vals)
                else:
                    scores = distances.score_matrix(
                        q,
                        base_shard,
                        metric=metric,
                        base_norms=base_norms,
                        compute_dtype=jnp.bfloat16 if dtype == "bf16" else None,
                    )
                    scores = jnp.where(valid[None, :], scores, _NEG_INF)
                    vals, ids = topk.two_stage_topk(scores, kk)
            ids = ids.astype(jnp.int32)
            if rescore:
                vals, ids = local_rescore(q, base_f32, base_norms, vals, ids, k)
            gids = ids + row0
            return _gather_merge(vals, gids, k, axis)

        in_specs = (
            P(None, None),  # queries replicated
            # base: rows sharded (xla / fp32 rescore copy) or cols (pallas)
            P(None, axis) if engine == "pallas" else P(axis, None),
            P(axis, None) if self._base_f32 is not None else P(),
            P(axis) if self._base_norms is not None else P(),
            P(),
        )

        def fn(q, base, base_f32, norms, scale, k):
            # Index arrays travel as jit arguments: closures would inline
            # the sharded database into the HLO as a constant.
            body = functools.partial(shard_body, k=k)
            return jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )(q, base, base_f32, norms, scale)

        return fn

    def search_device(self, queries: jax.Array, k: int):
        """On-device sharded search → (vals [B,k] f32, ids [B,k] i32)."""
        norms = self._base_norms if self._base_norms is not None else jnp.zeros(())
        scale = self._base_scale if self._base_scale is not None else jnp.zeros(())
        base_f32 = self._base_f32 if self._base_f32 is not None else jnp.zeros(())
        return self._search_jit(queries, self._base, base_f32, norms, scale, k)

    def search(self, queries: np.ndarray, k: int, batch_size: int | None = None):
        """Host API → (ids [Q,k] i32, scores [Q,k] f32)."""
        queries = np.asarray(queries, dtype=np.float32)
        nq = queries.shape[0]
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


def _memo_last(fn):
    """Memoize the most recent shard's result.  Effective ONLY under the
    shard-outer placement loop (:func:`_put_sharded_multi`), where every
    consumer of shard s runs before the loop advances to s+1 — a 1-entry
    cache then shares expensive per-shard slices (block tables, the
    compact fp32 copy) without ever holding more than one shard's worth
    of host memory."""
    cache: dict = {}

    def wrapped(s):
        if cache.get("s") != s:
            cache["s"] = s
            cache["v"] = fn(s)
        return cache["v"]

    return wrapped


def _put_sharded(mesh, axis: str, shape, dtype, shard_fn):
    """Assemble a global [S, ...] array from per-shard host slices.

    ``shard_fn(s)`` returns the numpy array for shard ``s`` with shape
    ``shape[1:]``.  Each slice is placed directly on its device and the
    global array is assembled with
    ``jax.make_array_from_single_device_arrays`` — peak host memory is ONE
    shard's slice, not the S-stacked copy the naive ``device_put`` of a
    dense [S, ...] array would require (several full database copies at
    10M x 8 shards).
    """
    devices = list(mesh.devices.ravel())
    assert shape[0] == len(devices)
    sharding = NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))
    bufs = []
    for s, d in enumerate(devices):
        arr = np.asarray(shard_fn(s), dtype=dtype)
        assert arr.shape == tuple(shape[1:]), (arr.shape, shape)
        bufs.append(jax.device_put(arr[None], d))
    return jax.make_array_from_single_device_arrays(tuple(shape), sharding, bufs)


def _put_sharded_multi(mesh, axis: str, specs: dict) -> dict:
    """Assemble several global [S, ...] arrays with ONE shard-outer loop.

    ``specs`` maps name -> (shape, dtype, shard_fn).  Iterating shards on
    the OUTSIDE is what makes :func:`_memo_last` effective: producers
    shared by several arrays (block tables feed 4, the compact fp32 slice
    feeds 2) are computed once per shard and hit the 1-entry cache for
    every consumer before the loop moves to shard s+1.  (An array-outer
    loop — one `_put_sharded` per array — evicts the cache between
    arrays, recomputing tables 4x and the ~0.6 GB 10M compact copy 2x
    per shard.)  Peak host memory remains one shard's slices.
    """
    devices = list(mesh.devices.ravel())
    bufs: dict = {name: [] for name in specs}
    for s, d in enumerate(devices):
        for name, (shape, dtype, fn) in specs.items():
            assert shape[0] == len(devices), name
            arr = np.asarray(fn(s), dtype=dtype)
            assert arr.shape == tuple(shape[1:]), (name, arr.shape, shape)
            bufs[name].append(jax.device_put(arr[None], d))
    out = {}
    for name, (shape, dtype, fn) in specs.items():
        sharding = NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))
        out[name] = jax.make_array_from_single_device_arrays(
            tuple(shape), sharding, bufs[name]
        )
    return out


def _partition_clusters(offsets: np.ndarray, n_shards: int) -> list[tuple[int, int]]:
    """Assign contiguous cluster ranges to shards, balancing row counts.

    Returns per-shard (cluster_lo, cluster_hi).  Contiguity preserves the
    reordered layout's slab property within each shard.
    """
    nlist = len(offsets) - 1
    total = int(offsets[-1])
    bounds = []
    lo = 0
    for s in range(n_shards):
        target = total * (s + 1) / n_shards
        hi = int(np.searchsorted(offsets[1:], target, side="left")) + 1
        hi = max(min(hi, nlist), lo)
        if s == n_shards - 1:
            hi = nlist
        bounds.append((lo, hi))
        lo = hi
    return bounds


class ShardedIVFIndex:
    """IVF search with clusters sharded across a mesh.

    Built from a single-chip :class:`IVFIndex` (whose artifacts it reuses);
    the coarse quantizer is replicated, cluster slabs are distributed.
    """

    def __init__(self, index: IVFIndex, mesh: jax.sharding.Mesh):
        # Spilled (spill_eps>0) sources work sharded: duplicate copies are
        # removed in the in-shard candidate pools AND at the cross-shard
        # merge (a vector's two clusters can land on different shards).
        self.spilled = bool(getattr(index, "spilled", False))
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_shards = mesh.devices.size
        self.metric = index.metric
        self.coarse_metric = index.coarse_metric
        self.dtype = index.dtype
        self.nlist = index.nlist
        self.n, self.dim = index.n, index.dim
        self.max_cluster_size = index.max_cluster_size

        # Replicated coarse stage rides the SAME measured tiering as the
        # single-chip index (bf16 GEMM at nlist >= 512, fused Pallas kernel
        # at >= 8192 — models/ivf.py coarse_tier): every shard pays the
        # coarse GEMM, so the fp32-HIGHEST six-pass cost it used to pay
        # was the cheapest named slice of the sharded-vs-single-chip gap.
        self._coarse_tier = getattr(
            index, "_coarse_tier", None) or coarse_tier(index.nlist)
        cents, c_norms = coarse_arrays_host(
            index._centroids_np, index.coarse_metric, self._coarse_tier)
        self._centroids = jnp.asarray(cents)
        self._centroid_norms = (
            jnp.asarray(c_norms) if c_norms is not None else None
        )

        self._src_index = index  # host-side arrays reused for lazy layouts
        self._qm_arrays: dict | None = None  # query-major per-shard layout
        self._cm_arrays: dict | None = None
        self.last_spill = None  # routing spill of the last cluster-major call
        self.last_engine: str | None = None  # kernel of the last cluster call
        self._search_jit = jax.jit(
            self._make_sharded_fn(), static_argnames=("k", "nprobe", "probe_chunk")
        )
        self._search_cm_jit = jax.jit(
            self._make_cluster_major_fn(),
            static_argnames=("k", "nprobe", "qcap", "recover_qcap",
                             "recover_blocks", "recover_passes", "engine",
                             "stage"),
        )

    # ------------------------------------------------- query-major (gather)

    def _ensure_query_state(self) -> None:
        """Per-shard layout for the query-major gather fine scan: unpadded
        cluster-contiguous fp32 rows (both stores keep the host copy), with
        local CSR offsets.  Built lazily — cluster-major-only serving (the
        10M flagship) never pays for it — and placed shard-by-shard
        (:func:`_put_sharded`), never as a host-stacked [S, ...] copy."""
        if self._qm_arrays is not None:
            return
        index = self._src_index
        offsets = index._offsets_np.astype(np.int64)  # [nlist+1]
        sizes = np.diff(offsets).astype(np.int32)
        bounds = _partition_clusters(offsets, self.n_shards)
        rows_max = max(
            max((int(offsets[hi] - offsets[lo]) for lo, hi in bounds), default=1), 1
        )
        S = self.n_shards
        mesh, axis = self.mesh, self.axis

        def cut(s, fill, src, dtype, extra_cols=None):
            lo, hi = bounds[s]
            r0, r1 = int(offsets[lo]), int(offsets[hi])
            shape = (rows_max,) + src.shape[1:]
            out = np.full(shape, fill, dtype=dtype)
            out[: r1 - r0] = src[r0:r1]
            return out

        dt = np.float32
        vec_cut = _memo_last(lambda s: cut(s, 0, index._vectors_np, dt))

        def locals_for(s):
            lo, hi = bounds[s]
            r0 = int(offsets[lo])
            offs = np.zeros(self.nlist, np.int32)
            szs = np.zeros(self.nlist, np.int32)
            offs[lo:hi] = (offsets[lo:hi] - r0).astype(np.int32)
            szs[lo:hi] = sizes[lo:hi]
            return offs, szs

        locals_for = _memo_last(locals_for)
        specs = {
            "vectors": (
                (S, rows_max, self.dim),
                jnp.bfloat16 if self.dtype == "bf16" else np.float32,
                vec_cut,
            ),
            "reorder": ((S, rows_max), np.int32,
                        lambda s: cut(s, -1, index._reorder_np, np.int32)),
            "offs": ((S, self.nlist), np.int32, lambda s: locals_for(s)[0]),
            "sizes": ((S, self.nlist), np.int32, lambda s: locals_for(s)[1]),
        }
        if self.metric == "l2":
            specs["vector_norms"] = (
                (S, rows_max), np.float32,
                lambda s: np.sum(vec_cut(s).astype(np.float32) ** 2, axis=1),
            )
        self._qm_arrays = _put_sharded_multi(mesh, axis, specs)

    # ------------------------------------------------- cluster-major (pallas)

    def _ensure_cluster_state(self) -> None:
        """Per-shard block-padded layouts for the cluster-major kernel.

        Works for BOTH stores: the kernel slabs are sliced from the source
        index's own ``vectors_t`` (already quantized/augmented, one global
        int8 scale — cross-shard comparable), block tables carry GLOBAL
        cluster ids so the replicated routed-query table indexes directly,
        and the fp32 rescore source is COMPACT (unpadded, reached through
        per-cluster offset maps) — no padded fp32 copy per shard.  Every
        per-shard array is placed with :func:`_put_sharded`; peak host
        memory is one shard's slice.
        """
        if self._cm_arrays is not None:
            return
        from rag_on_edge_tpu.ops import pallas_ivf

        index = self._src_index
        index._ensure_kernel_state()
        blk = index.PAD_BLOCK
        offs_p = np.asarray(index._arrays["offsets"]).astype(np.int64)  # padded starts
        sizes = np.asarray(index._arrays["sizes"])
        offs_u = index._offsets_np.astype(np.int64)  # [nlist+1] unpadded
        n_padded = index.n_padded
        S = self.n_shards
        bounds = _partition_clusters(
            np.concatenate([offs_p, [n_padded]]), S
        )
        row_bounds = [
            (int(offs_p[lo]) if lo < self.nlist else n_padded,
             int(offs_p[hi]) if hi < self.nlist else n_padded)
            for lo, hi in bounds
        ]
        rows_max = max(max(r1 - r0 for r0, r1 in row_bounds), blk)
        rows_max = -(-rows_max // blk) * blk
        # Pad the per-shard block count to a multiple of 8: the accum
        # (planes) engine walks group=8 blocks per grid step and needs
        # >= depth blocks for its DMA-ring warm-up (the grouped engine's
        # CM_GROUP=4 is covered too).  Dummy blocks are rv=0 no-ops.
        nblocks_max = -(-(rows_max // blk) // 8) * 8
        rows_max = nblocks_max * blk
        rows_c_max = max(
            max(int(offs_u[hi] - offs_u[lo]) for lo, hi in bounds), 1
        )
        mesh, axis = self.mesh, self.axis
        src_vt = index._arrays["vectors_t"]  # [nblocks_g(+pad), d', blk] device
        d_aug = src_vt.shape[1]

        def vt_slice(s):
            (lo, hi), (r0, r1) = bounds[s], row_bounds[s]
            b0, b1 = r0 // blk, r1 // blk
            out = np.zeros((nblocks_max, d_aug, blk), src_vt.dtype)
            out[: b1 - b0] = np.asarray(src_vt[b0:b1])
            return out

        def tables(s):
            lo, hi = bounds[s]
            r0 = row_bounds[s][0]
            bc = np.full(nblocks_max, max(hi - 1, 0), np.int32)
            bf = np.zeros(nblocks_max, np.int32)
            bl = np.zeros(nblocks_max, np.int32)
            rv = np.zeros(nblocks_max, np.int32)
            # LOCAL last-block index per GLOBAL cluster id (accum planes
            # join: only a cluster's last block's pp row is defined).
            # Unowned clusters read 0 — gated by `owned` at the join.
            lb = np.zeros(self.nlist, np.int32)
            if hi > lo:
                bcl, bfl, bll, rvl, lbl = pallas_ivf.build_block_tables(
                    offs_p[lo:hi] - r0, sizes[lo:hi], blk
                )
                nb = len(bcl)
                bc[:nb] = bcl + lo  # local tables, GLOBAL cluster ids
                bf[:nb], bl[:nb], rv[:nb] = bfl, bll, rvl
                lb[lo:hi] = lbl
                # Trailing dummy blocks: attached to the last owned cluster
                # with first=last=0 and no valid rows — pure no-ops.
            return bc, bf, bl, rv, lb

        def compact(s, src, fill, dtype):
            lo, hi = bounds[s]
            u0, u1 = int(offs_u[lo]), int(offs_u[hi])
            out = np.full((rows_c_max,) + src.shape[1:], fill, dtype)
            out[: u1 - u0] = src[u0:u1]
            return out

        def crow_map(s):
            """LOCAL padded row -> LOCAL compact row, one i32 per padded
            row.  Collapses the rescore's per-candidate offset-map chain
            (bc[row//blk] -> po/co lookups, 3 gathers of B*kk indices
            each) into ONE table gather: per-index fixed cost dominates
            TPU gathers (models/ivf.py _rescore_rows), and the sharded
            rescore was the largest stage on silicon (9.8 ms of 23.8 at
            1M np=4 B=8192 — harness/profile_sharded).  Padding rows map
            to 0 (masked by best_v at use)."""
            lo, hi = bounds[s]
            r0, u0 = row_bounds[s][0], int(offs_u[lo])
            out = np.zeros(rows_max, np.int32)
            for c in range(lo, hi):
                sz = int(sizes[c])
                p0 = int(offs_p[c]) - r0
                out[p0 : p0 + sz] = np.arange(
                    int(offs_u[c]) - u0, int(offs_u[c]) - u0 + sz,
                    dtype=np.int32)
            return out

        def norms_padded(s):
            """fp32 norms by LOCAL PADDED row (the int8-L2 kernel bias)."""
            lo, hi = bounds[s]
            r0, u0 = row_bounds[s][0], int(offs_u[lo])
            vc = index._vectors_np
            out = np.zeros(rows_max, np.float32)
            for c in range(lo, hi):
                sz = int(sizes[c])
                p0 = int(offs_p[c]) - r0
                a0 = int(offs_u[c])
                out[p0 : p0 + sz] = np.sum(
                    vc[a0 : a0 + sz].astype(np.float32) ** 2, axis=1
                )
            return out

        cluster_shard = np.zeros(self.nlist, dtype=np.int32)
        for s, (lo, hi) in enumerate(bounds):
            cluster_shard[lo:hi] = s

        # One computation per shard, shared across the arrays that consume
        # it (tables feeds 5 arrays) — at the 10M flagship each extra compact
        # call is a ~0.6 GB host copy and each tables call a full
        # build_block_tables pass.  Sharing requires the SHARD-outer
        # placement loop (`_put_sharded_multi`): consumers of one shard's
        # producer run back-to-back, so the 1-entry memo hits.
        tables = _memo_last(tables)
        compact_f32 = _memo_last(
            lambda s: compact(s, index._vectors_np, 0, np.float32)
        )

        self._cm_base_scale = getattr(index, "_base_scale", None)
        specs = {
            "vectors_t": ((S, nblocks_max, d_aug, blk), src_vt.dtype, vt_slice),
            "vectors_c": ((S, rows_c_max, self.dim), np.float32, compact_f32),
            "crow_map": ((S, rows_max), np.int32, crow_map),
            "reorder_c": ((S, rows_c_max), np.int32,
                          lambda s: compact(s, index._reorder_np, -1, np.int32)),
        }
        for name, _i in [("bc", 0), ("bf", 1), ("bl", 2), ("rv", 3)]:
            specs[name] = ((S, nblocks_max), np.int32,
                           lambda s, _i=_i: tables(s)[_i])
        specs["lb"] = ((S, self.nlist), np.int32, lambda s: tables(s)[4])
        if self.dtype == "int8" and self.metric == "l2":
            specs["norms_pad"] = ((S, rows_max), np.float32, norms_padded)
        else:
            specs["norms_pad"] = ((S, 8), np.float32,
                                  lambda s: np.zeros(8, np.float32))
        arrays = _put_sharded_multi(mesh, axis, specs)
        arrays["cluster_shard"] = jnp.asarray(cluster_shard)
        arrays["sizes"] = jnp.asarray(sizes)
        self._cm_arrays = arrays
        # Accum (planes) engine eligibility — the same layout gates as the
        # single-chip auto pick (models/ivf.py search_device): block span
        # per cluster, pad_block chunk-id width, int8 packed-key dim cap.
        # Whole clusters live on one shard, so the spans are unchanged.
        self._cm_accum_ok = (
            index._cm_max_nb <= pallas_ivf_dma.CODE_MAX
            and blk <= 128 * pallas_ivf_dma.CODE_MAX
            and index.dim <= index._accum_dim_cap()
        )

    def _make_cluster_major_fn(self):
        from rag_on_edge_tpu.models.ivf import invert_probes
        from rag_on_edge_tpu.ops import pallas_ivf, topk as topk_ops

        axis = self.axis
        metric = self.metric
        coarse_metric = self.coarse_metric
        tier = self._coarse_tier
        nlist = self.nlist
        blk = self._src_index.PAD_BLOCK
        dtype = self.dtype
        spilled = self.spilled
        get_scale = lambda: self._cm_base_scale  # noqa: E731 — set by _ensure_cluster_state

        def shard_body(q, cents, c_norms, vecs_t, vecs_c, crow_map, reorder_c,
                       bc, bf, bl, rv, lb, norms_pad,
                       cluster_shard, sizes, k, nprobe, qcap,
                       recover_qcap, recover_blocks, recover_passes, engine,
                       stage):
            def prefix_out(leaf):
                # Cumulative-prefix early return (harness/profile_sharded):
                # one replicated [b, 1] f32 leaf (chainable by the timing
                # protocol) + dummies matching the full program's out_specs.
                b_ = q.shape[0]
                return (leaf.reshape(b_, 1).astype(jnp.float32),
                        jnp.zeros((b_, 1), jnp.int32),
                        jnp.zeros((b_,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))

            vecs_t, vecs_c, crow_map, reorder_c = (
                vecs_t[0], vecs_c[0], crow_map[0], reorder_c[0]
            )
            bc, bf, bl, rv, norms_pad = bc[0], bf[0], bl[0], rv[0], norms_pad[0]
            lb = lb[0]
            kk = 2 * k
            # Full-depth per-cluster emit (IVFIndex._auto_cluster_k): the
            # nearest probed cluster typically holds most of a query's
            # top-kk, so per-cluster truncation costs real recall.
            ck = kk

            # Replicated stages: tiered coarse probing (identical to the
            # single-chip tier for this nlist) + MoE-style inversion.
            probes = coarse_probes_tiered(
                q, cents, c_norms if coarse_metric == "l2" else None,
                min(nprobe, nlist), tier=tier, coarse_metric=coarse_metric)
            if stage == "coarse":
                return prefix_out(probes[:, :1].astype(jnp.float32))
            cq, slot, _ = invert_probes(probes, nlist, qcap)
            # Dropped pairs on empty clusters lose nothing and can never be
            # recovered (no local blocks) — they are not spill.  `lossy` is
            # replicated (probes/slot/sizes all are), so no psum is needed.
            lossy = (slot < 0) & (sizes[probes] > 0)
            spill = jnp.sum(lossy).astype(jnp.int32)
            ncand = jnp.sum(sizes[probes], axis=1).astype(jnp.int32)
            routed = (cq >= 0)[..., None]
            alpha, bias = None, None
            if dtype == "int8":
                # Same int8 scheme as IVFIndex: per-batch query scale
                # (replicated q → identical on every shard), L2 as a bias
                # column over the local norms, alpha-rescale after.
                sq = quantize.calibrate_scale(q)
                qrow = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
                alpha = sq * jnp.float32(get_scale())
                if metric == "l2":
                    alpha = 2.0 * alpha
                    bias = (norms_pad / alpha)[None, :]
            else:
                qrow = q
                if metric == "l2":
                    qrow = jnp.concatenate(
                        [qrow, jnp.ones((q.shape[0], 1), qrow.dtype)], axis=-1
                    )
                qrow = qrow.astype(vecs_t.dtype)
            qg = jnp.where(routed, qrow[jnp.clip(cq, 0)], jnp.zeros((), qrow.dtype))
            if stage == "invert":
                return prefix_out(probes[:, :1].astype(jnp.float32)
                                  + spill.astype(jnp.float32))
            if stage == "route":
                return prefix_out(probes[:, :1] * 0
                                  + jnp.sum(qg.astype(jnp.float32)))

            b = q.shape[0]
            me = jax.lax.axis_index(axis)
            owned = cluster_shard[probes] == me

            # Sharded fine stage: each chip scans only its local blocks.
            pv = pr = pp = None
            if engine == "pallas_accum":
                # Planes-emit accum engine inside shard_map (the single-chip
                # flagship kernel, models/ivf.py STAGE 3): per-block routed
                # queries, raw packed bin planes out, selection at the join.
                nblocks_local = vecs_t.shape[0]
                bias_rows = None
                if bias is not None:
                    # Pre-shifted planes pack — see the single-chip builder
                    # (models/ivf.py): (round(norms/alpha) << 8) - pack,
                    # pack = (code(t) << 4) | cid(col).
                    cmax = pallas_ivf_dma.CODE_MAX
                    code = jnp.int32(cmax - 1) - (
                        jnp.arange(nblocks_local, dtype=jnp.int32) % cmax)
                    cidc = jnp.arange(blk, dtype=jnp.int32) >> 7
                    pack = (jax.lax.shift_left(code, 4)[:, None]
                            | cidc[None, :])  # [nblocks, blk]
                    br = jnp.clip(
                        jnp.round(bias.reshape(nblocks_local, 1, blk)),
                        -(2.0**21), 2.0**21).astype(jnp.int32)
                    bias_rows = jax.lax.shift_left(br, 8) - pack[:, None, :]
                qb = qg[bc]  # [nblocks_local, qcap, D'] per-block queries
                pp = pallas_ivf_dma.cluster_major_accum_planes(
                    qb, vecs_t, bf, bl, rv, blk=blk, group=8,
                    depth=4 if vecs_t.dtype == jnp.float32 else 8,
                    bin2=True, bias_rows=bias_rows)
            else:
                pv, pr = pallas_ivf.cluster_major_scan(
                    qg, vecs_t, bc, bf, bl, rv, k=ck, blk=blk, bias=bias
                )
            if stage == "kernel":
                # One lane of the kernel output, psum-reduced (replicated
                # leaf); Pallas calls are opaque so the slice cannot DCE
                # the scan itself.
                raw = pp[:, :, 0].astype(jnp.float32) if pp is not None \
                    else jnp.where(pv[:, :, 0] > _NEG_INF, pv[:, :, 0], 0.0)
                return prefix_out(probes[:, :1] * 0
                                  + jax.lax.psum(jnp.sum(raw), axis) * 1e-9)
            extra = None
            if recover_qcap and recover_blocks:
                # Spilled-pair recovery (IVFIndex._cm_recover, sharded form):
                # re-invert the dropped pairs and walk a compacted list of
                # the affected clusters' LOCAL blocks; outputs stay indexed
                # by global cluster id, so the join below reads them the
                # same way as the main pass.  One iteration per pass; each
                # re-invers only the pairs still unplaced.
                nblocks_local = vecs_t.shape[0]
                blk_ids = jnp.where(rv > 0, jnp.arange(nblocks_local, dtype=jnp.int32), -1)
                last_blk = jnp.full((nlist,), -1, jnp.int32).at[bc].max(blk_ids, mode="drop")
                ev, er = [], []
                todo = lossy
                for _ in range(recover_passes):
                    probes2 = jnp.where(todo, probes, nlist)
                    cq2, slot2, _ = invert_probes(probes2, nlist + 1, recover_qcap)
                    cq2 = cq2[:nlist]
                    active_c = cq2[:, 0] >= 0
                    active_b = active_c[bc] & (rv > 0)
                    rank = jnp.cumsum(active_b.astype(jnp.int32)) - 1
                    order = jnp.argsort(~active_b, stable=True).astype(jnp.int32)
                    blocks_list = order[:recover_blocks]
                    inc_b = active_b & (rank < recover_blocks)
                    inc_list = inc_b[blocks_list]
                    # A cluster is covered iff its last real local block
                    # made the cut (stable compaction keeps blocks
                    # consecutive).
                    cluster_inc = active_c & (last_blk >= 0) & inc_b[jnp.clip(last_blk, 0)]
                    routed2 = (cq2 >= 0)[..., None]
                    qg2 = jnp.where(routed2, qrow[jnp.clip(cq2, 0)], jnp.zeros((), qrow.dtype))
                    bias2 = None
                    if bias is not None:
                        bias2 = bias.reshape(nblocks_local, blk)[blocks_list].reshape(1, -1)
                    # cluster_major_scan's OUTPUT window is indexed by the
                    # block->cluster map, and Pallas requires each output
                    # block be visited in ONE consecutive run.  The
                    # excluded tail (inactive blocks, incl. table-padding
                    # dummies whose bc = last owned cluster) could revisit
                    # an active cluster's row after its emit and flush
                    # stale scratch over it — park the tail on the LAST
                    # included block's cluster instead (consecutive
                    # continuation; rv=0 makes the steps no-ops).
                    bls = bc[blocks_list]
                    n_inc = jnp.sum(inc_list.astype(jnp.int32))
                    bc2 = jnp.where(inc_list, bls, bls[jnp.clip(n_inc - 1, 0)])
                    pv2, pr2 = pallas_ivf.cluster_major_scan(
                        qg2, vecs_t[blocks_list], bc2,
                        jnp.where(inc_list, bf[blocks_list], 0),
                        jnp.where(inc_list, bl[blocks_list], 0),
                        jnp.where(inc_list, rv[blocks_list], 0),
                        k=ck, blk=blk, bias=bias2, row_base=blocks_list * blk,
                    )
                    placed = (slot2 >= 0) & cluster_inc[probes]
                    ok2 = todo & placed & owned  # todo already implies sizes > 0
                    sl2 = jnp.clip(slot2, 0)
                    ev.append(jnp.where(ok2[..., None], pv2[probes, sl2], _NEG_INF))
                    er.append(pr2[probes, sl2])
                    todo = todo & ~placed
                extra = (jnp.concatenate([e.reshape(b, -1) for e in ev], axis=1),
                         jnp.concatenate([e.reshape(b, -1) for e in er], axis=1))
                spill = jax.lax.psum(
                    jnp.sum(todo & owned), axis
                ).astype(jnp.int32)

            if alpha is not None:
                if pv is not None:
                    pv = alpha * pv  # −inf stays −inf
                if extra is not None:
                    extra = (alpha * extra[0], extra[1])
            elif metric == "l2":
                if pv is not None:
                    pv = 2.0 * pv
                if extra is not None:
                    extra = (2.0 * extra[0], extra[1])

            # Join over locally-owned, recorded, non-empty pairs only.
            ok = (slot >= 0) & owned & (sizes[probes] > 0)
            sl = jnp.clip(slot, 0)
            if engine == "pallas_accum":
                # Planes join + row decode (the single-chip
                # _cm_finish_planes, per shard): gather each owned pair's
                # packed planes from its cluster's LOCAL last block, top-kk
                # the pool, decode local padded rows from the keys.
                kmin = jnp.int32(pallas_ivf_dma.KMIN)
                cmax = pallas_ivf_dma.CODE_MAX
                w = pp.shape[2]
                tl = jnp.clip(lb[probes], 0)  # [b, P] local last blocks
                flat = (tl * pp.shape[1] + sl).reshape(-1)
                gp = jnp.take(pp.reshape(-1, w), flat, axis=0).reshape(b, -1, w)
                gp = jnp.where(ok[..., None], gp, kmin)
                pool = gp.shape[1] * w
                if b * pool >= 8 << 20:  # fused VMEM-resident selection
                    vals_p, selp = pallas_topk.fused_topk(
                        gp.reshape(b, pool), min(kk, pool))
                else:  # below ~8M pool entries XLA is cheaper
                    vals_p, selp = topk_ops.small_topk(
                        gp.reshape(b, pool), min(kk, pool))
                valid = vals_p > kmin
                pi = selp // w
                lane = (selp % w) & jnp.int32(127)
                cid = vals_p & jnp.int32(cmax - 1)
                codeb = jax.lax.shift_right_logical(vals_p, 4) & jnp.int32(cmax - 1)
                tsel = jnp.take_along_axis(tl, pi, axis=1)
                dd = ((tsel & (cmax - 1))
                      - (jnp.int32(cmax - 1) - codeb)) & jnp.int32(cmax - 1)
                gr = (tsel - dd) * blk + cid * 128 + lane
                if alpha is not None:
                    gv = alpha * jax.lax.shift_right_arithmetic(
                        vals_p, 8).astype(jnp.float32)
                else:
                    gv = pallas_ivf_dma._key_to_f32(vals_p)
                    if metric == "l2":
                        gv = 2.0 * gv  # augmented scores are l2_score/2
                gv = jnp.where(valid, gv, _NEG_INF)
                gr = jnp.where(valid, gr, 0)
            else:
                gv = jnp.where(ok[..., None], pv[probes, sl], _NEG_INF).reshape(b, -1)
                gr = pr[probes, sl].reshape(b, -1)
            if extra is not None:
                gv = jnp.concatenate([gv, extra[0]], axis=1)
                gr = jnp.concatenate([gr, extra[1]], axis=1)
            best_v, sel = topk_ops.small_topk(gv, min(kk, gv.shape[1]))
            best_r = jnp.take_along_axis(gr, sel, axis=1)
            if stage == "join":
                fin = jnp.where(best_v > _NEG_INF, best_v, 0.0)
                return prefix_out(probes[:, :1] * 0
                                  + jax.lax.psum(jnp.sum(fin), axis) * 1e-9)
            # fp32 rescore of local candidates (binned kernel selection is
            # approximate) against the COMPACT fp32 copy.  Three FLAT
            # gathers total — padded row -> compact row via the prebuilt
            # crow_map table, candidate vectors, original ids — with
            # candidate norms recomputed from the gathered rows (128
            # FLOPs) instead of a fourth B*kk-index gather: per-index
            # fixed cost dominates TPU gathers (models/ivf.py
            # _rescore_rows), and this stage was the largest on silicon
            # (9.8 ms of 23.8 before, 1M np=4 B=8192).  Garbage slots map
            # to row 0 and stay masked by best_v.
            bsz, kp = best_r.shape
            safe = jnp.clip(best_r, 0, crow_map.shape[0] - 1).reshape(-1)
            crow = jnp.clip(jnp.take(crow_map, safe, axis=0),
                            0, vecs_c.shape[0] - 1)
            cand = jnp.take(vecs_c, crow, axis=0).reshape(bsz, kp, -1)
            scores = jnp.einsum(
                "bcd,bd->bc", cand, q, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if metric == "l2":
                scores = 2.0 * scores - jnp.sum(cand * cand, axis=-1)
            scores = jnp.where(best_v > _NEG_INF, scores, _NEG_INF)
            pool_ids = jnp.take(reorder_c, crow, axis=0).reshape(
                bsz, kp).astype(jnp.int32)
            if spilled:
                # In-shard dedup: a vector spilled into two clusters of the
                # SAME shard reaches this pool twice (identical fp32 score).
                scores, pool_ids = topk.dedup_rows_by_id(scores, pool_ids)
            best_v, sel2 = topk_ops.small_topk(scores, k)
            ids = jnp.where(
                best_v > _NEG_INF,
                jnp.take_along_axis(pool_ids, sel2, axis=1), -1)
            if stage == "rescore":
                fin = jnp.where(best_v > _NEG_INF, best_v, 0.0)
                return prefix_out(probes[:, :1] * 0
                                  + jax.lax.psum(jnp.sum(fin), axis) * 1e-9)

            out_v, out_i = _gather_merge(
                best_v, ids.astype(jnp.int32), k, axis, dedup=spilled)
            return out_v, out_i, ncand, spill[None]

        in_specs = (
            P(None, None),  # queries
            P(None, None),  # centroids
            P(None) if self._centroid_norms is not None else P(),
            P(axis, None, None, None),  # vectors_t (block-tiled)
            P(axis, None, None),  # vectors_c (compact fp32 rescore)
            P(axis, None),  # crow_map (padded row -> compact row)
            P(axis, None),  # reorder_c
            P(axis, None), P(axis, None), P(axis, None), P(axis, None),  # tables
            P(axis, None),  # lb (local last block per global cluster)
            P(axis, None),  # norms_pad (int8-L2 kernel bias)
            P(None),  # cluster_shard
            P(None),  # sizes
        )

        def fn(q, cents, c_norms, vecs_t, vecs_c, crow_map, reorder_c,
               bc, bf, bl, rv, lb, norms_pad,
               cluster_shard, sizes, k, nprobe, qcap,
               recover_qcap, recover_blocks, recover_passes, engine,
               stage="full"):
            body = functools.partial(shard_body, k=k, nprobe=nprobe, qcap=qcap,
                                     recover_qcap=recover_qcap,
                                     recover_blocks=recover_blocks,
                                     recover_passes=recover_passes,
                                     engine=engine, stage=stage)
            return jax.shard_map(
                body, mesh=self.mesh, in_specs=in_specs,
                out_specs=(P(None, None), P(None, None), P(None), P(None)),
                check_vma=False,
            )(q, cents, c_norms, vecs_t, vecs_c, crow_map, reorder_c,
              bc, bf, bl, rv, lb, norms_pad, cluster_shard, sizes)

        return fn

    def _make_sharded_fn(self):
        axis = self.axis
        metric = self.metric
        coarse_metric = self.coarse_metric
        tier = self._coarse_tier
        smax = self.max_cluster_size
        nlist = self.nlist
        spilled = self.spilled

        def shard_body(q, cents, c_norms, vecs, v_norms, offs, szs, reorder, k, nprobe, probe_chunk):
            vecs, offs, szs, reorder = (
                vecs[0],
                offs[0],
                szs[0],
                reorder[0],
            )
            v_norms = v_norms[0] if metric == "l2" else None
            # STAGE 1 (replicated — the centroid GEMM is tiny): tiered
            # coarse probing, identical on every shard AND identical to
            # the single-chip tier for this nlist.
            probes = coarse_probes_tiered(
                q, cents, c_norms if coarse_metric == "l2" else None,
                min(nprobe, nlist), tier=tier, coarse_metric=coarse_metric)
            p_offs = offs[probes]
            p_sizes = szs[probes]  # 0 for clusters this shard doesn't own
            ncand = jax.lax.psum(jnp.sum(p_sizes, axis=1), axis)

            # STAGE 2 (sharded): scan only locally-owned probed clusters.
            # Spilled indexes scan a deeper local pool: in-shard duplicate
            # copies occupy fine_scan slots until the merge dedups them,
            # and every true neighbor has at most 2 copies — 2k slots
            # guarantee the single-chip top-k survives (k+k//2 measurably
            # lost neighbors at full probe under heavy spill).
            local_k = 2 * k if spilled else k
            vals, rows = fine_scan(
                q, vecs, v_norms, p_offs, p_sizes,
                k=local_k, probe_chunk=probe_chunk, metric=metric,
                max_cluster_size=smax,
            )
            ids = jnp.where(vals > _NEG_INF, reorder[rows], -1).astype(jnp.int32)
            out_v, out_i = _gather_merge(vals, ids, k, axis, dedup=spilled)
            return out_v, out_i, ncand.astype(jnp.int32)

        in_specs = (
            P(None, None),  # queries replicated
            P(None, None),  # centroids replicated
            P(None) if self._centroid_norms is not None else P(),
            P(axis, None, None),
            P(axis, None) if self.metric == "l2" else P(),
            P(axis, None),
            P(axis, None),
            P(axis, None),
        )

        def fn(q, cents, c_norms, vecs, v_norms, offs, szs, reorder, k, nprobe, probe_chunk):
            # Index arrays travel as jit arguments (no constant inlining).
            body = functools.partial(
                shard_body, k=k, nprobe=nprobe, probe_chunk=probe_chunk
            )
            return jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(P(None, None), P(None, None), P(None)),
                check_vma=False,
            )(q, cents, c_norms, vecs, v_norms, offs, szs, reorder)

        return fn

    def _auto_probe_chunk(self, batch: int) -> int:
        return self._src_index._auto_probe_chunk(batch)

    def _auto_qcap(self, batch: int, nprobe: int) -> int:
        return self._src_index._auto_qcap(batch, nprobe)

    def search_device(self, queries, k: int, nprobe: int, probe_chunk: int | None = None,
                      mode: str = "query", qcap: int | None = None,
                      recover: bool | None = None,
                      recover_qcap: int | None = None,
                      recover_blocks: int | None = None,
                      recover_passes: int | None = None,
                      engine: str = "auto"):
        """mode "query": per-shard gather fine scan (exact).  mode
        "cluster": per-shard cluster-major Pallas kernel (binned + fp32
        rescore) — the batch-scale path.  ``recover`` enables the
        spilled-pair recovery pass per shard (default: on exactly when the
        auto-qcap heuristic is clamped into the spilling regime, as on the
        single-chip index).  ``engine`` (cluster mode): "auto" picks the
        accum planes kernel where the layout allows (the single-chip
        flagship) and the grouped-walk kernel otherwise; "pallas_accum" /
        "pallas" force one."""
        c_norms = (self._centroid_norms if self._centroid_norms is not None
                   else jnp.zeros(()))
        if mode == "cluster":
            self._ensure_cluster_state()
            a = self._cm_arrays
            if engine == "auto":
                engine = "pallas_accum" if self._cm_accum_ok else "pallas"
            elif engine == "pallas_accum" and not self._cm_accum_ok:
                raise ValueError(
                    "engine='pallas_accum' layout limits not met (cluster "
                    "block span, pad_block, or int8 dim cap) — use "
                    "engine='pallas'")
            elif engine not in ("pallas", "pallas_accum"):
                raise ValueError(f"unknown sharded cluster engine {engine!r}")
            if recover is None:
                recover = self._src_index._auto_recover(queries.shape[0], nprobe)
            rq = rb = 0
            rp = 1
            if recover:
                nblocks_local = a["vectors_t"].shape[1]
                rq = recover_qcap or qcap or self._auto_qcap(queries.shape[0], nprobe)
                rb = min(recover_blocks or max(1, nblocks_local // 4), nblocks_local)
                rp = recover_passes or self._src_index._auto_recover_passes(
                    queries.shape[0], nprobe, rq)
            vals, ids, ncand, spill = self._search_cm_jit(
                queries, self._centroids, c_norms,
                a["vectors_t"], a["vectors_c"], a["crow_map"], a["reorder_c"],
                a["bc"], a["bf"], a["bl"], a["rv"],
                a["lb"], a["norms_pad"], a["cluster_shard"], a["sizes"],
                k, nprobe, qcap or self._auto_qcap(queries.shape[0], nprobe),
                rq, rb, rp, engine,
            )
            self.last_spill = spill[0]
            self.last_engine = engine
            return vals, ids, ncand
        self._ensure_query_state()
        qa = self._qm_arrays
        pc = probe_chunk or self._auto_probe_chunk(queries.shape[0])
        v_norms = qa.get("vector_norms") if self.metric == "l2" else jnp.zeros(())
        return self._search_jit(
            queries, self._centroids, c_norms, qa["vectors"], v_norms,
            qa["offs"], qa["sizes"], qa["reorder"],
            k, nprobe, pc,
        )

    def search(self, queries: np.ndarray, k: int, nprobe: int = 16,
               batch_size: int | None = None, mode: str = "query",
               engine: str = "auto"):
        """Host API → (ids [Q,k] i32, scores [Q,k] f32, avg_candidates float)."""
        queries = np.asarray(queries, dtype=np.float32)
        nq = queries.shape[0]
        bs = batch_size or nq
        ids_out = np.empty((nq, k), dtype=np.int32)
        scores_out = np.empty((nq, k), dtype=np.float32)
        total_cand = 0
        for start in range(0, nq, bs):
            chunk = queries[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            vals, ids, ncand = self.search_device(jnp.asarray(chunk), k, nprobe,
                                                  mode=mode, engine=engine)
            got = bs - pad
            ids_out[start : start + got] = np.asarray(ids)[:got]
            scores_out[start : start + got] = np.asarray(vals)[:got]
            total_cand += int(np.asarray(ncand)[:got].sum())
        return ids_out, scores_out, total_cand / nq
