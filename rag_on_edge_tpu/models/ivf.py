"""IVF (inverted-file) approximate k-NN index, TPU-native.

Rebuilds the reference's IVF vertical slice (``qidk_ivf/``):

- **Build** (``prepare/create_ivf_model*.py``): k-means on the MXU
  (:mod:`rag_on_edge_tpu.models.kmeans`), then the **reordered
  cluster-contiguous layout** as the primary (and only) storage format —
  the reference's fast mode (``create_ivf_model_reordered.py:110-117``),
  where each cluster is a contiguous slab of rows and results map back
  through ``reorder_to_original``.  Scattered CSR-gather mode is not
  rebuilt: the reference data shows reordering exists precisely because
  scattered gathers were the bottleneck (``IVFIndex.cpp:675-686`` vs
  ``786-794``), and contiguous slabs are the natural TPU layout.

- **Search** (``android/.../jni/IVFIndex.cpp:640-859``): coarse centroid
  GEMM → top-nprobe (NPU + nth_element in the reference) and the fine scan
  (NEON dot products + OpenMP threads in the reference) become one jitted
  program: coarse scores [B, nlist] on the MXU, ``lax.top_k`` for probes,
  then a ``lax.scan`` over probe chunks that gathers cluster slabs,
  scores them, and carries a running on-device top-k.  Ragged cluster
  sizes are handled with static max-size padding + -inf masking
  (the ``max_cluster_size`` padding strategy of
  ``create_fine_search_model.py:10-13``).

- **Artifacts** (``ivf_config.json`` + npy set, SURVEY §2.3): saved/loaded
  with the same inventory so indexes are inspectable with plain numpy.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.models import kmeans as kmeans_mod
from rag_on_edge_tpu.ops import distances, quantize, topk
from rag_on_edge_tpu.ops import pallas_bruteforce as pallas_bf
from rag_on_edge_tpu.ops import pallas_ivf
from rag_on_edge_tpu.ops import pallas_ivf_dma
from rag_on_edge_tpu.ops import pallas_topk

__all__ = ["IVFIndex", "fine_scan", "invert_probes", "coarse_tier",
           "coarse_arrays_host", "coarse_probes_tiered"]

_NEG_INF = float("-inf")

# Coarse probing tiers by nlist (measured, SIFT-1M B=8192 real chip):
# small nlist rides fp32 XLA GEMM + small_topk; the mid window uses a
# bf16 GEMM (one MXU pass vs fp32-HIGHEST's six; probe selection is a
# partition, not a ranking — a near-tie flip swaps similar-mass
# clusters, measured recall-neutral) which beat both the fp32 path
# (-3 ms) and the fused Pallas kernel (-6 ms, grid too small to
# amortize); the fused brute-force kernel takes over once the centroid
# matrix is big enough to tile well.  Shared by the single-chip
# :meth:`IVFIndex._coarse_probes` and both sharded paths
# (parallel/sharded.py) so the tiers cannot drift.
COARSE_BF16_MIN_NLIST = 512
COARSE_FUSED_MIN_NLIST = 8192


def coarse_tier(nlist: int, *, bf16_min: int | None = None,
                fused_min: int | None = None) -> str:
    """Resolve the measured coarse-probing tier for an nlist.  The
    thresholds default to the module constants; ``IVFIndex`` passes its
    class attributes so tests can lower them to force a tier."""
    if nlist >= (fused_min if fused_min is not None else COARSE_FUSED_MIN_NLIST):
        return "fused"
    if nlist >= (bf16_min if bf16_min is not None else COARSE_BF16_MIN_NLIST):
        return "bf16"
    return "fp32"


def coarse_arrays_host(centroids: np.ndarray, coarse_metric: str,
                       tier: str) -> tuple[np.ndarray, np.ndarray | None]:
    """Tier-appropriate host centroid arrays ``(cents, c_norms)``.

    - "fused": centroids transposed, L2 folded in by augmenting a
      ``-0.5·‖c‖²`` row (ranking-equivalent); norms not needed (None).
    - "bf16": bf16 centroid matrix + fp32 norms (L2 only).
    - "fp32": fp32 centroids + norms (L2 only).
    """
    c = np.asarray(centroids, dtype=np.float32)
    if tier == "fused":
        ct = c.T
        if coarse_metric == "l2":
            ct = np.concatenate(
                [ct, -0.5 * np.sum(ct * ct, axis=0, keepdims=True)], axis=0
            )
        return np.ascontiguousarray(ct), None
    norms = np.sum(c * c, axis=1) if coarse_metric == "l2" else None
    if tier == "bf16":
        return c.astype(jnp.bfloat16), norms
    return c, norms


def coarse_probes_tiered(q: jax.Array, cents: jax.Array,
                         c_norms: jax.Array | None, nprobe: int, *,
                         tier: str, coarse_metric: str) -> jax.Array:
    """STAGE 1 — coarse centroid scoring on the MXU (the reference's NPU
    centroid GEMM, IVFIndex.cpp:653-657) + top-nprobe (nth_element,
    IVFIndex.cpp:711-712), over the tier layout of
    :func:`coarse_arrays_host`.  Large nlist uses the fused brute-force
    kernel (centroid search IS a small brute-force search); ranking under
    L2 rides the augmentation trick, and only probe ids are consumed
    downstream, so values never need un-augmenting.  Safe inside
    ``shard_map`` bodies (pure per-shard compute on replicated inputs)."""
    if tier == "fused":
        qx = q
        if coarse_metric == "l2":
            qx = jnp.concatenate(
                [qx, jnp.ones((qx.shape[0], 1), qx.dtype)], axis=1)
        _, probes = pallas_bf.fused_topk_matmul(qx, cents, nprobe)
        return probes
    if tier == "bf16":
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), cents,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if coarse_metric == "l2":
            s = 2.0 * s - c_norms[None, :]
        return topk.small_topk(s, nprobe)[1]
    s = distances.score_matrix(
        q, cents, metric=coarse_metric, base_norms=c_norms)
    return topk.small_topk(s, nprobe)[1]


def invert_probes(probes: jax.Array, nlist: int, qcap: int):
    """Invert the query→cluster probe map into cluster→query lists.

    The TPU-native dispatch for cluster-major IVF execution — exactly the
    MoE token-routing problem (queries = tokens, clusters = experts,
    nprobe = top-k routing) and solved the same way: sort by destination,
    rank within segment, scatter into a fixed-capacity table.  Pairs beyond
    a cluster's capacity are dropped (the MoE "capacity factor" trade) and
    counted, so callers can size ``qcap`` for zero spill.

    probes: [B, P] int32 cluster ids (distinct within a row).
    Returns (cluster_queries [nlist, qcap] int32 query index or -1,
             slot [B, P] int32 slot within the cluster's list or -1 if
             dropped,
             spill count — scalar int32).
    """
    b, p = probes.shape
    flat_c = probes.reshape(-1)
    flat_q = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    order = jnp.argsort(flat_c, stable=True)
    c_s = flat_c[order]
    q_s = flat_q[order]
    counts = jnp.bincount(flat_c, length=nlist)
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(b * p, dtype=jnp.int32) - starts[c_s].astype(jnp.int32)

    cluster_queries = jnp.full((nlist, qcap), -1, dtype=jnp.int32)
    cluster_queries = cluster_queries.at[c_s, rank].set(q_s, mode="drop")
    kept = rank < qcap
    slot_sorted = jnp.where(kept, rank, -1)
    slot = jnp.zeros(b * p, jnp.int32).at[order].set(slot_sorted).reshape(b, p)
    return cluster_queries, slot, jnp.sum(~kept).astype(jnp.int32)


def fine_scan(
    q: jax.Array,
    vectors: jax.Array,
    vector_norms: jax.Array | None,
    p_offs: jax.Array,
    p_sizes: jax.Array,
    k: int,
    probe_chunk: int,
    metric: str,
    max_cluster_size: int,
    compute_dtype=None,
    row_map: jax.Array | None = None,
):
    """Scan probed cluster slabs with a running on-device top-k.

    The functional core of IVF STAGE 2 (reference NEON scan + heaps,
    ``IVFIndex.cpp:738-779``), shared by the single-chip and mesh-sharded
    paths.

    q: [B, D] f32 queries. vectors: [N, D] cluster-contiguous slabs — or,
    when ``row_map`` is given, an UNPADDED fp32 array reached through it:
    ``row_map`` maps padded rows to rows of ``vectors`` (-1 for padding
    rows, clipped; their scores are masked by validity anyway).  The
    indirection lets the device hold one unpadded original-order fp32
    copy instead of a block-padded one (2.4x padding at pad_block=2048).
    p_offs/p_sizes: [B, P] i32 start row / size per probed cluster (size 0 =
    empty sentinel — used for probe padding and non-owned clusters on
    sharded meshes). Returns (vals [B, k] f32, rows [B, k] i32 — PADDED
    row indices in both forms; rows for -inf slots are meaningless).

    SCALING LIMIT: the slab gather is padded to ``max_cluster_size`` —
    every probe costs O(B · S_max · D) regardless of the probed cluster's
    actual size, so ONE mega-cluster inflates every probe of every query.
    Fine at 1M/nlist=1024 (balanced k-means cells); at larger scales or
    skewed data prefer mode="cluster" (the cluster-major MoE dispatch
    walks real blocks only and its cost tracks the probed MASS, not the
    max).  This query-major path is kept for its low-latency small-batch
    shape, where the padded gather is one fused program.
    """
    b = q.shape[0]
    n_rows = row_map.shape[0] if row_map is not None else vectors.shape[0]
    nprobe = p_offs.shape[1]
    smax = max_cluster_size
    arange_s = jnp.arange(smax, dtype=jnp.int32)

    def chunk(carry, offs_c, sizes_c):
        best_v, best_i = carry
        rows = offs_c[..., None] + arange_s  # [B, pc, S]
        valid = arange_s[None, None, :] < sizes_c[..., None]
        rows = jnp.clip(rows, 0, n_rows - 1)
        if row_map is None:
            cand = vectors[rows]  # [B, pc, S, D] slab gather
        else:
            # padded row → original id (an int32 gather — noise next to
            # the [.., D] fp32 slab gather) → unpadded fp32 row.
            cand = vectors[jnp.clip(row_map[rows], 0)]
        qc = q
        if compute_dtype is not None:
            cand = cand.astype(compute_dtype)
            qc = q.astype(compute_dtype)
        prec = jax.lax.Precision.HIGHEST if compute_dtype is None else None
        scores = jnp.einsum(
            "bpsd,bd->bps", cand, qc,
            preferred_element_type=jnp.float32, precision=prec,
        )
        if metric == "l2":
            scores = 2.0 * scores - vector_norms[rows]
        scores = jnp.where(valid, scores, _NEG_INF)
        flat_scores = scores.reshape(b, -1)
        flat_rows = rows.reshape(b, -1)
        kk = min(k, flat_scores.shape[1])
        v, idx = jax.lax.top_k(flat_scores, kk)
        i = jnp.take_along_axis(flat_rows, idx, axis=1)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=_NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, k - kk)))
        return topk.merge_topk(best_v, best_i, v, i, k=k)

    pc = min(probe_chunk, nprobe)
    pad = (-nprobe) % pc
    if pad:
        p_offs = jnp.pad(p_offs, ((0, 0), (0, pad)))
        p_sizes = jnp.pad(p_sizes, ((0, 0), (0, pad)))
    n_chunks = (nprobe + pad) // pc

    init = (
        jnp.full((b, k), _NEG_INF, dtype=jnp.float32),
        jnp.zeros((b, k), dtype=jnp.int32),
    )
    if n_chunks == 1:
        return chunk(init, p_offs, p_sizes)
    xs = (
        p_offs.reshape(b, n_chunks, pc).swapaxes(0, 1),
        p_sizes.reshape(b, n_chunks, pc).swapaxes(0, 1),
    )
    out, _ = jax.lax.scan(lambda c, x: (chunk(c, x[0], x[1]), None), init, xs)
    return out


class IVFIndex:
    """IVF index with cluster-contiguous storage and on-device search.

    Construct via :meth:`build` or :meth:`load`.

    Two fine-scan execution strategies:

    - **query-major** (:meth:`_search_impl`): each query gathers its probed
      cluster slabs — lowest latency for small batches; bandwidth scales
      with B·nprobe·cluster_size.
    - **cluster-major** (:meth:`_search_cluster_major_impl`): the probe map
    is inverted (MoE-style dispatch, :func:`invert_probes`) and each
      probed cluster is scored once against *all* queries probing it — the
      slab read is amortized across the batch, so large batches approach
      one full-database read per batch regardless of B, with compute cut
      by nprobe/nlist vs brute force.
    """

    PAD_BLOCK_DEFAULT = 512  # cluster slabs padded to this row multiple
    CM_GROUP = 4  # blocks scored per grid step of the cluster-major kernel
    # Coarse probing tiers by nlist — module constants (shared with the
    # sharded paths); see :func:`coarse_tier` for the measured rationale.
    COARSE_BF16_MIN_NLIST = COARSE_BF16_MIN_NLIST
    COARSE_FUSED_MIN_NLIST = COARSE_FUSED_MIN_NLIST

    def __init__(
        self,
        centroids: np.ndarray,
        vectors_reordered: np.ndarray,
        cluster_offsets: np.ndarray,
        reorder_to_original: np.ndarray,
        metric: str = "ip",
        dtype: str = "fp32",
        coarse_metric: str = "l2",
        pad_block: int | None = None,
        store: str = "padded",
        config: dict | None = None,
    ):
        if metric not in ("ip", "l2"):
            raise ValueError(f"unknown metric {metric!r}")
        if coarse_metric not in ("ip", "l2"):
            raise ValueError(f"unknown coarse_metric {coarse_metric!r}")
        if dtype not in ("fp32", "bf16", "int8"):
            raise ValueError(
                f"unknown dtype {dtype!r} (fine scan supports fp32/bf16/int8)"
            )
        if store not in ("padded", "compact"):
            raise ValueError(f"unknown store {store!r} ('padded' | 'compact')")
        # Both stores keep fp32 UNPADDED in original order (reached through
        # the reorder map — the "dual padding" diet: no path pays the
        # block-padding tax, 1.23 GB → 512 MB on 1M at pad_block=2048).
        # "compact" additionally builds the cluster-major kernel state
        # EAGERLY and defaults mode to "cluster" — the 10M single-chip
        # serving configuration.
        self.store = store
        self.metric = metric
        # Cluster probing ranks centroids by L2 by default, independent of
        # the fine ranking metric: k-means partitions space into Voronoi
        # (L2) cells, so L2-nearest centroids are the cells most likely to
        # hold a query's neighbors.  Inner-product probing (the reference's
        # choice, IVFIndex.cpp coarse stage) only works when vector norms
        # are tightly concentrated (true-ish for real SIFT); on synthetic
        # data it collapses recall at low nprobe/nlist fractions.  Set
        # coarse_metric="ip" for strict reference behavior.
        self.coarse_metric = coarse_metric
        self.dtype = dtype
        self.nlist = int(centroids.shape[0])
        self.n, self.dim = vectors_reordered.shape
        sizes = np.diff(cluster_offsets).astype(np.int32)
        self.max_cluster_size = int(sizes.max())
        # Block size of the padded device layout.  Bigger blocks cost
        # padding rows (scanned then masked) but amortize the cluster-major
        # kernel's per-block fixed cost, which dominates on the relay
        # (measured on SIFT-1M int8 B=2048 nprobe=4: 512→92K, 1024→116K,
        # 2048→129K QPS); default 512 keeps small datasets lean — pass
        # pad_block=2048 for 1M-scale cluster-major serving.
        self.PAD_BLOCK = int(pad_block or (config or {}).get("pad_block")
                             or self.PAD_BLOCK_DEFAULT)
        self.max_cluster_padded = int(-(-self.max_cluster_size // self.PAD_BLOCK) * self.PAD_BLOCK)
        self.config = config or {}
        self.config.update(
            {
                "n_vectors": self.n,
                "n_clusters": self.nlist,
                "dim": self.dim,
                "reordered": True,
                "metric": metric,
                "coarse_metric": coarse_metric,
                "dtype": dtype,
                "pad_block": self.PAD_BLOCK,
                "cluster_size_min": int(sizes.min()),
                "cluster_size_avg": float(sizes.mean()),
                "cluster_size_max": int(sizes.max()),
            }
        )

        # Host copies for serialization (artifact set mirrors the reference).
        self._centroids_np = np.asarray(centroids, dtype=np.float32)
        self._vectors_np = np.asarray(vectors_reordered, dtype=np.float32)
        self._offsets_np = np.asarray(cluster_offsets, dtype=np.int32)
        self._reorder_np = np.asarray(reorder_to_original, dtype=np.int32)

        # Spilled (redundant) assignment: stored rows exceed distinct base
        # vectors when build(spill_eps=) duplicated boundary vectors into
        # their second cluster.  Search paths dedup by original id in the
        # rescore stage (see _rescore_rows), which is forced on for
        # spilled indexes.
        self.n_base = int(self._reorder_np.max()) + 1 if self.n else 0
        self.spilled = self.n > self.n_base
        self.config["n_vectors"] = self.n_base  # reference schema: base count
        self.config["n_rows_stored"] = self.n

        # Device layout: every cluster slab padded to a multiple of
        # PAD_BLOCK rows so slab starts are block-aligned (static-shape
        # friendly for both the gather fine scan and the cluster-major
        # kernel).  Padding rows are zero vectors, always masked by size.
        pb = self.PAD_BLOCK
        padded_sizes = -(-sizes // pb) * pb
        padded_offsets = np.zeros(self.nlist + 1, dtype=np.int64)
        np.cumsum(padded_sizes, out=padded_offsets[1:])
        self.n_padded = int(padded_offsets[-1])
        vec_padded = np.zeros((self.n_padded, self.dim), dtype=np.float32)
        reorder_padded = np.full(self.n_padded, -1, dtype=np.int32)
        for c in range(self.nlist):
            src0, src1 = int(cluster_offsets[c]), int(cluster_offsets[c + 1])
            dst0 = int(padded_offsets[c])
            vec_padded[dst0 : dst0 + (src1 - src0)] = self._vectors_np[src0:src1]
            reorder_padded[dst0 : dst0 + (src1 - src0)] = self._reorder_np[src0:src1]

        # Device-resident index state, passed to the jitted search fns as an
        # ARGUMENT (a closure would inline the whole database into the HLO
        # as a constant — megabytes-to-gigabytes of program).
        arrays: dict[str, jax.Array] = {
            "centroids": jnp.asarray(self._centroids_np),
            "offsets": jnp.asarray(padded_offsets[:-1].astype(np.int32)),
            "sizes": jnp.asarray(sizes),
            "reorder": jnp.asarray(reorder_padded),
        }
        # Unpadded, ORIGINAL-order fp32 — the ONE fp32 source on device for
        # both stores: rescoring and the query-major gather reach it
        # through the padded-row → original-id reorder map, so no path
        # pays the block-padding tax (2.4x fp32 padding at pad_block=2048
        # — 1.23 GB vs 512 MB on 1M; the round-2 "dual padding" lead).
        # Sized by DISTINCT base vectors: spilled copies collapse back
        # onto their one original row.  The block-padded fp32 copy is only
        # materialized lazily for the XLA cluster engine, whose contiguous
        # dynamic-slice slab walk cannot ride an indirection
        # (:meth:`_ensure_padded_f32`).
        orig = np.empty((self.n_base, self.dim), dtype=np.float32)
        orig[self._reorder_np] = self._vectors_np
        arrays["vectors_f32"] = jnp.asarray(orig)
        if coarse_metric == "l2":
            arrays["centroid_norms"] = distances.base_norms_sq(arrays["centroids"])
        if metric == "l2":
            # Padded-row norms: the kernel bias column (int8) and padded-row
            # rescoring both index by padded row id.  Host-computed so the
            # compact store never materializes padded fp32 on device.
            arrays["vector_norms"] = jnp.asarray(
                np.sum(vec_padded.astype(np.float32) ** 2, axis=1)
            )
        self._coarse_tier = coarse_tier(
            self.nlist, bf16_min=self.COARSE_BF16_MIN_NLIST,
            fused_min=self.COARSE_FUSED_MIN_NLIST)
        if self._coarse_tier != "fp32":
            # Tier layout (transposed+augmented fused matrix, or bf16
            # centroids) built by the shared helper — see coarse_tier().
            tc, _ = coarse_arrays_host(
                self._centroids_np, coarse_metric, self._coarse_tier)
            key = ("centroids_t" if self._coarse_tier == "fused"
                   else "centroids_bf16")
            arrays[key] = jnp.asarray(tc)
        self._arrays = arrays
        if store == "compact":
            self._build_kernel_state(vec_padded)
        del vec_padded

        self._search_jit = jax.jit(
            self._search_impl, static_argnames=("k", "nprobe", "probe_chunk", "rescore")
        )
        # Routing spill (dropped query-cluster pairs) of the most recent
        # cluster-major search: a device scalar, no sync until read.
        self.last_spill: jax.Array | None = None
        # Engine attribution of the most recent search_device call —
        # "auto" resolves per index layout, so benches record the actual
        # kernel ("pallas_accum" | "pallas" | "pallas_routed" | "xla").
        self.last_engine: str | None = None
        self.last_mode: str | None = None
        self._search_cm_jit = jax.jit(
            self._search_cluster_major_impl,
            static_argnames=("k", "nprobe", "qcap", "engine", "rescore",
                             "recover_qcap", "recover_blocks", "recover_passes",
                             "bin_depth", "rescore_k", "cluster_k"),
        )
        # Stream mode inherits the spilled-index rescore requirement (the
        # rescore stage is where duplicate copies dedup).
        stream_rescore = self.spilled
        self._stream_jit = jax.jit(
            lambda arrays, qq, k, nprobe, pc: jax.lax.map(
                lambda q: self._search_impl(arrays, q, k, nprobe, pc,
                                            rescore=stream_rescore), qq
            ),
            static_argnames=("k", "nprobe", "pc"),
        )

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        base: np.ndarray,
        nlist: int | None = None,
        metric: str = "ip",
        dtype: str = "fp32",
        coarse_metric: str = "l2",
        pad_block: int | None = None,
        store: str = "padded",
        seed: int = 42,
        max_iter: int = 100,
        kmeans_init: str = "kmeans++",
        kmeans_checkpoint: str | None = None,
        spill_eps: float = 0.0,
        centroids: np.ndarray | None = None,
    ) -> "IVFIndex":
        """Train the coarse quantizer and lay out clusters contiguously.

        kmeans_checkpoint: optional path for per-iteration Lloyd
        checkpointing (crash/relay-failure resume on long builds) —
        see :func:`rag_on_edge_tpu.models.kmeans.kmeans`.

        spill_eps: DB-side multi-probe (ScaNN-SOAR-style redundant
        assignment).  A vector whose second-nearest centroid is nearly as
        close as its nearest (``d2² ≤ (1+spill_eps)·d1²``) gets a SECOND
        copy in that second cluster: the neighbors that fixed-nprobe
        coarse probing misses are exactly the ones sitting just across a
        Voronoi boundary from the probed cell.  Costs the spill fraction
        in stored rows/scan mass; recall rises at UNCHANGED nprobe.
        Duplicate ids are removed on-device in the rescore stage (forced
        on for spilled indexes), so results never repeat an id.
        """
        base = np.asarray(base, dtype=np.float32)
        n = base.shape[0]
        nlist = kmeans_mod.default_nlist(n, nlist)
        if centroids is not None:
            # Pre-trained coarse quantizer: skip Lloyd entirely and assign
            # against the given centroids.  Centroids depend only on
            # (base, nlist, seed, init, max_iter) — NOT on dtype/metric/
            # pad_block/spill_eps — so a spill_eps sweep at 10M reuses one
            # ~25-min k-means run instead of re-paying it per variant
            # (``build_or_load_index`` persists/reloads the artifact).
            centroids = np.asarray(centroids, dtype=np.float32)
            if centroids.shape != (nlist, base.shape[1]):
                raise ValueError(
                    f"centroids shape {centroids.shape} != "
                    f"({nlist}, {base.shape[1]})"
                )
            # spill_eps > 0 recomputes the primary assignment below anyway
            # (assign_top2); only the spill-free path needs one here.
            assign = (None if spill_eps > 0.0 else
                      np.asarray(kmeans_mod.assign_clusters(
                          jnp.asarray(base), jnp.asarray(centroids))))
        else:
            centroids, assign = kmeans_mod.kmeans(
                base, nlist, seed=seed, max_iter=max_iter, init=kmeans_init,
                checkpoint=kmeans_checkpoint)

        # Row inventory: every base vector once, plus (optionally) spilled
        # second copies of boundary vectors.
        ids_all = np.arange(n, dtype=np.int64)
        cl_all = None if assign is None else assign.astype(np.int64)
        n_spilled = 0
        if spill_eps > 0.0:
            # Primary AND spill assignments from the same snapshot (the
            # FINAL centroids).  Lloyd's returned `assign` is against the
            # penultimate centroids (assign-then-update); mixing it with
            # final-centroid a2 targets puts some spilled copies in the
            # vector's own cluster (pure waste) and leaves some boundary
            # vectors with no copy in their true nearest cell.  a1 is also
            # simply the better quantizer; a2 != a1 by construction.
            a1, a2, d1, d2 = kmeans_mod.assign_top2(base, centroids)
            cl_all = a1.astype(np.int64)
            boundary = np.where(d2 <= (1.0 + float(spill_eps)) * d1)[0]
            n_spilled = int(boundary.shape[0])
            ids_all = np.concatenate([ids_all, boundary])
            cl_all = np.concatenate([cl_all, a2[boundary].astype(np.int64)])

        # Stable sort by cluster id → contiguous slabs; the permuted source
        # ids are exactly the reorder_to_original map (reordered row r holds
        # original vector reorder_to_original[r], possibly more than once
        # when spilling), as in create_ivf_model_reordered.py.
        order = np.argsort(cl_all, kind="stable")
        vectors_reordered = base[ids_all[order]]
        counts = np.bincount(cl_all, minlength=nlist)
        offsets = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        # Measured probe-skew table (round 5): queries look like base
        # vectors, so a seeded base self-probe predicts the hottest-cell
        # probe fraction the recovery defaults must clear — per index,
        # not per formula (see measure_probe_skew).  Host-side, ~0.3 s.
        rng = np.random.default_rng(seed)
        take = min(8192, n)
        probe_skew = cls.measure_probe_skew(
            centroids, base[rng.choice(n, take, replace=False)],
            coarse_metric=coarse_metric)
        return cls(
            centroids,
            vectors_reordered,
            offsets.astype(np.int32),
            ids_all[order].astype(np.int32),
            metric=metric,
            dtype=dtype,
            coarse_metric=coarse_metric,
            pad_block=pad_block,
            store=store,
            config={"seed": seed, "kmeans_max_iter": max_iter,
                    "kmeans_init": kmeans_init,
                    "spill_eps": float(spill_eps), "n_spilled": n_spilled,
                    "probe_skew": probe_skew, "probe_skew_sample": int(take)},
        )

    # ------------------------------------------------------------- search impl

    def _rescore_rows(self, arrays, queries, vals, rows, k):
        """Exact fp32 re-ranking of candidate padded rows.

        Gathers ride flat ``jnp.take`` — measured 2.3x faster on TPU than
        2-D advanced indexing at this index count (the gather engine's
        per-index fixed cost dominates, ~40 ns vs ~80 ns) — and candidate
        norms are recomputed from the gathered rows (128 FLOPs) instead of
        a second 164K-index gather (milliseconds)."""
        b, kp = rows.shape
        # padded row → original id → unpadded fp32 row (padding rows map
        # to id -1 → clipped; masked by vals below).  Both stores rescore
        # from the unpadded original-order fp32 source.
        safe = jnp.clip(rows, 0, arrays["reorder"].shape[0] - 1)
        orig = jnp.clip(jnp.take(arrays["reorder"], safe.reshape(-1), axis=0), 0)
        cand = jnp.take(arrays["vectors_f32"], orig, axis=0).reshape(
            b, kp, -1)  # [B, k', D]
        scores = jnp.einsum(
            "bcd,bd->bc", cand, queries.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.metric == "l2":
            # Recomputed ‖b‖² of the gathered candidates (padding rows are
            # zero vectors → norm 0; they stay masked by vals below).
            scores = 2.0 * scores - jnp.sum(cand * cand, axis=-1)
        scores = jnp.where(vals > _NEG_INF, scores, _NEG_INF)
        if self.spilled:
            # Dedup by original id: a spilled vector can reach the pool
            # through BOTH of its clusters (ops/topk.dedup_rows_by_id —
            # the padded-row payload travels through the sort).
            scores, _, rows = topk.dedup_rows_by_id(
                scores, orig.reshape(b, kp), payload=rows
            )
        best_v, sel = topk.small_topk(scores, k)
        return best_v, jnp.take_along_axis(rows, sel, axis=1)

    def _coarse_probes(self, arrays, q: jax.Array, nprobe: int) -> jax.Array:
        """STAGE 1 — tiered coarse probing (:func:`coarse_probes_tiered`),
        dispatching on which tier layout ``arrays`` carries."""
        if "centroids_t" in arrays:
            return coarse_probes_tiered(
                q, arrays["centroids_t"], None, nprobe,
                tier="fused", coarse_metric=self.coarse_metric)
        if "centroids_bf16" in arrays:
            return coarse_probes_tiered(
                q, arrays["centroids_bf16"], arrays.get("centroid_norms"),
                nprobe, tier="bf16", coarse_metric=self.coarse_metric)
        return coarse_probes_tiered(
            q, arrays["centroids"], arrays.get("centroid_norms"),
            nprobe, tier="fp32", coarse_metric=self.coarse_metric)

    def _search_impl(self, arrays, queries: jax.Array, k: int, nprobe: int,
                     probe_chunk: int, rescore: bool = False):
        """Returns (scores [B,k] f32, ids [B,k] i32, n_candidates [B] i32)."""
        kk = min(2 * k, self.n) if rescore else k
        q = queries.astype(jnp.float32)
        nprobe = min(nprobe, self.nlist)

        probes = self._coarse_probes(arrays, q, nprobe)  # [B, P]
        p_offs = arrays["offsets"][probes]
        p_sizes = arrays["sizes"][probes]
        n_candidates = jnp.sum(p_sizes, axis=1)

        # STAGE 2 — fine scan over cluster slabs with a running top-k
        # (reference NEON scan + heaps, IVFIndex.cpp:738-779).
        best_v, best_i = fine_scan(
            q,
            arrays["vectors_f32"],
            arrays.get("vector_norms"),
            p_offs,
            p_sizes,
            k=kk,
            probe_chunk=probe_chunk,
            metric=self.metric,
            max_cluster_size=self.max_cluster_size,
            compute_dtype=jnp.bfloat16 if self.dtype == "bf16" else None,
            row_map=arrays["reorder"],
        )
        if rescore:
            best_v, best_i = self._rescore_rows(arrays, q, best_v, best_i, k)

        # Map reordered rows back to original ids (IVFIndex.cpp:778).
        ids = jnp.where(best_v > _NEG_INF, arrays["reorder"][best_i], -1)
        return best_v, ids.astype(jnp.int32), n_candidates.astype(jnp.int32)

    def _vec_padded_host(self) -> np.ndarray:
        """Rebuild the block-padded fp32 layout on the HOST from the
        serialization copies (the padded copy is no longer device-resident
        by default — see ``vectors_f32`` in ``__init__``)."""
        pb = self.PAD_BLOCK
        sizes = np.diff(self._offsets_np).astype(np.int64)
        padded_offsets = np.zeros(self.nlist + 1, dtype=np.int64)
        np.cumsum(-(-sizes // pb) * pb, out=padded_offsets[1:])
        vec = np.zeros((int(padded_offsets[-1]), self.dim), dtype=np.float32)
        for c in range(self.nlist):
            s0, s1 = int(self._offsets_np[c]), int(self._offsets_np[c + 1])
            d0 = int(padded_offsets[c])
            vec[d0 : d0 + (s1 - s0)] = self._vectors_np[s0:s1]
        return vec

    def _ensure_padded_f32(self) -> None:
        """Materialize the block-padded fp32 copy on device for the XLA
        cluster engine (contiguous dynamic-slice slab walk).  Costs the
        2.4x-at-pad_block=2048 padding tax, so it is NOT built by default
        — only this engine pays it, on first use."""
        if "vectors" not in self._arrays:
            self._arrays["vectors"] = jnp.asarray(self._vec_padded_host())

    def _ensure_kernel_state(self) -> None:
        """Lazily add the cluster-major kernel's arrays (block-tiled slabs,
        block tables) to the index state.  The compact store builds them
        eagerly at construction."""
        if "vectors_t" in self._arrays:
            return
        self._build_kernel_state(self._vec_padded_host())

    def _build_kernel_state(self, vec: np.ndarray) -> None:
        """vec: [Npad, D] fp32 block-padded host array (consumed here)."""
        blk = self.PAD_BLOCK
        if self.dtype == "int8":
            # Symmetric per-tensor int8 (ops/quantize.py convention): the
            # slab read halves vs bf16 on the HBM-bound scan; L2 rides a
            # bias column at search time instead of the augmentation row
            # (whose magnitude D·127²/2 cannot live in int8).
            sb = max(float(np.abs(vec).max()), 1e-12) / 127.0
            self._base_scale = sb
            vec = np.clip(np.round(vec / sb), -127, 127).astype(np.int8)
        elif self.metric == "l2":
            # L2 via augmentation: b' = [b, -‖b‖²/2]; queries get a ones
            # column; the kernel stays metric-free (scores are l2_score/2).
            vec = np.concatenate(
                [vec, -0.5 * np.sum(vec * vec, axis=1, keepdims=True)], axis=1
            )
        # Block-tiled [nblocks, D', blk], padded to a CM_GROUP multiple with
        # dummy blocks (rows_valid 0, first/last 0 → pure no-ops): the
        # grouped kernel walks GROUP blocks per grid step.
        vec_t = np.ascontiguousarray(
            vec.reshape(-1, blk, vec.shape[1]).transpose(0, 2, 1)
        )
        bc, bf, bl, rv, lb = pallas_ivf.build_block_tables(
            np.asarray(self._arrays["offsets"]), np.asarray(self._arrays["sizes"]), blk
        )
        # Pad to a multiple of 8 (covers the grouped engine's CM_GROUP=4
        # and the accum engine's group=8, which also needs >= 8 blocks for
        # its DMA-ring warm-up).
        padg = (-vec_t.shape[0]) % max(self.CM_GROUP, 8)
        if padg:
            vec_t = np.pad(vec_t, ((0, padg), (0, 0), (0, 0)))
            # Dummy blocks attach to the LAST cluster (first=last=0, no
            # valid rows -> pure no-ops).  NOT cluster 0: the non-grouped
            # kernel's output window is indexed by bc[j], and Pallas
            # requires each output block be visited in one consecutive
            # run — zero-padded bc would revisit cluster 0's output after
            # its emit and flush stale scratch over the results (the
            # sharded path works around the same hazard, sharded.py
            # tables()).
            bc = np.pad(bc, (0, padg), constant_values=max(self.nlist - 1, 0))
            bf, bl, rv = (np.pad(x, (0, padg)) for x in (bf, bl, rv))
        if self.dtype == "bf16":
            vec_t = jnp.asarray(vec_t).astype(jnp.bfloat16)
        self._arrays["vectors_t"] = jnp.asarray(vec_t)
        self._arrays["block_cluster"] = jnp.asarray(bc)
        self._arrays["block_first"] = jnp.asarray(bf)
        self._arrays["block_last"] = jnp.asarray(bl)
        self._arrays["rows_valid"] = jnp.asarray(rv)
        self._arrays["last_block"] = jnp.asarray(lb)
        # Accum-engine eligibility: its packed key spends 4 bits on the
        # block-in-cluster code, capping clusters at CODE_MAX blocks.
        sizes = np.asarray(self._arrays["sizes"])
        self._cm_max_nb = int(np.max(-(-sizes // blk))) if len(sizes) else 0

    def _cm_recover(self, arrays, qi, probes, todo, bias, k: int,
                    qcap2: int, cap_blocks: int, engine: str,
                    bin_depth: int = 2):
        """Spilled-pair recovery: a second, SPARSE kernel pass over only the
        clusters that dropped routing pairs in the main pass.

        Spill concentrates in a few hot clusters (the MoE hot-expert
        problem), so the spilled pairs are re-inverted into a fresh routed
        table and the affected clusters' blocks are compacted into a short
        static-capacity block list (``cap_blocks``) that a second
        cluster-major scan walks via per-block ``row_base`` ids.  This keeps
        the main pass at a small, fast ``qcap`` while recovering the recall
        the reference-style fixed-capacity dispatch would lose — pairs the
        recovery itself cannot place (capacity or block budget) remain
        counted as residual spill.

        qi: the kernel-ready query batch of the main pass (quantized /
        augmented / padded exactly as the engine expects).
        todo: [B, P] bool — the pairs this pass must place (spilled by the
        main pass, or left over from a previous recovery pass).
        Returns (pv2 [cap_blocks, qcap2, k], pr2, slot2 [B, P],
        cluster_inc [nlist] bool — cluster fully covered by this pass,
        cluster_pos [nlist] i32 — row of its result in pv2).
        """
        bc_t = arrays["block_cluster"]
        lb = arrays["last_block"]
        # Re-invert only the todo pairs; the rest are routed to a
        # sentinel cluster whose table row is discarded.
        probes2 = jnp.where(todo, probes, self.nlist)
        cq2, slot2, _ = invert_probes(probes2, self.nlist + 1, qcap2)
        cq2 = cq2[: self.nlist]

        # Compact the active clusters' blocks (stable order keeps each
        # cluster's blocks consecutive, so inclusion is all-or-prefix and
        # a cluster is fully covered iff its LAST block made the cut).
        active_c = cq2[:, 0] >= 0
        active_b = active_c[bc_t] & (arrays["rows_valid"] > 0)
        rank = jnp.cumsum(active_b.astype(jnp.int32)) - 1
        order = jnp.argsort(~active_b, stable=True).astype(jnp.int32)
        blocks_list = order[:cap_blocks]
        inc_b = active_b & (rank < cap_blocks)
        inc_list = inc_b[blocks_list]
        cluster_pos = jnp.clip(rank[lb], 0, cap_blocks - 1)
        cluster_inc = active_c & inc_b[lb]

        blk = self.PAD_BLOCK
        vec2 = arrays["vectors_t"][blocks_list]
        rv2 = jnp.where(inc_list, arrays["rows_valid"][blocks_list], 0)
        bf2 = jnp.where(inc_list, arrays["block_first"][blocks_list], 0)
        bl2 = jnp.where(inc_list, arrays["block_last"][blocks_list], 0)
        rb2 = blocks_list * blk
        bias2 = bias[blocks_list] if bias is not None else None
        if engine == "pallas_routed":
            cqb2 = cq2[bc_t[blocks_list]][..., None]
            pv2, pr2 = pallas_ivf.cluster_major_scan_routed(
                qi, cqb2, vec2, bf2, bl2, rv2,
                k=k, blk=blk, group=self.CM_GROUP, bias=bias2, row_base=rb2,
                bin_depth=bin_depth,
            )
        else:
            routed2 = (cq2 >= 0)[..., None]
            qk2 = jnp.where(routed2, qi[jnp.clip(cq2, 0)], jnp.zeros((), qi.dtype))
            qb2 = qk2[bc_t[blocks_list]]
            pv2, pr2 = pallas_ivf.cluster_major_scan_grouped(
                qb2, vec2, bf2, bl2, rv2,
                k=k, blk=blk, group=self.CM_GROUP, bias=bias2, row_base=rb2,
                bin_depth=bin_depth,
            )
        return pv2, pr2, slot2, cluster_inc, cluster_pos

    def _search_cluster_major_impl(self, arrays, queries: jax.Array, k: int,
                                   nprobe: int, qcap: int, engine: str = "xla",
                                   rescore: bool = False, recover_qcap: int = 0,
                                   recover_blocks: int = 0,
                                   recover_passes: int = 1,
                                   bin_depth: int = 2,
                                   rescore_k: int = 0,
                                   cluster_k: int = 0):
        """Cluster-major search (see class docstring).

        Returns (scores [B,k] f32, ids [B,k] i32, n_candidates [B] i32,
        spill i32).  Exact within the probed set when spill == 0 (and, for
        quantized scans, when ``rescore`` re-ranks 2k candidates in fp32).
        ``recover_qcap``/``recover_blocks`` > 0 enable the spilled-pair
        recovery pass (:meth:`_cm_recover`, pallas engines only); the
        returned spill is then the residual after recovery.
        """
        kk = min(rescore_k or 2 * k, self.n) if rescore else k
        # Per-cluster emit depth: a query's neighbors split across its
        # nprobe probed clusters, so each cluster only needs to surrender
        # its top few per query — the join pool (nprobe·ck wide) still
        # contains the true top-kk with high probability, and the kernel's
        # per-cluster extract cost scales with ck (measured: the extract is
        # most of the accum kernel's per-block time at kk=20).
        ck = min(cluster_k, kk) if cluster_k else kk
        q = queries.astype(jnp.float32)
        b = q.shape[0]
        nprobe = min(nprobe, self.nlist)
        smax = self.max_cluster_padded

        # STAGE 1 — coarse centroid scores + top-nprobe (as query-major).
        probes = self._coarse_probes(arrays, q, nprobe)  # [B, P]
        n_candidates = jnp.sum(arrays["sizes"][probes], axis=1)

        # STAGE 2 — invert the probe map (MoE-style dispatch) and gather
        # each cluster's probing queries into a dense [nlist, qcap, D].
        cq, slot, _ = invert_probes(probes, self.nlist, qcap)
        routed = (cq >= 0)[..., None]
        # A dropped pair loses candidates only if its cluster has any; pairs
        # probing empty clusters are not spill (and are unrecoverable by
        # construction — an empty cluster has no blocks to rescan).
        lossy = (slot < 0) & (arrays["sizes"][probes] > 0)
        spill = jnp.sum(lossy).astype(jnp.int32)

        # STAGE 3 — score each cluster's slab against its routed queries.
        if engine in ("pallas", "pallas_routed", "pallas_accum"):
            nblocks = arrays["vectors_t"].shape[0]
            alpha, bias = None, None
            if self.dtype == "int8":
                # Symmetric int8 queries (per-batch scale, gathered AFTER
                # quantization — the routed table is 8x smaller than fp32).
                sq = quantize.calibrate_scale(q)
                qi = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
                alpha = sq * jnp.float32(self._base_scale)
                if self.metric == "l2":
                    # l2 = 2·sq·sb·dots − ‖b‖²; per-row ranking is invariant
                    # to the positive 2·sq·sb, so fold norms into a bias
                    # column and rescale the selected values afterwards.
                    alpha = 2.0 * alpha
                    norms = arrays["vector_norms"]
                    pad = nblocks * self.PAD_BLOCK - norms.shape[0]
                    if pad:
                        norms = jnp.pad(norms, (0, pad))
                    bias = (norms / alpha).reshape(nblocks, 1, self.PAD_BLOCK)
            else:
                qi = q
                if self.metric == "l2":
                    qi = jnp.concatenate(
                        [qi, jnp.ones((b, 1), qi.dtype)], axis=-1
                    )
                qi = qi.astype(arrays["vectors_t"].dtype)
            if engine == "pallas_routed":
                # In-kernel one-hot routing: the batch stays VMEM-resident;
                # no [nblocks, qcap, D] routed table ever exists in HBM.
                cqb = cq[arrays["block_cluster"]][..., None]
                pad_b = (-b) % 128
                if pad_b:
                    qi = jnp.pad(qi, ((0, pad_b), (0, 0)))
                pv, pr = pallas_ivf.cluster_major_scan_routed(
                    qi, cqb, arrays["vectors_t"],
                    arrays["block_first"], arrays["block_last"],
                    arrays["rows_valid"],
                    k=ck, blk=self.PAD_BLOCK, group=self.CM_GROUP, bias=bias,
                    bin_depth=bin_depth,
                )
            else:
                qk = jnp.where(routed, qi[jnp.clip(cq, 0)], jnp.zeros((), qi.dtype))
                # Per-block routed queries: an extra gather, but it buys
                # the grouped kernel fully regular index maps.
                qb = qk[arrays["block_cluster"]]  # [nblocks, qcap, D']
                if engine == "pallas_accum":
                    # Planes emit: the kernel returns RAW packed bin planes
                    # (no in-kernel top-k at all — chip-measured, the
                    # extract emit burned the accum design's win at one
                    # block per cluster); selection + row decode happen in
                    # _cm_finish_planes over the joined pool.
                    bias_rows = None
                    if bias is not None:
                        # Pre-shifted planes pack: (round(norms/alpha)<<8)
                        # - ((code(t)<<4) | cid(col)); padding is handled
                        # by the kernel's rows_valid mask (_KMIN sentinel).
                        cmax = pallas_ivf_dma.CODE_MAX
                        code = jnp.int32(cmax - 1) - (
                            jnp.arange(nblocks, dtype=jnp.int32) % cmax)
                        cidc = jnp.arange(self.PAD_BLOCK, dtype=jnp.int32) >> 7
                        pack = (jax.lax.shift_left(code, 4)[:, None]
                                | cidc[None, :])  # [nblocks, blk]
                        # |bias| < 2^21 keeps (bias<<8) in int32; SIFT-scale
                        # norms/alpha ≈ 2^20 — extreme-norm rows clip and
                        # rank pessimistically until the fp32 rescore.
                        br = jnp.clip(
                            jnp.round(bias), -(2.0**21), 2.0**21
                        ).astype(jnp.int32)
                        bias_rows = (jax.lax.shift_left(br, 8)
                                     - pack[:, None, :])
                    pp = pallas_ivf_dma.cluster_major_accum_planes(
                        qb, arrays["vectors_t"],
                        arrays["block_first"], arrays["block_last"],
                        arrays["rows_valid"],
                        blk=self.PAD_BLOCK, group=8,
                        depth=4 if arrays["vectors_t"].dtype == jnp.float32
                        else 8,
                        bin2=bin_depth >= 2, bias_rows=bias_rows,
                    )
                    pv = pr = None
                else:
                    pv, pr = pallas_ivf.cluster_major_scan_grouped(
                        qb, arrays["vectors_t"],
                        arrays["block_first"], arrays["block_last"],
                        arrays["rows_valid"],
                        k=ck, blk=self.PAD_BLOCK, group=self.CM_GROUP, bias=bias,
                        bin_depth=bin_depth,
                    )
            extra = None
            if recover_qcap and recover_blocks:
                # One recovery pass per iteration; each re-invers only the
                # pairs still unplaced, so successive passes drain heavier
                # spill (very large batches at high nprobe overflow a
                # single pass's capacity).
                ev, er = [], []
                todo = lossy
                for _ in range(recover_passes):
                    pv2, pr2, slot2, cluster_inc, cluster_pos = self._cm_recover(
                        arrays, qi, probes, todo, bias,
                        k=ck, qcap2=recover_qcap, cap_blocks=recover_blocks,
                        # The accum kernel is dense-walk only (its packed
                        # block code assumes row_base == t*blk); the sparse
                        # compacted recovery walk uses the grouped kernel.
                        engine="pallas" if engine == "pallas_accum" else engine,
                        bin_depth=bin_depth,
                    )
                    if alpha is not None:
                        pv2 = alpha * pv2
                    elif self.metric == "l2":
                        pv2 = 2.0 * pv2
                    placed = (slot2 >= 0) & cluster_inc[probes]
                    ok2 = todo & placed  # todo already implies sizes > 0
                    row2 = cluster_pos[probes]
                    sl2 = jnp.clip(slot2, 0)
                    flat2 = (row2 * pv2.shape[1] + sl2).reshape(-1)
                    gv2 = jnp.take(pv2.reshape(-1, ck), flat2, axis=0
                                   ).reshape(b, -1, ck)
                    gr2 = jnp.take(pr2.reshape(-1, ck), flat2, axis=0
                                   ).reshape(b, -1, ck)
                    ev.append(jnp.where(ok2[..., None], gv2, _NEG_INF)
                              .reshape(b, -1))
                    er.append(gr2.reshape(b, -1))
                    todo = todo & ~placed
                extra = (jnp.concatenate(ev, axis=1), jnp.concatenate(er, axis=1))
                spill = jnp.sum(todo).astype(jnp.int32)
            if engine == "pallas_accum":
                return self._cm_finish_planes(
                    arrays, queries, probes, slot, pp, k, kk, rescore,
                    n_candidates, spill, alpha, extra=extra,
                )
            if alpha is not None:
                pv = alpha * pv  # back to true-score units (−inf stays −inf)
            elif self.metric == "l2":
                pv = 2.0 * pv  # augmented scores are l2_score/2
            return self._cm_finish(
                arrays, queries, probes, slot, pv, pr, k, kk, rescore,
                n_candidates, spill, block_map=arrays["last_block"],
                extra=extra,
            )

        # XLA fallback: lax.scan over clusters with max-size dynamic slices.
        # Always scans the fp32 slabs (int8 is a pallas-engine layout).
        qg = jnp.where(routed, q[jnp.clip(cq, 0)], 0.0)
        arange_s = jnp.arange(smax, dtype=jnp.int32)

        vectors = arrays["vectors"]

        n_pad_rows = vectors.shape[0]

        def per_cluster(_, xs):
            boff, size, qg_c, cq_c = xs
            # dynamic_slice CLAMPS an out-of-range start (boff + smax can
            # exceed the array for every cluster within smax rows of the
            # end) — derive rows/validity from the CLAMPED start, or the
            # scores come from earlier clusters' vectors while the row
            # labels claim this cluster's.  The cluster's true extent
            # always fits the clamped window (size <= smax).
            start = jnp.minimum(boff, jnp.int32(max(n_pad_rows - smax, 0)))
            slab = jax.lax.dynamic_slice(
                vectors, (start, jnp.int32(0)), (smax, self.dim)
            )  # [S, D]
            scores = jax.lax.dot_general(
                qg_c, slab, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
                if slab.dtype == jnp.float32 else None,
            )  # [qcap, S]
            rows = start + arange_s
            if self.metric == "l2":
                norms = jax.lax.dynamic_slice(arrays["vector_norms"], (start,), (smax,))
                scores = 2.0 * scores - norms[None, :]
            off = rows - boff
            valid = ((off >= 0) & (off < size))[None, :] & (cq_c >= 0)[:, None]
            scores = jnp.where(valid, scores, _NEG_INF)
            kc = min(ck, smax)
            v, idx = topk.iterative_topk(scores, kc)
            r = rows[idx]
            if kc < ck:
                v = jnp.pad(v, ((0, 0), (0, ck - kc)), constant_values=_NEG_INF)
                r = jnp.pad(r, ((0, 0), (0, ck - kc)))
            return None, (v, r)

        _, (pv, pr) = jax.lax.scan(
            per_cluster,
            None,
            (arrays["offsets"], arrays["sizes"], qg, cq),
        )  # pv/pr: [nlist, qcap, kk]
        return self._cm_finish(
            arrays, queries, probes, slot, pv, pr, k, kk, rescore,
            n_candidates, spill,
        )

    def _cm_finish(self, arrays, queries, probes, slot, pv, pr, k, kk, rescore,
                   n_candidates, spill, block_map=None, extra=None):
        """STAGE 4 — per query, gather its (cluster, slot) partials,
        re-select (optionally fp32-rescoring the kk candidates), and map
        padded rows back to original ids.

        block_map: per-cluster row into pv/pr when the kernel emits
        per-BLOCK outputs (grouped engine: each cluster's result lives at
        its last block); None when pv is indexed by cluster (XLA engine).
        extra: optional (vals [B, E], rows [B, E]) additional candidates
        (the spilled-pair recovery pass), joined before re-selection."""
        b = probes.shape[0]
        rows = probes if block_map is None else block_map[probes]
        # Empty probed clusters have no blocks, so the pallas engine never
        # writes their output rows — exclude them (alongside spilled pairs)
        # or the join would read uninitialized memory.
        ok = (slot >= 0) & (arrays["sizes"][probes] > 0)
        sl = jnp.clip(slot, 0)
        # Flat-take join: one fused (row, slot) index per pair instead of a
        # 2-D advanced-index gather (2.3x per-index cost on TPU).
        qcap_pv, ck = pv.shape[1], pv.shape[2]
        flat = (rows * qcap_pv + sl).reshape(-1)
        gv = jnp.take(pv.reshape(-1, ck), flat, axis=0).reshape(b, -1, ck)
        gr = jnp.take(pr.reshape(-1, ck), flat, axis=0).reshape(b, -1, ck)
        gv = jnp.where(ok[..., None], gv, _NEG_INF).reshape(b, -1)
        gr = gr.reshape(b, -1)
        if extra is not None:
            gv = jnp.concatenate([gv, extra[0]], axis=1)
            gr = jnp.concatenate([gr, extra[1]], axis=1)
        best_v, sel = topk.small_topk(gv, min(kk, gv.shape[1]))
        best_r = jnp.take_along_axis(gr, sel, axis=1)
        if rescore:
            best_v, best_r = self._rescore_rows(arrays, queries, best_v, best_r, k)
        else:
            best_v, best_r = best_v[:, :k], best_r[:, :k]
        ids = jnp.where(
            best_v > _NEG_INF,
            jnp.take(arrays["reorder"], best_r.reshape(-1), axis=0
                     ).reshape(best_r.shape),
            -1,
        )
        return best_v, ids.astype(jnp.int32), n_candidates.astype(jnp.int32), spill

    def _cm_finish_planes(self, arrays, queries, probes, slot, pp, k, kk,
                          rescore, n_candidates, spill, alpha, extra=None):
        """STAGE 4 for the planes-emit accum engine: gather each query's
        (cluster, slot) packed planes, top-kk the joined pool, decode rows
        from the keys, then rescore/map like :meth:`_cm_finish`.

        pp: [nblocks, qcap, W] packed i32 planes (W = bin planes · 128);
        key = (score << 8) | (code << 4) | cid, _KMIN = invalid.  The pool
        per (query, probe) is every per-bin top-``planes`` candidate — a
        strict superset of any in-kernel top-k emit, selected here where
        kk max-passes over [B, nprobe·W] cost microseconds."""
        b = probes.shape[0]
        blk = self.PAD_BLOCK
        cmax = pallas_ivf_dma.CODE_MAX
        kmin = jnp.int32(pallas_ivf_dma.KMIN)
        qcap_pv, w = pp.shape[1], pp.shape[2]
        tl = arrays["last_block"][probes]  # [b, P]
        ok = (slot >= 0) & (arrays["sizes"][probes] > 0)
        sl = jnp.clip(slot, 0)
        flat = (tl * qcap_pv + sl).reshape(-1)
        gp = jnp.take(pp.reshape(-1, w), flat, axis=0).reshape(b, -1, w)
        gp = jnp.where(ok[..., None], gp, kmin)
        pool = gp.shape[1] * w
        # VMEM-resident selection: XLA's pass-per-max loop re-reads the
        # [B, pool] matrix from HBM every pass (24.6 ms at [32K, 1024];
        # the fused kernel reads it once).  Below ~8M pool entries the
        # matrix fits cache-side traffic and XLA is cheaper (chip-measured
        # crossover: B=2048 273K vs 214K QPS, B=8192 equal, B=32K
        # 484K vs 378K).
        if b * pool >= 8 << 20:
            vals_p, sel = pallas_topk.fused_topk(
                gp.reshape(b, pool), min(kk, pool))
        else:
            vals_p, sel = topk.small_topk(gp.reshape(b, pool), min(kk, pool))
        valid = vals_p > kmin
        # Row decode (see cluster_major_accum_planes docstring): the key's
        # low byte carries (block-offset code, chunk id); the pool position
        # carries (probe index, lane).
        pi = sel // w
        lane = (sel % w) & jnp.int32(127)
        cid = vals_p & jnp.int32(cmax - 1)
        codeb = jax.lax.shift_right_logical(vals_p, 4) & jnp.int32(cmax - 1)
        tsel = jnp.take_along_axis(tl, pi, axis=1)
        d = ((tsel & (cmax - 1)) - (jnp.int32(cmax - 1) - codeb)) & jnp.int32(
            cmax - 1)
        best_r = (tsel - d) * blk + cid * 128 + lane
        if alpha is not None:
            dots = jax.lax.shift_right_arithmetic(vals_p, 8)
            best_v = alpha * dots.astype(jnp.float32)
        else:
            best_v = pallas_ivf_dma._key_to_f32(vals_p)
            if self.metric == "l2":
                best_v = 2.0 * best_v  # augmented scores are l2_score/2
        best_v = jnp.where(valid, best_v, _NEG_INF)
        best_r = jnp.where(valid, best_r, 0)
        if extra is not None:
            gv = jnp.concatenate([best_v, extra[0]], axis=1)
            gr = jnp.concatenate([best_r, extra[1]], axis=1)
            best_v, sel2 = topk.small_topk(gv, kk)
            best_r = jnp.take_along_axis(gr, sel2, axis=1)
        if rescore:
            best_v, best_r = self._rescore_rows(arrays, queries, best_v, best_r, k)
        else:
            best_v, best_r = best_v[:, :k], best_r[:, :k]
        ids = jnp.where(
            best_v > _NEG_INF,
            jnp.take(arrays["reorder"], best_r.reshape(-1), axis=0
                     ).reshape(best_r.shape),
            -1,
        )
        return best_v, ids.astype(jnp.int32), n_candidates.astype(jnp.int32), spill

    # ------------------------------------------------------------------ API

    def _auto_probe_chunk(self, batch: int, budget_bytes: int = 256 << 20) -> int:
        bytes_per_probe = batch * self.max_cluster_size * self.dim * (
            2 if self.dtype == "bf16" else 4
        )
        return max(1, budget_bytes // max(bytes_per_probe, 1))

    def _auto_qcap(self, batch: int, nprobe: int, capacity_factor: float = 8.0) -> int:
        """MoE-style capacity: ~capacity_factor x the mean cluster load,
        rounded up to 128, capped at min(batch, 256).

        Kernel cost scales with qcap, so the cap trades throughput against
        spill on hot clusters (dropped pairs are counted and reported;
        recall@1 stays ≥0.95 at 7% spill on synthetic SIFT-1M).  For
        spill-free high-nprobe searches pass :meth:`required_qcap` (or an
        explicit qcap; measured at nprobe=32/B=2048 on 1M: qcap=384 cuts
        spill 7%→0.5% and lifts recall@10 0.961→0.996 at ~2.5x the batch
        time — scoped VMEM caps qcap at 384 for blk=2048).
        """
        mean_load = batch * min(nprobe, self.nlist) / self.nlist
        cap = int(-(-capacity_factor * mean_load // 128) * 128)
        return max(128, min(batch, 256, cap))

    def _accum_dim_cap(self) -> int:
        """Max dim the accum (planes) engine's int8 packed keys support
        without int32 overflow; float paths are unconstrained (monotone
        f32 keys carry no magnitude)."""
        if self.dtype != "int8":
            return 1 << 30
        return (pallas_ivf_dma.INT8_DIM_MAX_BIAS if self.metric == "l2"
                else pallas_ivf_dma.INT8_DIM_MAX)

    def _auto_cluster_k(self, k: int, rescore: bool,
                        rescore_k: int | None) -> int:
        """Per-cluster emit depth: the FULL pool depth kk.  MEASURED
        (SIFT-1M np=4/8): a query's candidates do NOT split evenly across
        its probed clusters — the nearest cluster typically holds most of
        the top-kk, so truncating per-cluster emit depth below kk costs
        real recall (ck=kk/2 at np=4: 0.993→0.938; ck=8 at np=8: 0.79).
        ``cluster_k`` stays available as an expert knob for distributions
        that do split (or recall-tolerant serving)."""
        return min(rescore_k or 2 * k, self.n) if rescore else k

    #: nprobe grid of the stored probe-skew table (measure_probe_skew).
    _SKEW_NPROBES = (1, 2, 4, 8, 16, 32)

    @staticmethod
    def measure_probe_skew(centroids: np.ndarray, sample: np.ndarray,
                           coarse_metric: str = "l2",
                           nprobes: tuple = _SKEW_NPROBES) -> dict:
        """Hottest-cluster probe-load FRACTION per nprobe, measured on a
        vector sample (host-side, one [S, nlist] GEMM ≈ 0.15 s at 10M
        scale).  ``frac[np] = max cluster load / S``: the fraction of
        queries whose top-np probe set contains the most popular cell —
        a property of the query distribution, hence ~batch-invariant
        (``est_load ≈ frac · B``).

        Round-5 finding this replaces a formula with: skew is NOT a
        function of nlist alone.  Measured max/mean at B=8192 —
        1M/nlist=1024: 8.7x; 10M/nlist=8192: 29.8x; but 1M/nlist=4096:
        **155-194x** (4 cells each drew 15-19% of all queries; the old
        clip(nlist/256, 8, 32) rule under-estimated 12x and recovery
        defaults would have silently dropped pairs — the same failure
        class as the round-4 np-inversion).  A base-vector self-probe
        predicts query-batch skew within ~8% on every measured point
        (queries look like base vectors), so the index measures its own
        skew instead of guessing (``results/qcap_calib_*.json``)."""
        c = np.asarray(centroids, dtype=np.float32)
        s = np.asarray(sample, dtype=np.float32)
        nlist = c.shape[0]
        scores = s @ c.T
        if coarse_metric == "l2":
            scores = 2.0 * scores - np.sum(c * c, axis=1)[None, :]
        nps = sorted({min(int(p), nlist) for p in nprobes})
        pmax = nps[-1]
        if pmax >= nlist:
            top = np.argsort(-scores, axis=1)[:, :pmax]
        else:
            part = np.argpartition(-scores, pmax, axis=1)[:, :pmax]
            # Order the partition so prefix columns are exact top-np' sets
            # (one sort of [S, pmax] — the prefix property turns six
            # nprobe measurements into one scoring pass).
            rows = np.arange(s.shape[0])[:, None]
            top = part[rows, np.argsort(-scores[rows, part], axis=1)]
        return {str(p): round(float(
            np.bincount(top[:, :p].ravel(), minlength=nlist).max()
            / s.shape[0]), 6) for p in nps}

    def _probe_skew_table(self) -> dict:
        """The measured skew table — from the build-time config when
        present, else lazily self-measured on a seeded sample of the
        stored vectors (retrofit for pre-round-5 artifacts; ~0.3 s once,
        cached on the instance and into ``config`` so a later
        :meth:`save` persists it)."""
        tab = self.config.get("probe_skew")
        if not tab:
            rng = np.random.default_rng(int(self.config.get("seed", 42)))
            take = min(8192, self.n)
            sel = rng.choice(self.n, take, replace=False)
            tab = self.measure_probe_skew(
                self._centroids_np, self._vectors_np[sel],
                coarse_metric=self.coarse_metric)
            self.config["probe_skew"] = tab
            self.config["probe_skew_sample"] = int(take)
        return tab

    def _est_max_load(self, batch: int, nprobe: int) -> float:
        """Expected HOTTEST-cluster load for a batch of real queries — the
        yardstick routing capacity must clear (``invert_probes`` drops
        pairs above qcap).

        The mean load B·nprobe/nlist is the WRONG yardstick at fine
        quantizers — query popularity concentrates on a few cells — and
        (round 5) no nlist-only formula survives measurement: max/mean at
        B=8192 is 8.7x (1M/nlist=1024), 29.8x (10M/nlist=8192) but
        155-194x (1M/nlist=4096).  The estimate therefore reads the
        MEASURED per-index skew table (:meth:`measure_probe_skew` — built
        with the index, lazily retrofitted for old artifacts) with
        log-np interpolation; the pre-round-5 clip(nlist/256, 8, 32)
        rule survives only as the fallback when measurement is
        impossible.

        No safety factor on the raw self-probe, deliberately: it tracked
        the measured query-batch load within ±8% on every calibration
        point, `_auto_recover_passes`'s ceil-to-pass quantization already
        provides ~recover_qcap/2 average slack, and a blanket 1.15x
        margin tips the 10M np=8/np=16 defaults into one EXTRA recovery
        pass each (a guaranteed ~20% throughput tax) to insure against a
        small counted, recall-neutral residual spill.  It remains a
        heuristic for DEFAULTS: residual spill is still counted and
        returned, recovery passes absorb estimate misses, and
        :meth:`required_qcap` measures the exact value for one batch."""
        nprobe = min(nprobe, self.nlist)
        try:
            tab = self._probe_skew_table()
            nps = np.array(sorted(int(p) for p in tab), dtype=np.float64)
            fracs = np.array([tab[str(int(p))] for p in nps])
            if nprobe <= nps[-1]:
                frac = float(np.interp(np.log2(nprobe), np.log2(nps), fracs))
            else:
                # Beyond the table: load only grows with nprobe; scale the
                # last point linearly (a safe over-estimate — growth is
                # sublinear) and cap at every query probing the cell.
                frac = min(1.0, float(fracs[-1]) * nprobe / float(nps[-1]))
            return min(float(batch), frac * batch)
        except Exception:
            mean_load = batch * nprobe / self.nlist
            skew = float(np.clip(self.nlist / 256.0, 8.0, 32.0))
            return min(float(batch), skew * mean_load)

    def _auto_recover(self, batch: int, nprobe: int) -> bool:
        """Recovery auto-engages when the estimated hottest-cluster load
        exceeds the routing capacity — the regime where ``invert_probes``
        drops pairs.

        Round-4 regression this rule encodes: the previous MEAN-load test
        (qcap < 8x mean) left recovery OFF on SIFT-10M at nlist=8192,
        where max load is ~30x mean — np=16 silently dropped 21.8K lossy
        pairs per batch and recall@10 INVERTED with nprobe
        (0.9981/0.9955/0.9619 at np=4/8/16).  With recovery the same
        configs measure 0.9983 (see RESULTS.md round-4 anomaly section).

        The trigger is estimated worst-cell OVERFLOW above a smallness
        threshold (batch/256 ≈ 0.4%), not a strict est > qcap test: the
        estimate only prices the hottest cell, so when it exceeds qcap by
        a handful of rows the lossy spill is a few pairs on one cell —
        measured recall-neutral (rounds 2/4) — while a recovery pass is a
        guaranteed ~20% throughput tax.  (Round 5: the measured-skew
        estimate puts the 1M headline at est 262 vs qcap 256 — a strict
        test would have taxed the headline to recover ~6 pairs.)"""
        qcap = self._auto_qcap(batch, nprobe)
        # qcap >= batch can never spill: a cluster's load is at most B.
        overflow = self._est_max_load(batch, nprobe) - qcap
        return qcap < batch and overflow > max(batch / 256.0, 8.0)

    def _auto_recover_passes(self, batch: int, nprobe: int, recover_qcap: int,
                             max_passes: int = 8) -> int:
        """Recovery passes sized so the combined capacity
        (qcap + passes·recover_qcap) reaches the estimated hottest-cluster
        load (:meth:`_est_max_load`).

        Calibration (SIFT-10M nlist=8192 B=8192, round-4 diagnosis —
        exact spill counts + recall vs passes): np=16 needs 480 total
        capacity (estimate 512 → 3 passes: measured spill 21,784 → 0 and
        recall@10 0.9619 → 0.9983); np=8 needs 256 (→ 1 pass).  On
        1M/nlist=1024 the estimate brackets the round-2 measured recall
        saturation points (B=16K/np=8: measured saturation at 2 passes,
        estimate 3; B=8192/np=16: measured 0.9879 at 2 / 0.9983 at 4,
        estimate 3).  Each pass costs ~20% throughput; the cap keeps
        genuinely pathological skew counted as residual spill rather than
        chased forever."""
        need = self._est_max_load(batch, nprobe) - self._auto_qcap(batch, nprobe)
        return int(np.clip(-(-need // max(recover_qcap, 1)), 1, max_passes))

    def required_qcap(self, queries: jax.Array | np.ndarray, nprobe: int,
                      multiple: int = 32) -> int:
        """Smallest routing capacity with ZERO spill for this batch: the max
        cluster load of the probe map, rounded up to ``multiple``.

        Costs one coarse scoring pass + a host sync; serving code that
        can't afford per-batch recompiles should bucket the result (qcap is
        a static jit argument).  The default ``_auto_qcap`` heuristic needs
        no sync but may spill on hot clusters at high nprobe.
        """
        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        probes = self._coarse_probes(self._arrays, q, min(nprobe, self.nlist))
        loads = jnp.bincount(probes.reshape(-1), length=self.nlist)
        need = int(jnp.max(loads))
        return max(multiple, -(-need // multiple) * multiple)

    def _pick_mode(self, batch: int, nprobe: int) -> str:
        # Cluster-major's fixed cost is one padded-database pass; it wins
        # once the query-major gather volume (B x nprobe x avg slab)
        # exceeds that.
        qm_rows = batch * min(nprobe, self.nlist) * (self.n_padded / self.nlist)
        return "cluster" if qm_rows >= self.n_padded else "query"

    def memory_report(self) -> dict[str, int]:
        """Device bytes per index array + TOTAL.  Includes the
        cluster-major kernel state (block-padded slabs) if materialized —
        call after the first cluster-mode search for the full picture.
        Disk artifacts (:meth:`save`) stay unpadded at reference parity."""
        from rag_on_edge_tpu.utils.metrics import memory_report

        return memory_report(self._arrays)

    def search_device(
        self,
        queries: jax.Array,
        k: int,
        nprobe: int,
        probe_chunk: int | None = None,
        mode: str = "auto",
        qcap: int | None = None,
        engine: str = "auto",
        rescore: bool | None = None,
        recover: bool | None = None,
        recover_qcap: int | None = None,
        recover_blocks: int | None = None,
        recover_passes: int | None = None,
        bin_depth: int = 2,
        rescore_k: int | None = None,
        cluster_k: int | None = None,
    ):
        """On-device search → (scores [B,k], ids [B,k], n_candidates [B]).

        mode: "auto" | "query" | "cluster" fine-scan strategy.
        engine: "auto" (pallas_accum where its layout limits allow — it
            dominated the grouped kernel at every measured SIFT-1M point,
            214-498K vs 170-449K QPS — else pallas)
            | "pallas_accum" (DMA-ring + packed accumulation, raw-planes
            emit, fused-join selection; clusters must span <= 16 blocks)
            | "pallas" (grouped kernel over a pre-gathered routed table)
            | "pallas_routed" (in-kernel one-hot routing, no routed table
            in HBM) | "xla" — stage-3 implementation for cluster mode.
        rescore: fp32 re-ranking of 2k candidates.  Defaults on for the
            pallas cluster engines (their bin-max selection is
            approximate), for bf16 scans, and for spilled indexes
            (build(spill_eps=) — the rescore stage is where duplicate
            copies of a vector are deduped; forcing rescore=False on a
            spilled index may return repeated ids).
        recover: spilled-pair recovery pass (pallas engines) — a second,
            sparse kernel pass over only the clusters that dropped routing
            pairs, so a small fast qcap no longer costs recall on hot
            clusters (see :meth:`_cm_recover`).  Default: on exactly when
            the auto-qcap heuristic was clamped below its capacity-factor
            target, the regime where spill appears (:meth:`_auto_recover`).
        recover_qcap / recover_blocks: capacity of each recovery pass
            (default: qcap / nblocks/4).
        recover_passes: recovery iterations; each re-invers only the pairs
            still unplaced (default :meth:`_auto_recover_passes` — more
            passes when the batch is large enough to overflow one).
        bin_depth: survivors per (row, bin) of the kernel's binned
            selection (default 2).  Raise to 3-4 when near-duplicate
            neighbors collide in a bin before the fp32 rescore sees them
            (observed on 10M-scale clusters — see RESULTS.md).
        rescore_k: fp32 rescore pool size (default 2k): candidates kept
            per query for the exact re-ranking.
        cluster_k: per-cluster emit depth of the cluster-major kernels
            (default: auto — see :meth:`_auto_cluster_k`).  A query's
            neighbors split across nprobe probed clusters, so each cluster
            only needs its top few per query; the in-kernel extract cost
            scales with this.  Pass the full pool size to force exact
            per-cluster top-kk (pre-cluster_k behavior).
        """
        b = queries.shape[0]
        if self.store == "compact" and mode == "auto":
            # Compact was built for cluster-major serving; keep that its
            # default.  Since the fp32 source is the unpadded original-
            # order copy on BOTH stores now, query-major and the XLA
            # engine work on compact too (the XLA engine materializes its
            # padded copy lazily from the host either way).
            mode = "cluster"
        if mode == "auto":
            mode = self._pick_mode(b, nprobe)
        if rescore is None:
            rescore = self.dtype in ("bf16", "int8") or (
                mode == "cluster" and engine != "xla"
            ) or self.spilled  # spilled indexes dedup in the rescore stage
        if mode == "cluster":
            if engine == "xla":
                # The XLA engine's contiguous dynamic-slice slab walk needs
                # the block-padded fp32 copy — built on first use only (the
                # default engines never pay its padding tax).
                self._ensure_padded_f32()
            if engine == "auto":
                self._ensure_kernel_state()
                eligible = (
                    self._cm_max_nb <= pallas_ivf_dma.CODE_MAX
                    and self.PAD_BLOCK <= 128 * pallas_ivf_dma.CODE_MAX
                    and self.dim <= self._accum_dim_cap()
                )
                engine = "pallas_accum" if eligible else "pallas"
            pallas_engine = engine in ("pallas", "pallas_routed", "pallas_accum")
            if pallas_engine:
                self._ensure_kernel_state()
            if engine == "pallas_accum" and self._cm_max_nb > pallas_ivf_dma.CODE_MAX:
                raise ValueError(
                    f"engine='pallas_accum' supports clusters up to "
                    f"{pallas_ivf_dma.CODE_MAX} blocks of {self.PAD_BLOCK} rows; "
                    f"this index has a {self._cm_max_nb}-block cluster — use "
                    "engine='pallas' or a larger pad_block"
                )
            if engine == "pallas_accum" and self.dim > self._accum_dim_cap():
                raise ValueError(
                    f"engine='pallas_accum' int8 path supports dim <= "
                    f"{self._accum_dim_cap()} (int32 packed-key headroom: "
                    f"|q.b| <= d*127^2 must clear the 8-bit shift"
                    f"{', minus the L2 bias rows' if self.metric == 'l2' else ''}); "
                    f"this index is {self.dim}-dim — use engine='pallas'"
                )
            if engine == "pallas_accum" and self.PAD_BLOCK > 128 * pallas_ivf_dma.CODE_MAX:
                raise ValueError(
                    f"engine='pallas_accum' (planes emit) needs pad_block <= "
                    f"{128 * pallas_ivf_dma.CODE_MAX} (4-bit chunk id); "
                    f"got {self.PAD_BLOCK}"
                )
            if recover and not pallas_engine:
                raise ValueError("recover requires a pallas cluster engine")
            if recover is None:
                recover = pallas_engine and self._auto_recover(b, nprobe)
            rq = rb = 0
            rp = 1
            if recover:
                nblocks = self._arrays["vectors_t"].shape[0]
                rq = recover_qcap or qcap or self._auto_qcap(b, nprobe)
                rb = min(recover_blocks or max(1, nblocks // 4), nblocks)
                rb = -(-rb // self.CM_GROUP) * self.CM_GROUP
                rp = recover_passes or self._auto_recover_passes(b, nprobe, rq)
            if cluster_k is None:
                cluster_k = self._auto_cluster_k(k, rescore, rescore_k)
            else:
                # Output-width guarantee: the join pool is nprobe*cluster_k
                # wide; below kk it silently returned < k columns on the
                # non-rescored path.  Clamp so pool width >= kk.
                kk_out = min(rescore_k or 2 * k, self.n) if rescore else k
                cluster_k = max(cluster_k, -(-kk_out // min(nprobe, self.nlist)))
            vals, ids, ncand, spill = self._search_cm_jit(
                self._arrays, queries, k, nprobe,
                qcap or self._auto_qcap(b, nprobe), engine, rescore, rq, rb, rp,
                bin_depth, rescore_k or 0, cluster_k,
            )
            self.last_spill = spill
            # Engine attribution: auto's pallas_accum/pallas pick depends on
            # the index LAYOUT (block span, pad_block, dim), so two runs of
            # the same CLI can use different kernels — benches record which
            # one actually produced each row (VERDICT r2 item 7).
            self.last_engine = engine
            self.last_mode = mode
            return vals, ids, ncand
        if mode != "query":
            raise ValueError(f"unknown mode {mode!r}")
        self.last_engine = "xla"
        self.last_mode = mode
        pc = probe_chunk or self._auto_probe_chunk(b)
        return self._search_jit(self._arrays, queries, k, nprobe, pc, rescore)

    def search_stream_device(
        self, query_stream: jax.Array, k: int, nprobe: int,
        probe_chunk: int | None = None, mode: str = "query",
    ):
        """Stream mode: one dispatch runs a stack of micro-batches
        [M, B, D] → (scores [M,B,k], ids [M,B,k], n_candidates [M,B]) —
        a serving queue drains M micro-batches per device call, amortizing
        per-dispatch overhead (see BruteForceIndex.search_stream_device).

        mode "query": M independent query-major searches (low-latency
        shapes).  mode "cluster": the whole stream is flattened into ONE
        cluster-major batch — the slab walk is paid once for all M·B
        queries, the right shape for 1M-scale throughput serving."""
        if mode == "cluster":
            m, b2, d = query_stream.shape
            v, i, c = self.search_device(
                query_stream.reshape(m * b2, d), k, nprobe, mode="cluster"
            )
            return v.reshape(m, b2, k), i.reshape(m, b2, k), c.reshape(m, b2)
        pc = probe_chunk or self._auto_probe_chunk(query_stream.shape[1])
        return self._stream_jit(self._arrays, query_stream, k, nprobe, pc)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int = 16,
        batch_size: int | None = None,
        mode: str = "auto",
        engine: str = "auto",
        rescore: bool | None = None,
        recover: bool | None = None,
    ):
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
                # Cyclic-repeat padding, NOT zeros: pad rows route through
                # the same coarse stage as real rows, and a block of
                # identical zero queries all probes the SAME few cells —
                # measured (round-4 10M diag, nlist=8192): a 1808-real +
                # 6384-zero-pad batch carried ~94K lossy pad pairs that
                # exhausted hot clusters' qcap slots (evicting REAL pairs)
                # and burned recovery passes on discarded rows.  Repeats
                # probe the same cells as their source row — at most one
                # duplicate load each.
                chunk = np.resize(chunk, (bs, chunk.shape[1]))
            vals, ids, ncand = self.search_device(
                jnp.asarray(chunk), k, nprobe, mode=mode, engine=engine,
                rescore=rescore, recover=recover,
            )
            got = bs - pad
            ids_out[start : start + got] = np.asarray(ids)[:got]
            scores_out[start : start + got] = np.asarray(vals)[:got]
            total_cand += int(np.asarray(ncand)[:got].sum())
        return ids_out, scores_out, total_cand / nq

    def compile(self, batch_size: int, k: int, nprobe: int, mode: str = "auto",
                engine: str = "auto", recover: bool | None = None,
                recover_passes: int | None = None) -> None:
        dummy = jnp.zeros((batch_size, self.dim), dtype=jnp.float32)
        jax.block_until_ready(self.search_device(dummy, k, nprobe, mode=mode,
                                                 engine=engine, recover=recover,
                                                 recover_passes=recover_passes))

    # ------------------------------------------------------------ persistence

    _FILES = {
        "centroids": "centroids.npy",
        "vectors": "vectors_reordered.npy",
        "offsets": "cluster_offsets.npy",
        "reorder": "reorder_to_original.npy",
        "sizes": "cluster_sizes.npy",
        "config": "ivf_config.json",
    }

    def save(self, index_dir: str) -> None:
        """Write the artifact set of ``create_ivf_model_reordered.py:148-160``."""
        os.makedirs(index_dir, exist_ok=True)
        np.save(os.path.join(index_dir, self._FILES["centroids"]), self._centroids_np)
        np.save(os.path.join(index_dir, self._FILES["vectors"]), self._vectors_np)
        np.save(os.path.join(index_dir, self._FILES["offsets"]), self._offsets_np)
        np.save(os.path.join(index_dir, self._FILES["reorder"]), self._reorder_np)
        np.save(
            os.path.join(index_dir, self._FILES["sizes"]),
            np.diff(self._offsets_np).astype(np.int32),
        )
        with open(os.path.join(index_dir, self._FILES["config"]), "w") as f:
            json.dump(self.config, f, indent=2)

    @classmethod
    def load(cls, index_dir: str, store: str = "padded") -> "IVFIndex":
        """Load an index artifact set.

        Accepts both layouts the reference's builders emit: the reordered
        set (``create_ivf_model_reordered.py:148-160`` — what :meth:`save`
        writes) and the scattered-CSR set (``create_ivf_model.py:151-166``:
        original-order ``vectors.npy`` + ``cluster_indices.npy``).  A
        scattered set is reordered at load time — the CSR indices ARE the
        reorder map, so ``vectors[cluster_indices]`` is exactly the
        cluster-contiguous layout (the device layout is always reordered;
        scattered gathers were the reference's own bottleneck,
        ``IVFIndex.cpp:675-686`` vs ``786-794``).
        """
        with open(os.path.join(index_dir, cls._FILES["config"])) as f:
            config = json.load(f)
        reordered_path = os.path.join(index_dir, cls._FILES["vectors"])
        if os.path.exists(reordered_path):
            vectors = np.load(reordered_path)
            reorder = np.load(os.path.join(index_dir, cls._FILES["reorder"]))
        else:
            original = np.load(os.path.join(index_dir, "vectors.npy"))
            reorder = np.load(os.path.join(index_dir, "cluster_indices.npy"))
            vectors = original[reorder]
        return cls(
            np.load(os.path.join(index_dir, cls._FILES["centroids"])),
            vectors,
            np.load(os.path.join(index_dir, cls._FILES["offsets"])),
            reorder,
            metric=config.get("metric", "ip"),
            dtype=config.get("dtype", "fp32"),
            coarse_metric=config.get("coarse_metric", "l2"),
            store=store,
            config=config,
        )
