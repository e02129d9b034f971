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
from rag_on_edge_tpu.ops import distances, topk

__all__ = ["IVFIndex", "fine_scan"]

_NEG_INF = float("-inf")


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
):
    """Scan probed cluster slabs with a running on-device top-k.

    The functional core of IVF STAGE 2 (reference NEON scan + heaps,
    ``IVFIndex.cpp:738-779``), shared by the single-chip and mesh-sharded
    paths.

    q: [B, D] f32 queries. vectors: [N, D] cluster-contiguous slabs.
    p_offs/p_sizes: [B, P] i32 start row / size per probed cluster (size 0 =
    empty sentinel — used for probe padding and non-owned clusters on
    sharded meshes). Returns (vals [B, k] f32, rows [B, k] i32 — indices
    into ``vectors``; rows for -inf slots are meaningless).
    """
    b = q.shape[0]
    n_rows = vectors.shape[0]
    nprobe = p_offs.shape[1]
    smax = max_cluster_size
    arange_s = jnp.arange(smax, dtype=jnp.int32)

    def chunk(carry, offs_c, sizes_c):
        best_v, best_i = carry
        rows = offs_c[..., None] + arange_s  # [B, pc, S]
        valid = arange_s[None, None, :] < sizes_c[..., None]
        rows = jnp.clip(rows, 0, n_rows - 1)
        cand = vectors[rows]  # [B, pc, S, D] slab gather
        qc = q.astype(vectors.dtype)
        scores = jnp.einsum("bpsd,bd->bps", cand, qc, preferred_element_type=jnp.float32)
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
    """

    def __init__(
        self,
        centroids: np.ndarray,
        vectors_reordered: np.ndarray,
        cluster_offsets: np.ndarray,
        reorder_to_original: np.ndarray,
        metric: str = "ip",
        dtype: str = "fp32",
        config: dict | None = None,
    ):
        if metric not in ("ip", "l2"):
            raise ValueError(f"unknown metric {metric!r}")
        if dtype not in ("fp32", "bf16"):
            raise ValueError(f"unknown dtype {dtype!r} (fine scan supports fp32/bf16)")
        self.metric = metric
        self.dtype = dtype
        self.nlist = int(centroids.shape[0])
        self.n, self.dim = vectors_reordered.shape
        sizes = np.diff(cluster_offsets).astype(np.int32)
        self.max_cluster_size = int(sizes.max())
        self.config = config or {}
        self.config.update(
            {
                "n_vectors": self.n,
                "n_clusters": self.nlist,
                "dim": self.dim,
                "reordered": True,
                "metric": metric,
                "dtype": dtype,
                "cluster_size_min": int(sizes.min()),
                "cluster_size_avg": float(sizes.mean()),
                "cluster_size_max": int(sizes.max()),
            }
        )

        # Host copies for serialization.
        self._centroids_np = np.asarray(centroids, dtype=np.float32)
        self._vectors_np = np.asarray(vectors_reordered, dtype=np.float32)
        self._offsets_np = np.asarray(cluster_offsets, dtype=np.int32)
        self._reorder_np = np.asarray(reorder_to_original, dtype=np.int32)

        # Device-resident index state.
        vec_f32 = jnp.asarray(self._vectors_np)
        self._centroids = jnp.asarray(self._centroids_np)
        self._vectors = vec_f32.astype(jnp.bfloat16) if dtype == "bf16" else vec_f32
        self._offsets = jnp.asarray(self._offsets_np[:-1])
        self._sizes = jnp.asarray(sizes)
        self._reorder = jnp.asarray(self._reorder_np)
        self._centroid_norms = (
            distances.base_norms_sq(self._centroids) if metric == "l2" else None
        )
        self._vector_norms = distances.base_norms_sq(vec_f32) if metric == "l2" else None

        self._search_jit = jax.jit(
            self._search_impl, static_argnames=("k", "nprobe", "probe_chunk")
        )

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        base: np.ndarray,
        nlist: int | None = None,
        metric: str = "ip",
        dtype: str = "fp32",
        seed: int = 42,
        max_iter: int = 100,
    ) -> "IVFIndex":
        """Train the coarse quantizer and lay out clusters contiguously."""
        base = np.asarray(base, dtype=np.float32)
        n = base.shape[0]
        nlist = kmeans_mod.default_nlist(n, nlist)
        centroids, assign = kmeans_mod.kmeans(base, nlist, seed=seed, max_iter=max_iter)

        # Stable sort by cluster id → contiguous slabs; argsort indices are
        # exactly the reorder_to_original map (reordered row r holds original
        # vector reorder_to_original[r]), as in create_ivf_model_reordered.py.
        order = np.argsort(assign, kind="stable")
        vectors_reordered = base[order]
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return cls(
            centroids,
            vectors_reordered,
            offsets.astype(np.int32),
            order.astype(np.int32),
            metric=metric,
            dtype=dtype,
            config={"seed": seed, "kmeans_max_iter": max_iter},
        )

    # ------------------------------------------------------------- search impl

    def _search_impl(self, queries: jax.Array, k: int, nprobe: int, probe_chunk: int):
        """Returns (scores [B,k] f32, ids [B,k] i32, n_candidates [B] i32)."""
        q = queries.astype(jnp.float32)
        nprobe = min(nprobe, self.nlist)

        # STAGE 1 — coarse centroid scores on the MXU (the reference's NPU
        # centroid GEMM, IVFIndex.cpp:653-657) + top-nprobe (nth_element,
        # IVFIndex.cpp:711-712).
        coarse = distances.score_matrix(
            q, self._centroids, metric=self.metric, base_norms=self._centroid_norms
        )
        _, probes = jax.lax.top_k(coarse, nprobe)  # [B, P]
        p_offs = self._offsets[probes]
        p_sizes = self._sizes[probes]
        n_candidates = jnp.sum(p_sizes, axis=1)

        # STAGE 2 — fine scan over cluster slabs with a running top-k
        # (reference NEON scan + heaps, IVFIndex.cpp:738-779).
        best_v, best_i = fine_scan(
            q,
            self._vectors,
            self._vector_norms,
            p_offs,
            p_sizes,
            k=k,
            probe_chunk=probe_chunk,
            metric=self.metric,
            max_cluster_size=self.max_cluster_size,
        )

        # Map reordered rows back to original ids (IVFIndex.cpp:778).
        ids = jnp.where(best_v > _NEG_INF, self._reorder[best_i], -1)
        return best_v, ids.astype(jnp.int32), n_candidates.astype(jnp.int32)

    # ------------------------------------------------------------------ API

    def _auto_probe_chunk(self, batch: int, budget_bytes: int = 256 << 20) -> int:
        bytes_per_probe = batch * self.max_cluster_size * self.dim * (
            2 if self.dtype == "bf16" else 4
        )
        return max(1, budget_bytes // max(bytes_per_probe, 1))

    def search_device(
        self, queries: jax.Array, k: int, nprobe: int, probe_chunk: int | None = None
    ):
        """On-device search → (scores [B,k], ids [B,k], n_candidates [B])."""
        pc = probe_chunk or self._auto_probe_chunk(queries.shape[0])
        return self._search_jit(queries, k, nprobe, pc)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int = 16,
        batch_size: int | None = None,
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
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            vals, ids, ncand = self.search_device(jnp.asarray(chunk), k, nprobe)
            got = bs - pad
            ids_out[start : start + got] = np.asarray(ids)[:got]
            scores_out[start : start + got] = np.asarray(vals)[:got]
            total_cand += int(np.asarray(ncand)[:got].sum())
        return ids_out, scores_out, total_cand / nq

    def compile(self, batch_size: int, k: int, nprobe: int) -> None:
        dummy = jnp.zeros((batch_size, self.dim), dtype=jnp.float32)
        jax.block_until_ready(self.search_device(dummy, k, nprobe))

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
    def load(cls, index_dir: str) -> "IVFIndex":
        with open(os.path.join(index_dir, cls._FILES["config"])) as f:
            config = json.load(f)
        return cls(
            np.load(os.path.join(index_dir, cls._FILES["centroids"])),
            np.load(os.path.join(index_dir, cls._FILES["vectors"])),
            np.load(os.path.join(index_dir, cls._FILES["offsets"])),
            np.load(os.path.join(index_dir, cls._FILES["reorder"])),
            metric=config.get("metric", "ip"),
            dtype=config.get("dtype", "fp32"),
            config=config,
        )
