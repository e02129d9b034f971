"""Datasets: SIFT-style synthetic corpora, on-disk caching, exact ground truth.

The reference suite targets the TEXMEX SIFT datasets (128-dim; SIFT-small =
10K base / 100 queries, SIFT = 1M base / 10K queries — reference
``README.md:107-118``).  This environment has no network egress, so we
provide deterministic synthetic stand-ins with the same shapes and value
statistics (raw SIFT values are small non-negative ints, range ≈ 0-141 —
reference ``qidk_bruteforce/.../main.cpp:131-132``), generated as a mixture
of clusters so IVF recall/nprobe behavior is meaningful.

Real SIFT files, if present under the data root with the standard names
(``<name>_base.fvecs`` etc.), are used instead of synthesizing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from rag_on_edge_tpu.utils import io

__all__ = ["Dataset", "DATASET_SPECS", "load_dataset", "make_synthetic", "ground_truth"]

DEFAULT_DATA_ROOT = os.environ.get(
    "RAG_EDGE_TPU_DATA", os.path.join(os.path.dirname(__file__), "..", "..", "data")
)

# name -> (n_base, n_queries, dim, n_clusters_for_synthesis)
DATASET_SPECS: dict[str, tuple[int, int, int, int]] = {
    "siftsmall": (10_000, 100, 128, 64),
    "sift": (1_000_000, 10_000, 128, 4096),
    # 10x the reference's largest dataset — single-chip scale headroom
    # (requires IVFIndex store="compact"; see RESULTS.md).
    "sift10m": (10_000_000, 10_000, 128, 16384),
    # Tiny config for unit tests.
    "unit": (2_048, 32, 128, 16),
}


@dataclass
class Dataset:
    name: str
    base: np.ndarray  # [N, dim] float32
    queries: np.ndarray  # [Q, dim] float32
    ground_truth_ip: np.ndarray | None = None  # [Q, K] int32, inner-product ranking
    ground_truth_l2: np.ndarray | None = None  # [Q, K] int32, L2 ranking
    gt_k: int = 100
    meta: dict = field(default_factory=dict)

    @property
    def dim(self) -> int:
        return int(self.base.shape[1])

    def gt(self, metric: str) -> np.ndarray | None:
        return self.ground_truth_l2 if metric == "l2" else self.ground_truth_ip


def make_synthetic(
    n_base: int,
    n_queries: int,
    dim: int = 128,
    n_clusters: int = 64,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate SIFT-like base and query vectors.

    Cluster centers are uniform in [10, 110]; points add Gaussian noise
    (σ=18), are clipped to [0, 141] and rounded to integers — matching raw
    SIFT's value range so that the reference's INT8 calibration story
    (uint8-monotonicity, ``QnnRunner.h:28-29``) transfers.  Queries are
    perturbed base points (as in real SIFT, queries are near-duplicates of
    database content), so exact search has non-trivial neighbors.
    """
    rng = np.random.default_rng(seed)
    centers = rng.uniform(10.0, 110.0, size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n_base)
    base = centers[assign] + rng.normal(0.0, 18.0, size=(n_base, dim))
    base = np.clip(np.round(base), 0.0, 141.0).astype(np.float32)

    q_src = rng.integers(0, n_base, size=n_queries)
    queries = base[q_src] + rng.normal(0.0, 10.0, size=(n_queries, dim))
    queries = np.clip(np.round(queries), 0.0, 141.0).astype(np.float32)
    return base, queries


def _chunk_topk(scores: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k (descending score), ties broken by lower id.

    Partitioning on the score alone splits boundary TIES arbitrarily
    (integer-valued corpora — synthetic and real SIFT both — tie often),
    disagreeing with the cpu_oracle and the lexsort fallback at rank k.
    The f64 composite key ``score·2²⁵ − id`` makes the partition itself
    tie-exact — but ONLY for integer-valued scores: the id term then sits
    strictly below the smallest possible score gap (1 unit), and with
    |s|·2²⁵ ≪ 2⁵³ and ids < 2²⁵ the key is exact and strictly ordered by
    (score desc, id asc).  For NON-integer scores the id term can exceed
    a genuine score gap (e.g. normalized-embedding corpora: 0.75 at id
    100 would outrank 0.90 at id 9M) — those take the score-only
    partition + lexsort branch instead, where ties follow the partition
    but distinct scores are always ordered correctly.
    """
    k = min(k, scores.shape[1])
    integral = bool(np.all(scores == np.rint(scores)))
    if not integral or (ids.size and int(ids.max()) >= (1 << 25)):
        # Non-integer scores (the composite key would mis-order real
        # gaps smaller than delta_id/2²⁵) or a >33M-row corpus (the key
        # can no longer separate a 1-unit score step from the id term):
        # score-only partition + lexsort.
        if k < scores.shape[1]:
            part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
            scores = np.take_along_axis(scores, part, axis=1)
            ids = np.take_along_axis(ids, part, axis=1)
        order = np.lexsort((ids, -scores), axis=1)
    else:
        key = scores.astype(np.float64) * float(1 << 25) - ids
        if k < scores.shape[1]:
            part = np.argpartition(-key, k - 1, axis=1)[:, :k]
            key = np.take_along_axis(key, part, axis=1)
            scores = np.take_along_axis(scores, part, axis=1)
            ids = np.take_along_axis(ids, part, axis=1)
        order = np.argsort(-key, axis=1, kind="stable")
    return (
        np.take_along_axis(scores, order, axis=1),
        np.take_along_axis(ids, order, axis=1),
    )


def ground_truth(
    base: np.ndarray,
    queries: np.ndarray,
    k: int,
    metric: str = "ip",
    chunk: int = 262_144,
    query_chunk: int = 1_024,
    backend: str = "auto",
) -> np.ndarray:
    """Exact top-k neighbor ids by brute force, chunked over base and queries.

    ``metric="ip"``: descending inner product (the NPU-path convention,
    reference ``main.cpp:33``).  ``metric="l2"``: ascending squared L2
    (the CPU-oracle convention, ``cpu/cpu_baseline.cpp:239-242``).
    Returns int32 ``[Q, k]``, best first.  Ties broken by lower id.

    ``backend="auto"`` uses JAX for the chunk GEMMs when the problem is
    large and JAX is importable (this host has one CPU core; SIFT-1M ground
    truth is ~2.5 TFLOP), else NumPy.
    """
    if metric not in ("ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    n = base.shape[0]
    k = min(k, n)

    if backend == "jax" or (backend == "auto" and n * len(queries) >= 2**26):
        try:
            return _ground_truth_jax(base, queries, k, metric, query_chunk)
        except ImportError:
            pass
    matmul = lambda q, b: q @ b.T  # noqa: E731

    base_norms = np.sum(base.astype(np.float32) ** 2, axis=1) if metric == "l2" else None

    out = np.empty((len(queries), k), dtype=np.int32)
    for qs in range(0, len(queries), query_chunk):
        q = queries[qs : qs + query_chunk].astype(np.float32)
        best_scores = np.full((len(q), 0), -np.inf, dtype=np.float32)
        best_ids = np.zeros((len(q), 0), dtype=np.int64)
        for start in range(0, n, chunk):
            blk = base[start : start + chunk].astype(np.float32)
            scores = matmul(q, blk)  # [Qc, c]
            if metric == "l2":
                # rank by -distance so "larger is better" uniformly
                scores = -(base_norms[start : start + blk.shape[0]][None, :] - 2.0 * scores)
            ids = np.broadcast_to(
                np.arange(start, start + blk.shape[0], dtype=np.int64), scores.shape
            )
            c_scores, c_ids = _chunk_topk(scores, ids, k)
            best_scores = np.concatenate([best_scores, c_scores], axis=1)
            best_ids = np.concatenate([best_ids, c_ids], axis=1)
        best_scores, best_ids = _chunk_topk(best_scores, best_ids, k)
        out[qs : qs + len(q)] = best_ids.astype(np.int32)
    return out


def _ground_truth_jax(
    base: np.ndarray, queries: np.ndarray, k: int, metric: str, query_chunk: int
) -> np.ndarray:
    """Device-resident exact ground truth: the base is transferred once
    (host↔device transfers dominate chunked host-side variants) and each
    query chunk runs one fused score+select executable."""
    import jax
    import jax.numpy as jnp

    from rag_on_edge_tpu.ops import distances, topk as topk_ops

    if base.shape[0] * query_chunk * 4 > (2 << 30):
        # The [query_chunk, N] score matrix would blow HBM (10M-scale):
        # use the exact fused streaming kernel instead — the score matrix
        # never materializes.
        return _ground_truth_fused(base, queries, k, metric, query_chunk)

    base_dev = jnp.asarray(base, dtype=jnp.float32)
    norms = distances.base_norms_sq(base_dev) if metric == "l2" else None

    @jax.jit
    def one_chunk(b, bn, q):
        scores = distances.score_matrix(q, b, metric=metric, base_norms=bn)
        if k <= 32:
            return topk_ops.iterative_topk(scores, k)
        return topk_ops.two_stage_topk(scores, k)

    out = np.empty((len(queries), k), dtype=np.int32)
    for qs in range(0, len(queries), query_chunk):
        q = queries[qs : qs + query_chunk].astype(np.float32)
        _, ids = one_chunk(base_dev, norms, jnp.asarray(q))
        out[qs : qs + len(q)] = np.asarray(ids)[: len(q)]
    return out


def _ground_truth_fused(
    base: np.ndarray, queries: np.ndarray, k: int, metric: str, query_chunk: int
) -> np.ndarray:
    """Exact ground truth via the fused Pallas streaming kernel
    (:func:`rag_on_edge_tpu.ops.pallas_bruteforce.fused_topk_matmul`) —
    fp32, exact selection (no binning), ties to the lowest id; the [B, N]
    score matrix never exists, so N is bounded by the base itself
    (~5 GB fp32 at 10M), not by a score buffer."""
    import jax.numpy as jnp

    from rag_on_edge_tpu.ops.pallas_bruteforce import fused_topk_matmul

    bt = np.ascontiguousarray(base.astype(np.float32).T)  # [D, N]
    if metric == "l2":
        # Augmentation: q' = [q, 1], b' = [b, -‖b‖²/2] — q'·b' is a
        # monotone per-row map of the L2 score, so ids are exact.
        bt = np.concatenate(
            [bt, -0.5 * np.sum(base.astype(np.float32) ** 2, axis=1)[None, :]],
            axis=0,
        )
    bt_dev = jnp.asarray(bt)
    del bt
    out = np.empty((len(queries), k), dtype=np.int32)
    for qs in range(0, len(queries), query_chunk):
        q = queries[qs : qs + query_chunk].astype(np.float32)
        if metric == "l2":
            q = np.concatenate([q, np.ones((len(q), 1), np.float32)], axis=1)
        _, ids = fused_topk_matmul(jnp.asarray(q), bt_dev, k)
        out[qs : qs + len(q)] = np.asarray(ids)[: len(q)]
    return out


def _paths(root: str, name: str) -> dict[str, str]:
    d = os.path.join(root, name)
    return {
        "dir": d,
        "base": os.path.join(d, f"{name}_base.fvecs"),
        "query": os.path.join(d, f"{name}_query.fvecs"),
        "gt_ip": os.path.join(d, f"{name}_groundtruth_ip.ivecs"),
        "gt_l2": os.path.join(d, f"{name}_groundtruth_l2.ivecs"),
        # Standard TEXMEX name (L2 ranking) — used if a real dataset is dropped in.
        "gt_texmex": os.path.join(d, f"{name}_groundtruth.ivecs"),
    }


def load_dataset(
    name: str,
    root: str | None = None,
    gt_k: int = 100,
    compute_gt: bool = True,
) -> Dataset:
    """Load a dataset by name, synthesizing + caching to fvecs/ivecs if absent."""
    if name not in DATASET_SPECS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(DATASET_SPECS)}")
    root = root or DEFAULT_DATA_ROOT
    n_base, n_queries, dim, n_clusters = DATASET_SPECS[name]
    p = _paths(root, name)

    synth_marker = os.path.join(p["dir"], f"{name}_synth.json")
    if not (os.path.exists(p["base"]) and os.path.exists(p["query"])):
        os.makedirs(p["dir"], exist_ok=True)
        base, queries = make_synthetic(n_base, n_queries, dim, n_clusters)
        io.write_fvecs(p["base"], base)
        io.write_fvecs(p["query"], queries)
        with open(synth_marker, "w") as f:
            json.dump({"n_base": n_base, "n_queries": n_queries,
                       "dim": dim, "synthetic": True}, f)
    else:
        base = io.read_fvecs(p["base"])
        queries = io.read_fvecs(p["query"])
        # For files WE synthesized (marker present), a crash mid-write
        # (the 10M base is ~5 GB) can leave a truncated file that still
        # parses on a record boundary — catch it before ground truth is
        # computed for the wrong corpus.  Files without the marker are
        # real-dataset drop-ins: any self-consistent shape is accepted.
        if os.path.exists(synth_marker):
            with open(synth_marker) as f:
                expect = json.load(f)
            if (base.shape != (expect["n_base"], expect["dim"])
                    or queries.shape != (expect["n_queries"], expect["dim"])):
                raise ValueError(
                    f"cached synthetic {name} files do not match their "
                    f"manifest (base {base.shape} vs "
                    f"({expect['n_base']}, {expect['dim']}), queries "
                    f"{queries.shape}) — a truncated write; delete "
                    f"{p['dir']} to re-synthesize"
                )
        elif base.shape[1] != queries.shape[1]:
            raise ValueError(
                f"{name}: base dim {base.shape[1]} != query dim "
                f"{queries.shape[1]}"
            )

    gt_ip = gt_l2 = None
    if compute_gt:
        if os.path.exists(p["gt_ip"]):
            gt_ip = io.read_ivecs(p["gt_ip"])
            if gt_ip.shape[1] < gt_k:
                gt_ip = None  # stale narrow cache: recompute at the asked depth
        if os.path.exists(p["gt_l2"]):
            gt_l2 = io.read_ivecs(p["gt_l2"])
            if gt_l2.shape[1] < gt_k:
                gt_l2 = None
        elif os.path.exists(p["gt_texmex"]):
            # A real TEXMEX groundtruth (L2) is authoritative even when
            # narrower than gt_k; gt_k clamps to it below.
            gt_l2 = io.read_ivecs(p["gt_texmex"])
        if gt_ip is None:
            gt_ip = ground_truth(base, queries, gt_k, metric="ip")
            io.write_ivecs(p["gt_ip"], gt_ip)
        if gt_l2 is None:
            gt_l2 = ground_truth(base, queries, gt_k, metric="l2")
            io.write_ivecs(p["gt_l2"], gt_l2)
        gt_k = min(gt_k, gt_ip.shape[1], gt_l2.shape[1])

    return Dataset(
        name=name,
        base=base,
        queries=queries,
        ground_truth_ip=gt_ip,
        ground_truth_l2=gt_l2,
        gt_k=gt_k,
        meta={"n_base": n_base, "n_queries": n_queries, "dim": dim},
    )
