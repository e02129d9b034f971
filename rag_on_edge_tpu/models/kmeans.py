"""On-device k-means (Lloyd's algorithm) for IVF coarse quantizer training.

The reference trains its coarse quantizer with sklearn
``KMeans(n_clusters, random_state=42, n_init=1, max_iter=100)`` on the host
(``qidk_ivf/prepare/create_ivf_model.py:101-111``).  Here the assignment
step is a [N, D] x [D, nlist] GEMM on the MXU and the update step is a
``segment_sum``, so training SIFT-1M takes seconds on one chip.  Seeded and
deterministic like the reference (SURVEY §2.5: k-means seed 42).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kmeans", "assign_clusters", "default_nlist"]


def default_nlist(n_vectors: int, requested: int | None = None) -> int:
    """Cluster-count guard from the reference (``create_ivf_model.py:96-99``):
    cap nlist at n/10, falling back to max(16, n/100)."""
    if requested is not None and requested <= n_vectors // 10:
        return requested
    if requested is not None:
        return max(16, n_vectors // 100)
    return max(16, min(1024, n_vectors // 100))


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(x: jax.Array, centroids: jax.Array, chunk: int = 131_072) -> jax.Array:
    """Nearest-centroid (squared-L2) assignment, chunked over rows. [N] int32."""
    c_norms = jnp.sum(centroids * centroids, axis=1)

    def one_chunk(xc):
        # HIGHEST: assignment is a ranking; the TPU default single-bf16-pass
        # matmul flips near-tie centroid choices vs the CPU result.
        dots = jax.lax.dot_general(
            xc, centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # argmin over ‖x‖² - 2x·c + ‖c‖²; the ‖x‖² term is row-constant.
        return jnp.argmin(c_norms[None, :] - 2.0 * dots, axis=1).astype(jnp.int32)

    n = x.shape[0]
    if n <= chunk:
        return one_chunk(x)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    out = jax.lax.map(one_chunk, xp.reshape(-1, chunk, x.shape[1])).reshape(-1)
    return out[:n]


def _lloyd_step(x: jax.Array, centroids: jax.Array, chunk: int):
    assign = assign_clusters(x, centroids, chunk=chunk)
    nlist = centroids.shape[0]

    # Cluster sums via a one-hot GEMM (scatter-add serializes on TPU; a
    # [nlist, uc] x [uc, D] matmul runs on the MXU instead).  The update
    # chunk is kept small: the one-hot is [nlist, uc] f32 and must not
    # dominate memory traffic.
    uc = min(8192, x.shape[0])

    def chunk_sums(carry, args):
        sums, counts = carry
        xc, ac = args
        onehot = (ac[None, :] == jnp.arange(nlist, dtype=jnp.int32)[:, None]).astype(
            jnp.float32
        )  # [nlist, uc]
        sums += jax.lax.dot_general(
            onehot, xc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (sums, counts + jnp.sum(onehot, axis=1)), None

    n, d = x.shape
    pad = (-n) % uc
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    # padded rows get an out-of-range id so they hit no cluster
    ap = jnp.pad(assign, (0, pad), constant_values=nlist) if pad else assign
    n_chunks = (n + pad) // uc
    init = (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(
        chunk_sums, init, (xp.reshape(n_chunks, uc, d), ap.reshape(n_chunks, uc))
    )

    new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
    shift = jnp.max(jnp.sum((new - centroids) ** 2, axis=1))
    return new, assign, shift


def kmeans(
    x: np.ndarray | jax.Array,
    nlist: int,
    seed: int = 42,
    max_iter: int = 100,
    tol: float = 1e-4,
    chunk: int = 131_072,
) -> tuple[np.ndarray, np.ndarray]:
    """Train k-means; returns (centroids [nlist, D] f32, assignments [N] i32).

    Init: a deterministic sample of distinct data points (the reference's
    n_init=1 posture; k-means++ refinement is unnecessary for IVF-grade
    centroids and the Lloyd iterations dominate quality).
    Empty clusters keep their previous centroid.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    n = x.shape[0]
    if nlist > n:
        raise ValueError(f"nlist={nlist} > n_vectors={n}")
    rng = np.random.default_rng(seed)
    init_idx = rng.choice(n, size=nlist, replace=False)
    centroids = x[jnp.asarray(np.sort(init_idx))]

    step = jax.jit(functools.partial(_lloyd_step, chunk=chunk))
    assign = None
    for _ in range(max_iter):
        centroids, assign, shift = step(x, centroids)
        if float(shift) < tol:
            break
    return np.asarray(centroids), np.asarray(assign)
