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
import os

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


@functools.partial(jax.jit, static_argnames=("nlist",))
def _kmeanspp_select(xs: jax.Array, first_idx: jax.Array, key: jax.Array,
                     nlist: int) -> jax.Array:
    """D²-sampling (k-means++, Arthur & Vassilvitskii 2007) over a
    device-resident sample ``xs`` [ns, D].

    Each round samples the next centroid with probability proportional to
    the squared distance to the nearest chosen centroid, implemented as a
    Gumbel-max over log(min_d) — an exact categorical sample, fully
    on-device, one [ns, D]·[D] matvec per round.  One jitted fori_loop =
    one device execution for all ``nlist`` rounds.
    """
    ns, d = xs.shape
    x_norms = jnp.sum(xs * xs, axis=1)

    c0 = xs[first_idx]
    min_d = jnp.maximum(x_norms - 2.0 * (xs @ c0) + jnp.sum(c0 * c0), 0.0)
    cents0 = jnp.zeros((nlist, d), jnp.float32).at[0].set(c0)

    def round_(i, state):
        min_dist, cents, k0 = state
        k0, sub = jax.random.split(k0)
        g = jax.random.gumbel(sub, (ns,))
        idx = jnp.argmax(jnp.log(jnp.maximum(min_dist, 1e-30)) + g)
        c = xs[idx]
        cents = cents.at[i].set(c)
        dist = jnp.maximum(x_norms - 2.0 * (xs @ c) + jnp.sum(c * c), 0.0)
        return jnp.minimum(min_dist, dist), cents, k0

    _, cents, _ = jax.lax.fori_loop(1, nlist, round_, (min_d, cents0, key))
    return cents


def kmeans(
    x: np.ndarray | jax.Array,
    nlist: int,
    seed: int = 42,
    max_iter: int = 100,
    tol: float = 1e-4,
    chunk: int = 131_072,
    init: str = "kmeans++",
    init_sample: int = 262_144,
    checkpoint: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Train k-means; returns (centroids [nlist, D] f32, assignments [N] i32).

    init "kmeans++" (default): D²-sampling on a ≤``init_sample``-row random
    sample (the afk-mc²/sampled-k-means++ recipe — sampling keeps the
    init O(nlist·sample) instead of O(nlist·N)); at 10M-scale the recall
    ceiling is coarse-quantizer quality, and random init measurably
    under-partitions dense regions.  init "sample": a deterministic sample
    of distinct data points (the reference's sklearn n_init=1 posture,
    ``create_ivf_model.py:101-111``).  Both seeded + deterministic.
    Empty clusters keep their previous centroid.

    checkpoint: optional path — save the centroids after every Lloyd
    iteration (atomic write) and RESUME from the file if it exists.  A
    10M-scale build is ~25 device-bound minutes on a relay-attached chip;
    a transient backend failure then costs only the current iteration,
    not the build (the §5.4 checkpoint/resume posture applied to the
    offline compiler stage).  The caller owns invalidation: use a path
    that encodes the build config (nlist/seed/data), as
    ``build_or_load_index`` does.  A resumed run replays the identical
    centroid trajectory (the checkpoint is the exact loop state).
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    n = x.shape[0]
    if nlist > n:
        raise ValueError(f"nlist={nlist} > n_vectors={n}")
    if init not in ("kmeans++", "sample"):
        raise ValueError(f"unknown init {init!r} ('kmeans++' | 'sample')")
    it0 = 0
    centroids = prev_centroids = None
    done = False
    if checkpoint is not None and os.path.exists(checkpoint):
        ck = np.load(checkpoint)
        if ({"centroids", "prev_centroids", "next_iter", "seed", "done"}
                <= set(ck.files)
                and ck["centroids"].shape == (nlist, x.shape[1])
                and int(ck["seed"]) == seed):
            centroids = jnp.asarray(ck["centroids"])
            prev_centroids = jnp.asarray(ck["prev_centroids"])
            it0 = int(ck["next_iter"])
            done = bool(ck["done"])
    if centroids is None:
        rng = np.random.default_rng(seed)
        if init == "kmeans++":
            ns = min(n, max(init_sample, 2 * nlist))
            if ns < n:
                idx = np.sort(rng.choice(n, size=ns, replace=False))
                xs = x[jnp.asarray(idx)]
            else:
                xs = x
            centroids = _kmeanspp_select(
                xs, jnp.int32(rng.integers(ns)), jax.random.PRNGKey(seed), nlist
            )
        else:
            init_idx = rng.choice(n, size=nlist, replace=False)
            centroids = x[jnp.asarray(np.sort(init_idx))]

    step = jax.jit(functools.partial(_lloyd_step, chunk=chunk))
    assign = None
    if done:
        it0 = max_iter  # checkpointed run had tol-converged: don't iterate
    for it in range(it0, max_iter):
        prev_centroids = centroids
        centroids, assign, shift = step(x, centroids)
        converged = float(shift) < tol
        if checkpoint is not None:
            _save_checkpoint(checkpoint, np.asarray(centroids), it + 1, seed,
                             np.asarray(prev_centroids), converged)
        if converged:
            break
    if assign is None:
        # Resumed past the checkpointed run's last step (crash after its
        # final checkpoint write but before the index was saved): REPLAY
        # that last step from the stored previous centroids — (centroids,
        # assign) come out exactly as the uninterrupted run produced them
        # (Lloyd assigns against the input centroids, then updates).
        centroids, assign, _ = step(x, prev_centroids)
    return np.asarray(centroids), np.asarray(assign)


def assign_top2(
    x: np.ndarray | jax.Array,
    centroids: np.ndarray | jax.Array,
    chunk: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Nearest-2 centroid assignment under squared L2 (chunked, on-device).

    Returns (a1 [N] i32, a2 [N] i32, d1 [N] f32, d2 [N] f32): the nearest /
    second-nearest centroid ids and their SQUARED distances.  The spilled-
    assignment build (``IVFIndex.build(spill_eps=)``) uses d2/d1 to find
    boundary vectors worth a second copy — the DB-side multi-probe lever
    (cf. ScaNN's SOAR redundant assignment).

    The default chunk caps the [chunk, nlist] fp32 distance matrix at
    ~1 GB of HBM: a fixed 131,072-row chunk OOM'd the one chip at
    nlist=8192 (two ~4.3 GB live buffers — the GEMM output and the
    negated top-k input — next to the 5 GB base upload)."""
    x = jnp.asarray(x, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    n = x.shape[0]
    if chunk is None:
        nlist = int(centroids.shape[0])
        chunk = min(131_072, max(16_384, (1 << 28) // max(1, nlist)))

    @jax.jit
    def _chunk(xc, cents):
        cn = jnp.sum(cents * cents, axis=1)
        s = jax.lax.dot_general(
            xc, cents, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.sum(xc * xc, axis=1, keepdims=True) - 2.0 * s + cn[None, :]
        negd, idx = jax.lax.top_k(-d, 2)
        return idx[:, 0], idx[:, 1], jnp.maximum(-negd[:, 0], 0.0), jnp.maximum(-negd[:, 1], 0.0)

    outs = [[], [], [], []]
    for lo in range(0, n, chunk):
        parts = _chunk(x[lo:lo + chunk], centroids)
        for acc, p in zip(outs, parts):
            acc.append(np.asarray(p))
    a1, a2, d1, d2 = (np.concatenate(o) for o in outs)
    return a1.astype(np.int32), a2.astype(np.int32), d1, d2


def _save_checkpoint(path: str, centroids: np.ndarray, next_iter: int,
                     seed: int, prev_centroids: np.ndarray,
                     done: bool) -> None:
    """prev_centroids lets a resume REPLAY the last step (recovering the
    exact assignments the uninterrupted run returned); done marks a
    tol-converged run so a resume doesn't iterate further."""
    tmp = f"{path}.tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:  # explicit handle: savez must not append .npz
        np.savez(f, centroids=centroids, next_iter=next_iter, seed=seed,
                 prev_centroids=prev_centroids, done=done)
    os.replace(tmp, path)
