"""Score-matrix computation on the MXU.

Unified scoring convention: **larger score = better match**, for both
metrics (the reference splits conventions — L2 ascending on CPU
(``cpu/cpu_baseline.cpp:239-242``) vs raw inner product descending on the
NPU (``main.cpp:33``); SURVEY §2.5 requires the rebuild make this
explicit).

- ``metric="ip"``:  score = q·b
- ``metric="l2"``:  score = -(‖b‖² - 2·q·b)  — the per-query ‖q‖² term is
  constant within a row and dropped, preserving ranking.

The GEMM is the [B,D]x[D,N] batched MatMul the reference bakes into its
ONNX models (``create_model.py:72-77``); here it is a single
``lax.dot_general`` that XLA tiles onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["base_norms_sq", "score_matrix", "score_matrix_int8"]


def base_norms_sq(base: jax.Array) -> jax.Array:
    """Per-vector squared L2 norms ‖b‖², precomputed once per index
    (analog of ``cpu_baseline.cpp:95-125``'s AVX2+OpenMP norm pass)."""
    b = base.astype(jnp.float32)
    return jnp.sum(b * b, axis=-1)


def score_matrix(
    queries: jax.Array,
    base: jax.Array,
    metric: str = "ip",
    base_norms: jax.Array | None = None,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Scores [B, N] (larger = better) for queries [B, D] against base [N, D].

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) casts the GEMM inputs; the
    accumulation stays float32 via ``preferred_element_type``.
    """
    q, b = queries, base
    if compute_dtype is not None:
        q = q.astype(compute_dtype)
        b = b.astype(compute_dtype)
    # fp32 inputs get true-f32 MXU passes: the TPU default lowers f32
    # matmuls to one bf16 pass (~0.4% error), which flips near-tie
    # rankings on large-magnitude L2 scores.  An EXPLICIT
    # compute_dtype=float32 means the same thing as None here — it must
    # not silently drop HIGHEST.
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype in (None, jnp.float32) else None)
    dots = jax.lax.dot_general(
        q,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == "ip":
        return dots
    if metric == "l2":
        if base_norms is None:
            base_norms = base_norms_sq(base)
        return 2.0 * dots - base_norms[None, :]
    raise ValueError(f"unknown metric {metric!r}")


def score_matrix_int8(queries_i8: jax.Array, base_i8: jax.Array) -> jax.Array:
    """INT8 inner-product scores with int32 accumulation on the MXU.

    The int32 scores are a positive-scale affine map of the fp32 scores, so
    per-query top-k over raw int32 is exact w.r.t. the quantized model —
    the reference's "skip dequantization" fast path (``QnnRunner.h:28-29``,
    ``executeRaw`` at ``QnnRunner.cpp:571-603``), done natively here.
    """
    return jax.lax.dot_general(
        queries_i8,
        base_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
