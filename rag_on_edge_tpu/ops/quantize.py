"""INT8 quantization for MXU inner products.

The reference quantizes activations to affine **uint8** via QNN calibration
on raw SIFT queries (``convert_to_qnn.sh:96-151``; observed scales
``QnnRunner.cpp:70-71``) and runs a uint8 MatMul on the HTP.  The MXU's
native low-precision GEMM is symmetric **int8 × int8 → int32**, so the
rebuild uses symmetric per-tensor (or per-row) scales:

    x_i8 = clip(round(x / scale), -127, 127),  scale = max|x| / 127

For a single query row, int32 scores = (q_i8 · b_i8) are a positive-scale
monotone map of the quantized fp32 scores, so raw-int top-k is exact w.r.t.
the quantized model — the same ordering argument as the reference's
dequantization-skipping ``executeRaw`` path (``QnnRunner.h:28-29``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["QuantizedTensor", "calibrate_scale", "calibrate_scale_from_sample", "quantize_int8", "dequantize"]


class QuantizedTensor(NamedTuple):
    values: jax.Array  # int8
    scale: jax.Array  # f32 scalar (per-tensor) or [rows, 1] (per-row)

    @property
    def shape(self):
        return self.values.shape


def calibrate_scale(x: jax.Array, per_row: bool = False) -> jax.Array:
    """Symmetric scale(s) so that max|x| maps to 127."""
    if per_row:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(x))
    return jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0


def calibrate_scale_from_sample(sample: jax.Array, percentile: float = 100.0) -> jax.Array:
    """Activation calibration from a representative sample (the reference
    feeds query ``.raw`` dumps to its converter, ``convert_to_qnn.sh:96-151``).

    ``percentile`` < 100 clips outliers (finer resolution for the bulk of
    the distribution at the cost of saturating the tail).
    """
    mag = jnp.abs(sample.astype(jnp.float32))
    amax = jnp.max(mag) if percentile >= 100.0 else jnp.percentile(mag, percentile)
    return jnp.maximum(amax, 1e-12) / 127.0


def quantize_int8(
    x: jax.Array, scale: jax.Array | None = None, per_row: bool = False
) -> QuantizedTensor:
    """Quantize to symmetric int8; computes calibration scale if not given."""
    if scale is None:
        scale = calibrate_scale(x, per_row=per_row)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scale)


def dequantize(scores_i32: jax.Array, query_scale: jax.Array, base_scale: jax.Array) -> jax.Array:
    """int32 inner-product scores [B, N] → fp32 (scale product).
    ``query_scale`` may be per-row [B, 1]; ``base_scale`` must be a
    SCALAR — a per-row base scale ([N, 1]) would need an outer product
    and silently multiplies the wrong axis when B == N, so it is
    rejected."""
    if jnp.ndim(base_scale) and jnp.size(base_scale) != 1:
        raise ValueError(
            f"base_scale must be scalar (one global base scale); got shape "
            f"{jnp.shape(base_scale)} — per-row base scales need an outer "
            "product with the query scales"
        )
    return scores_i32.astype(jnp.float32) * (query_scale * base_scale)
