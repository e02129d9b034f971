"""Tiled matmul kernel with accumulator blocking — the MXU analog of the
reference's AIE GEMM microkernel.

The reference's `AMD_npu/Codes/mem/mm.cc` implements register-blocked
`aie::mmul` accumulator expansions (2×2 / 4×2 / 4×4) with per-dtype
micro-tile shapes; its host graph streams A/B tiles and accumulates C over
the K dimension in place (``whole_array.py:404-428``).  On TPU the MXU *is*
the micro-kernel; this Pallas kernel supplies the surrounding blocking:
a (M/bm, N/bn, K/bk) grid with an f32/int32 VMEM accumulator carried over
the K steps (`dimension_semantics`: K is the innermost, sequential axis),
emitting each C tile once its K reduction completes.

Supported dtypes mirror the reference's table (``mm.cc:746-860``) mapped to
MXU-native types: int8×int8→int32 (their i8), bf16×bf16→f32 (their bf16),
f32×f32→f32 (their i16 precision role).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tiled_matmul"]


def _kernel(a_ref, b_ref, out_ref, acc_ref, *, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )

    @pl.when(ki == n_k - 1)
    def _emit():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def tiled_matmul(
    a: jax.Array,
    b: jax.Array,
    bm: int = 256,
    bn: int = 512,
    bk: int = 512,
    interpret: bool | None = None,
):
    """C[M,N] = A[M,K] @ B[K,N] with explicit tiling and K-accumulation.

    int8 inputs accumulate in int32; floating inputs accumulate in f32.
    Shapes are zero-padded to tile multiples internally.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, ka = a.shape
    kb, n = b.shape
    if ka != kb:
        raise ValueError(f"contraction mismatch: {ka} vs {kb}")
    if a.dtype != b.dtype:
        raise ValueError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32

    bm_, bn_, bk_ = min(bm, m), min(bn, n), min(bk, ka)
    pm, pn, pk = (-m) % bm_, (-n) % bn_, (-ka) % bk_
    if pm or pk:
        a = jnp.pad(a, ((0, pm), (0, pk)))
    if pk or pn:
        b = jnp.pad(b, ((0, pk), (0, pn)))
    n_k = (ka + pk) // bk_

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=((m + pm) // bm_, (n + pn) // bn_, n_k),
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, k_: (i, k_), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk_, bn_), lambda i, j, k_: (k_, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, k_: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pm, n + pn), acc_dtype),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (m + pm) * (n + pn) * (ka + pk),
            bytes_accessed=(m + pm) * (ka + pk) * a.dtype.itemsize
            + (ka + pk) * (n + pn) * b.dtype.itemsize
            + (m + pm) * (n + pn) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)
    return out[:m, :n]
