"""Spatially-partitioned GEMM over a 2-D device mesh.

The TPU-native rebuild of the reference's AMD Versal AIE design
(`AMD_npu/Codes/whole_array.py`): there, a 4×4 AI-Engine array computes
C = A·B with A broadcast along each tile row (ObjectFIFO L2→L1 broadcast,
``whole_array.py:265-287``), B broadcast along each column (``:308-348``),
per-core K-sequential accumulation (``:417-426``), and C joined along
columns (``:350-390``).  On TPU the same dataflow is a 2-D
``jax.sharding.Mesh``:

- A is **row-sharded** (each mesh row owns an M-slab) and replicated
  across mesh columns — the row broadcast;
- B is **column-sharded** (each mesh column owns an N-slab) and replicated
  across rows — the column broadcast;
- each device runs one local matmul (the MXU plays the AIE core's
  ``aie::mmul``; K stays local exactly as in the reference), optionally
  through the tiled Pallas kernel;
- C emerges natively sharded over (rows, cols) — the "join" needs no
  collective at all, XLA's output sharding is the join.

Verification mirrors the reference host driver (`test.cpp:324-352`): full
CPU recomputation for small problems, stochastic sampling of 1000 random
positions above the same 2³⁰ element-count threshold (``test.cpp:49-50``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh_2d", "spatial_matmul", "verify_matmul"]

_FULL_VERIFY_MAX_ELEMS = 2**30  # M*N*K threshold, as test.cpp:49-50


def make_mesh_2d(rows: int, cols: int) -> Mesh:
    """A rows×cols mesh (the reference's array is 4×4, ``whole_array.py:124``)."""
    devs = jax.devices()
    if rows * cols > len(devs):
        raise ValueError(f"need {rows * cols} devices, have {len(devs)}")
    return Mesh(np.array(devs[: rows * cols]).reshape(rows, cols), ("row", "col"))


def spatial_matmul(a: jax.Array, b: jax.Array, mesh: Mesh, use_pallas_kernel: bool = False):
    """C = A[M,K] @ B[K,N] spatially partitioned over ``mesh``.

    int8 inputs accumulate in int32 (the reference runs int16→int32;
    int8/int32 is the MXU-native equivalent), floats in f32.  M and N must
    be divisible by the mesh rows/cols respectively (pad upstream, like
    ``preprocess.py:36-47`` pads to 32/256-row multiples).
    """
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {k} vs {k2}")
    rows, cols = mesh.devices.shape
    if m % rows:
        raise ValueError(f"M={m} must be divisible by the mesh's {rows} rows")
    if n % cols:
        raise ValueError(f"N={n} must be divisible by the mesh's {cols} cols")
    acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32

    a = jax.device_put(a, NamedSharding(mesh, P("row", None)))
    b = jax.device_put(b, NamedSharding(mesh, P(None, "col")))
    return _spatial_fn(mesh, use_pallas_kernel, str(acc.__name__))(a, b)


@functools.lru_cache(maxsize=None)
def _spatial_fn(mesh: Mesh, use_pallas_kernel: bool, acc_name: str):
    """One cached jitted shard_map per (mesh, kernel, accumulator) — a fresh
    jax.jit per call would recompile every time."""
    acc = jnp.int32 if acc_name == "int32" else jnp.float32

    def local_mm(a_blk, b_blk):
        if use_pallas_kernel:
            from rag_on_edge_tpu.ops.pallas_matmul import tiled_matmul

            return tiled_matmul(a_blk, b_blk)
        return jax.lax.dot_general(
            a_blk, b_blk, (((1,), (0,)), ((), ())), preferred_element_type=acc,
            # fp32 ranks/verifies against rtol=1e-4; the TPU default is a
            # single bf16 pass (~0.4% error) which spuriously fails
            # verify_matmul on a CORRECT run (CLAUDE.md precision rule).
            precision=(jax.lax.Precision.HIGHEST
                       if acc is jnp.float32 else None),
        )

    return jax.jit(
        jax.shard_map(
            local_mm,
            mesh=mesh,
            in_specs=(P("row", None), P(None, "col")),
            out_specs=P("row", "col"),
            check_vma=False,
        )
    )


def verify_matmul(a: np.ndarray, b: np.ndarray, c: np.ndarray, seed: int = 0,
                  samples: int = 1000, rtol: float = 1e-4, atol: float = 1e-2) -> bool:
    """Full or stochastic verification, the reference host driver's strategy
    (`test.cpp:277-352`, fixed seed for reproducibility `test.cpp:73`)."""
    m, k = a.shape
    n = b.shape[1]
    af, bf = a.astype(np.float64), b.astype(np.float64)
    if m * n * k <= _FULL_VERIFY_MAX_ELEMS:
        expect = af @ bf
        return np.allclose(np.asarray(c, dtype=np.float64), expect, rtol=rtol, atol=atol)
    rng = np.random.default_rng(seed)
    ii = rng.integers(0, m, samples)
    jj = rng.integers(0, n, samples)
    for i, j in zip(ii, jj):
        if not np.isclose(float(c[i, j]), float(af[i] @ bf[:, j]), rtol=rtol, atol=atol):
            return False
    return True
