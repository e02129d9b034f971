import jax.numpy as jnp
import numpy as np
import pytest

from rag_on_edge_tpu.ops.pallas_matmul import tiled_matmul
from rag_on_edge_tpu.parallel.spatial_gemm import make_mesh_2d, spatial_matmul, verify_matmul


def test_tiled_matmul_fp32(rng):
    a = jnp.asarray(rng.normal(size=(300, 200)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(200, 450)).astype(np.float32))
    c = tiled_matmul(a, b, bm=128, bn=256, bk=128)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a) @ np.asarray(b), rtol=1e-4, atol=1e-3)


def test_tiled_matmul_int8(rng):
    a = jnp.asarray(rng.integers(-127, 128, size=(64, 128)), dtype=jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, size=(128, 256)), dtype=jnp.int8)
    c = tiled_matmul(a, b, bm=64, bn=128, bk=64)
    assert c.dtype == jnp.int32
    expect = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
    np.testing.assert_array_equal(np.asarray(c, np.int64), expect)


def test_tiled_matmul_rejects_mismatch(rng):
    with pytest.raises(ValueError, match="contraction"):
        tiled_matmul(jnp.zeros((4, 8)), jnp.zeros((9, 4)))


def test_spatial_matmul_reference_workload(rng):
    """The reference's AIE workload shape: 128x128xN GEMM on a spatial array
    (benchmarks/README.md:33-38), here N=2560 on a 2x4 mesh."""
    mesh = make_mesh_2d(2, 4)
    a = rng.integers(-127, 128, size=(128, 128)).astype(np.int8)
    b = rng.integers(-127, 128, size=(128, 2560)).astype(np.int8)
    c = spatial_matmul(jnp.asarray(a), jnp.asarray(b), mesh)
    assert c.dtype == jnp.int32
    assert verify_matmul(a, b, np.asarray(c))


def test_spatial_matmul_fp32_4x2(rng):
    mesh = make_mesh_2d(4, 2)
    a = rng.normal(size=(256, 64)).astype(np.float32)
    b = rng.normal(size=(64, 128)).astype(np.float32)
    c = spatial_matmul(jnp.asarray(a), jnp.asarray(b), mesh)
    assert verify_matmul(a, b, np.asarray(c))


def test_verify_matmul_catches_errors(rng):
    a = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(8, 16)).astype(np.float32)
    c = a @ b
    assert verify_matmul(a, b, c)
    c_bad = c.copy()
    c_bad[3, 7] += 1.0
    assert not verify_matmul(a, b, c_bad)


def test_prepare_int8_operands(rng):
    """Normalize -> int8 -> pad pipeline (the AIE A.bin/B.bin analog):
    padded shapes, value range, and top-k order preservation."""
    from rag_on_edge_tpu.utils.preprocess import l2_normalize, prepare_int8_operands

    q = rng.normal(size=(33, 128)).astype(np.float32)
    b = rng.normal(size=(1000, 128)).astype(np.float32)
    a_i8, b_i8, scale = prepare_int8_operands(q, b)
    assert a_i8.shape == (64, 128) and b_i8.shape == (1024, 128)
    assert a_i8.dtype == np.int8 and abs(a_i8).max() <= 127
    assert (a_i8[33:] == 0).all() and (b_i8[1000:] == 0).all()
    # int8 inner products reproduce the normalized fp32 scores to within
    # quantization noise (argmax agreement is ill-posed here: iid Gaussian
    # directions make every pair of scores a near-tie).
    exact = l2_normalize(q) @ l2_normalize(b).T
    raw = a_i8[:33].astype(np.int32) @ b_i8[:1000].astype(np.int32).T
    np.testing.assert_allclose(raw * scale * scale, exact, atol=0.02)
