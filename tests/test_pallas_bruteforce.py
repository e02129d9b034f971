import jax.numpy as jnp
import numpy as np
import pytest

from rag_on_edge_tpu.ops import quantize, topk
from rag_on_edge_tpu.ops.pallas_bruteforce import fused_topk_matmul


def test_fused_fp32_matches_reference(rng):
    base = jnp.asarray(rng.uniform(0, 100, size=(5000, 128)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 100, size=(16, 128)).astype(np.float32))
    vals, ids = fused_topk_matmul(q, base.T, k=10, tile_n=1024)
    ref_v, ref_i = topk.iterative_topk(q @ base.T, 10)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_i))


def test_fused_int8_matches_reference(rng):
    base = quantize.quantize_int8(
        jnp.asarray(rng.uniform(0, 141, size=(3000, 128)).astype(np.float32))
    ).values
    q = quantize.quantize_int8(
        jnp.asarray(rng.uniform(0, 141, size=(8, 128)).astype(np.float32)), per_row=True
    ).values
    vals, ids = fused_topk_matmul(q, base.T, k=5, tile_n=512)
    raw = jnp.asarray(q, jnp.int32) @ jnp.asarray(base, jnp.int32).T
    ref_v, ref_i = topk.iterative_topk(raw, 5)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_i))


def test_fused_unaligned_n(rng):
    """N not a tile multiple — padded tail must never win."""
    base = jnp.asarray(rng.uniform(0, 100, size=(1237, 64)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 100, size=(4, 64)).astype(np.float32))
    vals, ids = fused_topk_matmul(q, base.T, k=7, tile_n=512)
    assert np.asarray(ids).max() < 1237
    ref_v, _ = topk.iterative_topk(q @ base.T, 7)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)


def test_fused_single_tile(rng):
    base = jnp.asarray(rng.uniform(0, 100, size=(256, 128)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 100, size=(4, 128)).astype(np.float32))
    vals, ids = fused_topk_matmul(q, base.T, k=3, tile_n=512)
    ref_v, ref_i = topk.iterative_topk(q @ base.T, 3)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_i))


def test_fused_large_batch_b_grid(rng):
    """B > tile_b grids over query blocks; every block must keep its own
    running top-k (state re-initialized per block, emitted per block)."""
    base = jnp.asarray(rng.uniform(0, 100, size=(2000, 64)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 100, size=(300, 64)).astype(np.float32))
    vals, ids = fused_topk_matmul(q, base.T, k=4, tile_n=512, tile_b=64)
    ref_v, ref_i = topk.iterative_topk(q @ base.T, 4)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_i))


def test_fused_large_batch_binned(rng):
    """Binned selection with the b-grid: top-1 must survive binning."""
    base = jnp.asarray(rng.uniform(0, 100, size=(3000, 64)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 100, size=(130, 64)).astype(np.float32))
    vals, ids = fused_topk_matmul(q, base.T, k=10, tile_n=512, tile_b=32, nbins=128)
    ref_v, ref_i = topk.iterative_topk(q @ base.T, 10)
    np.testing.assert_allclose(np.asarray(vals[:, 0]), np.asarray(ref_v[:, 0]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids[:, 0]), np.asarray(ref_i[:, 0]))


def test_fused_dtype_mismatch_rejected(rng):
    base = jnp.zeros((100, 32), jnp.int8)  # transposed below
    q = jnp.zeros((2, 32), jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        fused_topk_matmul(q, base.T, k=3)
