import jax.numpy as jnp
import pytest
import numpy as np

from rag_on_edge_tpu.ops import distances, quantize


def test_quantize_roundtrip_bounds(rng):
    x = jnp.asarray(rng.uniform(0, 141, size=(64, 128)).astype(np.float32))
    qt = quantize.quantize_int8(x)
    back = np.asarray(qt.values, dtype=np.float32) * float(qt.scale)
    err = np.abs(back - np.asarray(x)).max()
    assert err <= float(qt.scale) * 0.5 + 1e-6
    assert qt.values.dtype == jnp.int8


def test_per_row_scales(rng):
    x = jnp.asarray((rng.normal(size=(8, 32)) * np.geomspace(1, 100, 8)[:, None]).astype(np.float32))
    qt = quantize.quantize_int8(x, per_row=True)
    assert qt.scale.shape == (8, 1)
    maxq = np.abs(np.asarray(qt.values)).max(axis=1)
    assert (maxq == 127).all()  # every row uses the full int8 range


def test_int8_scores_monotone_topk(rng):
    """Raw int32 top-k ≈ fp32 top-k — the executeRaw ordering argument."""
    base = rng.uniform(0, 141, size=(500, 128)).astype(np.float32)
    queries = rng.uniform(0, 141, size=(16, 128)).astype(np.float32)
    bq = quantize.quantize_int8(jnp.asarray(base))
    qq = quantize.quantize_int8(jnp.asarray(queries), per_row=True)
    raw = distances.score_matrix_int8(qq.values, bq.values)
    assert raw.dtype == jnp.int32
    ids_int8 = np.argsort(-np.asarray(raw), axis=1)[:, :10]
    ids_fp32 = np.argsort(-(queries @ base.T), axis=1)[:, :10]
    hits = sum(len(np.intersect1d(a, b)) for a, b in zip(ids_int8, ids_fp32))
    assert hits / (16 * 10) >= 0.9  # int8 quantization keeps top-k nearly intact


def test_dequantize_matches_fp32(rng):
    base = rng.uniform(0, 10, size=(100, 64)).astype(np.float32)
    queries = rng.uniform(0, 10, size=(4, 64)).astype(np.float32)
    bq = quantize.quantize_int8(jnp.asarray(base))
    qq = quantize.quantize_int8(jnp.asarray(queries), per_row=True)
    raw = distances.score_matrix_int8(qq.values, bq.values)
    deq = np.asarray(quantize.dequantize(raw, qq.scale, bq.scale))
    np.testing.assert_allclose(deq, queries @ base.T, rtol=0.05, atol=2.0)


def test_calibrate_from_sample(rng):
    x = jnp.asarray(rng.uniform(0, 141, size=(100, 32)).astype(np.float32))
    full = quantize.calibrate_scale_from_sample(x)
    clipped = quantize.calibrate_scale_from_sample(x, percentile=95.0)
    assert float(clipped) < float(full)
    assert float(full) == pytest.approx(float(jnp.max(jnp.abs(x))) / 127.0)
