import numpy as np
import pytest

from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.utils.datasets import ground_truth
from rag_on_edge_tpu.utils.metrics import recall_at_k


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_fp32_exact(small_data, metric):
    base, queries = small_data
    idx = BruteForceIndex(base, metric=metric, dtype="fp32", select="exact")
    ids, scores = idx.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric=metric, backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.999


def test_two_stage_select_exact(small_data):
    base, queries = small_data
    a = BruteForceIndex(base, dtype="fp32", select="exact")
    b = BruteForceIndex(base, dtype="fp32", select="two_stage")
    ids_a, sa = a.search(queries, k=10)
    ids_b, sb = b.search(queries, k=10)
    np.testing.assert_allclose(sa, sb, rtol=1e-6)


def test_bf16_recall(small_data):
    base, queries = small_data
    idx = BruteForceIndex(base, dtype="bf16")
    ids, _ = idx.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.9


def test_int8_recall(small_data):
    base, queries = small_data
    idx = BruteForceIndex(base, dtype="int8")
    ids, scores = idx.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.85
    # dequantized scores approximate true dot products
    true = np.take_along_axis(queries @ base.T, ids.astype(np.int64), axis=1)
    np.testing.assert_allclose(scores, true, rtol=0.1, atol=true.max() * 0.02)


def test_batched_equals_full(small_data):
    base, queries = small_data
    idx = BruteForceIndex(base, dtype="fp32", select="exact")
    ids_full, s_full = idx.search(queries, k=5)
    ids_b, s_b = idx.search(queries, k=5, batch_size=7)  # exercises zero-pad tail
    np.testing.assert_array_equal(ids_full, ids_b)
    np.testing.assert_allclose(s_full, s_b, rtol=1e-6)


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_int8_l2(small_data, engine):
    """int8 L2: alpha-rescaled dots minus the norms bias, selected in f32
    (the IVF bias-column scheme on the brute-force path)."""
    base, queries = small_data
    idx = BruteForceIndex(base, metric="l2", dtype="int8", engine=engine)
    ids, scores = idx.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.85
    # reported scores approximate the true 2q·b − ‖b‖² values
    true = 2.0 * np.take_along_axis(queries @ base.T, ids.astype(np.int64), axis=1) \
        - (base ** 2).sum(axis=1)[ids]
    np.testing.assert_allclose(scores, true, rtol=0.1, atol=np.abs(true).max() * 0.02)
    # rescore restores exact recall and exact fp32 values
    idx_r = BruteForceIndex(base, metric="l2", dtype="int8", engine=engine, rescore=True)
    ids_r, scores_r = idx_r.search(queries, k=10)
    assert recall_at_k(ids_r, gt, 10) >= 0.99
    true_r = 2.0 * np.take_along_axis(queries @ base.T, ids_r.astype(np.int64), axis=1) \
        - (base ** 2).sum(axis=1)[ids_r]
    np.testing.assert_allclose(scores_r, true_r, rtol=1e-4)


@pytest.mark.parametrize("dtype,metric", [("fp32", "ip"), ("fp32", "l2"), ("bf16", "ip"), ("int8", "ip"), ("int8", "l2")])
def test_pallas_engine_matches_xla(small_data, dtype, metric):
    base, queries = small_data
    xla = BruteForceIndex(base, metric=metric, dtype=dtype, engine="xla", select="iterative")
    pls = BruteForceIndex(base, metric=metric, dtype=dtype, engine="pallas")
    ids_x, s_x = xla.search(queries, k=10)
    ids_p, s_p = pls.search(queries, k=10)
    if dtype == "fp32":
        np.testing.assert_array_equal(ids_x, ids_p)
        np.testing.assert_allclose(s_x, s_p, rtol=1e-5)
    else:
        assert recall_at_k(ids_p, ids_x, 10) >= 0.95


def test_stream_mode_matches_batched(small_data):
    import jax.numpy as jnp

    base, queries = small_data
    idx = BruteForceIndex(base, dtype="fp32", select="iterative")
    stream = jnp.asarray(queries[:32].reshape(4, 8, -1))
    v_s, i_s = idx.search_stream_device(stream, 5)
    ids, scores = idx.search(queries[:32], k=5, batch_size=8)
    np.testing.assert_array_equal(np.asarray(i_s).reshape(32, 5), ids)
    np.testing.assert_allclose(np.asarray(v_s).reshape(32, 5), scores, rtol=1e-6)


@pytest.mark.parametrize("dtype,engine", [("int8", "xla"), ("int8", "pallas"), ("bf16", "xla")])
def test_rescore_restores_exact_recall(small_data, dtype, engine):
    base, queries = small_data
    idx = BruteForceIndex(base, dtype=dtype, engine=engine, rescore=True)
    ids, scores = idx.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.99
    # rescored scores are exact fp32 dot products
    true = np.take_along_axis(queries @ base.T, ids.astype(np.int64), axis=1)
    np.testing.assert_allclose(scores, true, rtol=1e-5)


def test_engine_auto_selection(small_data, rng):
    """auto = xla for small N, the accum kernel once the matrix gets big."""
    base, _ = small_data
    assert BruteForceIndex(base, dtype="fp32").engine == "xla"
    big = rng.uniform(0, 100, size=(100_000, 16)).astype(np.float32)
    assert BruteForceIndex(big, dtype="fp32").engine == "accum"


def test_rescore_depth_pool(small_data):
    """rescore_depth widens the candidate pool fed to the exact fp32
    rescore; depth 1 still rescores k+1, invalid depth rejected."""
    base, queries = small_data
    import numpy as np
    from rag_on_edge_tpu.utils.datasets import ground_truth
    gt = ground_truth(base, queries, k=10, metric="l2", backend="numpy")
    deep = BruteForceIndex(base, metric="l2", dtype="int8", engine="accum",
                           rescore=True, rescore_depth=4)
    ids, _ = deep.search(queries, k=10)
    from rag_on_edge_tpu.utils.metrics import recall_at_k
    shallow = BruteForceIndex(base, metric="l2", dtype="int8", engine="accum",
                              rescore=True, rescore_depth=1)
    ids_s, _ = shallow.search(queries, k=10)
    assert recall_at_k(ids, gt, 10) >= recall_at_k(ids_s, gt, 10)
    with pytest.raises(ValueError, match="rescore_depth"):
        BruteForceIndex(base, rescore_depth=0)
