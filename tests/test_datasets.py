import numpy as np

from rag_on_edge_tpu.utils import datasets


def test_synthetic_shapes_and_range():
    base, queries = datasets.make_synthetic(500, 10, dim=32, n_clusters=4, seed=1)
    assert base.shape == (500, 32) and queries.shape == (10, 32)
    assert base.dtype == np.float32
    assert base.min() >= 0.0 and base.max() <= 141.0
    # SIFT-like: integer-valued floats
    np.testing.assert_array_equal(base, np.round(base))


def test_synthetic_deterministic():
    a, _ = datasets.make_synthetic(100, 5, dim=16, n_clusters=2, seed=3)
    b, _ = datasets.make_synthetic(100, 5, dim=16, n_clusters=2, seed=3)
    np.testing.assert_array_equal(a, b)


def _naive_gt(base, queries, k, metric):
    if metric == "ip":
        scores = queries @ base.T
    else:
        scores = -(
            np.sum(queries**2, axis=1, keepdims=True)
            + np.sum(base**2, axis=1)
            - 2 * queries @ base.T
        )
    return np.argsort(-scores, kind="stable", axis=1)[:, :k]


def test_ground_truth_matches_naive(small_data):
    base, queries = small_data
    for metric in ("ip", "l2"):
        gt = datasets.ground_truth(base, queries, 10, metric=metric, chunk=300, backend="numpy")
        naive = _naive_gt(base, queries, 10, metric)
        # compare score sets, not raw ids, to be robust to exact ties
        for row_gt, row_naive, q in zip(gt, naive, queries):
            s = base[row_gt] @ q if metric == "ip" else -np.sum((base[row_gt] - q) ** 2, axis=1)
            s2 = base[row_naive] @ q if metric == "ip" else -np.sum((base[row_naive] - q) ** 2, axis=1)
            np.testing.assert_allclose(np.sort(s), np.sort(s2), rtol=1e-5)


def test_load_dataset_cache(tmp_path):
    ds = datasets.load_dataset("unit", root=str(tmp_path), gt_k=10)
    assert ds.base.shape == (2048, 128)
    assert ds.ground_truth_ip.shape[1] >= 10
    ds2 = datasets.load_dataset("unit", root=str(tmp_path), gt_k=10)
    np.testing.assert_array_equal(ds.base, ds2.base)
    np.testing.assert_array_equal(ds.ground_truth_ip, ds2.ground_truth_ip)


def test_chunk_topk_non_integer_scores_ordered_by_score():
    """The f64 composite key (score*2^25 - id) mis-orders genuinely
    different float scores when the gap is below delta_id/2^25 — e.g.
    0.75 at id 100 must NOT outrank 0.90 at id 9M.  Non-integer corpora
    must take the score-only branch."""
    scores = np.array([[0.75, 0.90, 0.10]], dtype=np.float32)
    ids = np.array([[100, 9_000_000, 5]], dtype=np.int64)
    top_scores, top_ids = datasets._chunk_topk(scores, ids, 2)
    np.testing.assert_array_equal(top_ids[0], [9_000_000, 100])
    np.testing.assert_allclose(top_scores[0], [0.90, 0.75])


def test_chunk_topk_integer_scores_tie_break_by_id():
    """Integer-valued corpora keep the tie-exact composite key: equal
    scores order by ascending id, including through the partition."""
    scores = np.array([[5.0, 7.0, 7.0, 7.0, 1.0]], dtype=np.float32)
    ids = np.array([[40, 30, 10, 20, 0]], dtype=np.int64)
    top_scores, top_ids = datasets._chunk_topk(scores, ids, 3)
    np.testing.assert_array_equal(top_ids[0], [10, 20, 30])
    np.testing.assert_allclose(top_scores[0], [7.0, 7.0, 7.0])
