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
