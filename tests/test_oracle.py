import numpy as np
import pytest

from rag_on_edge_tpu.runtime import oracle
from rag_on_edge_tpu.utils.datasets import ground_truth


def test_native_builds():
    assert oracle.native_available(), "native oracle failed to build (g++ expected in image)"


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_oracle_matches_numpy_gt(small_data, metric):
    base, queries = small_data
    ids, scores = oracle.oracle_search(queries, base, k=10, metric=metric)
    gt = ground_truth(base, queries, 10, metric=metric, backend="numpy")
    # compare by score values (robust to exact-tie id ordering)
    for row_ids, row_gt, q in zip(ids, gt, queries):
        s1 = base[row_ids] @ q if metric == "ip" else -np.sum((base[row_ids] - q) ** 2, axis=1)
        s2 = base[row_gt] @ q if metric == "ip" else -np.sum((base[row_gt] - q) ** 2, axis=1)
        np.testing.assert_allclose(np.sort(s1), np.sort(s2), rtol=1e-4)


def test_oracle_scores_descending(small_data):
    base, queries = small_data
    _, scores = oracle.oracle_search(queries, base, k=10, metric="ip")
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_oracle_input_validation(small_data):
    base, queries = small_data
    with pytest.raises(ValueError, match="metric"):
        oracle.oracle_search(queries, base, k=5, metric="cosine")
    with pytest.raises(ValueError, match="dim"):
        oracle.oracle_search(queries[:, :64], base, k=5)
    with pytest.raises(ValueError, match="k="):
        oracle.oracle_search(queries, base, k=0)
    with pytest.raises(ValueError, match="k="):
        oracle.oracle_search(queries, base, k=len(base) + 1)


def test_numpy_fallback_matches_native(small_data):
    base, queries = small_data
    ids_n, s_n = oracle.oracle_search(queries[:8], base, k=5, metric="ip")
    ids_f, s_f = oracle._numpy_fallback(
        queries[:8].astype(np.float32), base.astype(np.float32), 5, "ip"
    )
    np.testing.assert_allclose(s_n, s_f, rtol=1e-5)


def test_standalone_binary(tmp_path, small_data):
    import subprocess

    from rag_on_edge_tpu.utils import io

    path = oracle.build_binary()
    assert path, "cpu_oracle binary failed to build"
    base, queries = small_data
    io.write_fvecs(tmp_path / "base.fvecs", base)
    io.write_fvecs(tmp_path / "query.fvecs", queries[:8])
    out = subprocess.run(
        [path, str(tmp_path / "base.fvecs"), str(tmp_path / "query.fvecs"), "5",
         str(tmp_path), "ip"],
        capture_output=True, text=True, check=True,
    )
    assert "throughput_qps" in out.stdout
    lines = (tmp_path / "results.txt").read_text().strip().splitlines()
    assert len(lines) == 8 and lines[0].startswith("Query 0:")
    # first id of query 0 matches the library API
    ids, _ = oracle.oracle_search(queries[:1], base, k=5, metric="ip")
    assert f"({ids[0,0]}," in lines[0]
