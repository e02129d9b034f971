import jax.numpy as jnp
import numpy as np
import pytest

from rag_on_edge_tpu.models.ivf import IVFIndex, invert_probes
from rag_on_edge_tpu.utils.datasets import ground_truth
from rag_on_edge_tpu.utils.metrics import recall_at_k


@pytest.fixture(scope="module")
def ivf(small_data):
    base, _ = small_data
    return IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=20)


def test_invert_probes_roundtrip(rng):
    b, p, nlist = 64, 4, 16
    # distinct clusters per row
    probes = np.stack([rng.choice(nlist, size=p, replace=False) for _ in range(b)]).astype(np.int32)
    cq, slot, spill = invert_probes(jnp.asarray(probes), nlist, qcap=b)
    cq, slot = np.asarray(cq), np.asarray(slot)
    assert int(spill) == 0
    # every (query, probe) pair appears exactly at its recorded slot
    for q in range(b):
        for j in range(p):
            c, s = probes[q, j], slot[q, j]
            assert s >= 0 and cq[c, s] == q
    # counts match
    assert (cq >= 0).sum() == b * p


def test_invert_probes_spill_counted(rng):
    probes = jnp.zeros((8, 1), jnp.int32)  # all 8 queries probe cluster 0
    cq, slot, spill = invert_probes(probes, nlist=4, qcap=4)
    assert int(spill) == 4
    assert int((np.asarray(slot) >= 0).sum()) == 4


def test_cluster_major_matches_query_major(small_data, ivf):
    _, queries = small_data
    q = jnp.asarray(queries)
    for nprobe in (4, 16):
        v_q, i_q, c_q = ivf.search_device(q, k=10, nprobe=nprobe, mode="query")
        # XLA cluster engine is exact — must match query-major bit-for-bit.
        v_c, i_c, c_c = ivf.search_device(q, k=10, nprobe=nprobe, mode="cluster",
                                          qcap=q.shape[0], engine="xla")
        np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_c), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(c_q), np.asarray(c_c))
        assert recall_at_k(np.asarray(i_c), np.asarray(i_q), 10) >= 0.999
        # Pallas engine (binned + rescore) tracks it in recall.
        _, i_p, c_p = ivf.search_device(q, k=10, nprobe=nprobe, mode="cluster",
                                        qcap=q.shape[0], engine="pallas", rescore=True)
        np.testing.assert_array_equal(np.asarray(c_q), np.asarray(c_p))
        assert recall_at_k(np.asarray(i_p), np.asarray(i_q), 10) >= 0.95


def test_cluster_major_full_probe_exact(small_data, ivf):
    base, queries = small_data
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    ids, _, _ = ivf.search(queries, k=10, nprobe=16, mode="cluster")
    assert recall_at_k(ids, gt, 10) >= 0.99  # pallas engine: binned + rescored


def test_cluster_major_l2(small_data):
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=10)
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    ids, _, _ = idx.search(queries, k=10, nprobe=16, mode="cluster")
    assert recall_at_k(ids, gt, 10) >= 0.99  # pallas engine: binned + rescored


def test_fused_coarse_probing_matches_xla(small_data):
    """The fused-kernel coarse stage (auto at nlist >= COARSE_FUSED_MIN_NLIST)
    must pick the same probes as the XLA GEMM + iterative top-nprobe."""
    base, queries = small_data
    for coarse_metric in ("ip", "l2"):
        xla = IVFIndex.build(base, nlist=16, metric="ip",
                             coarse_metric=coarse_metric, seed=42, max_iter=10)
        old = IVFIndex.COARSE_FUSED_MIN_NLIST
        try:
            IVFIndex.COARSE_FUSED_MIN_NLIST = 8
            fused = IVFIndex.build(base, nlist=16, metric="ip",
                                   coarse_metric=coarse_metric, seed=42, max_iter=10)
        finally:
            IVFIndex.COARSE_FUSED_MIN_NLIST = old
        assert "centroids_t" in fused._arrays and "centroids_t" not in xla._arrays
        ids_x, v_x, c_x = xla.search(queries, k=10, nprobe=4)
        ids_f, v_f, c_f = fused.search(queries, k=10, nprobe=4)
        assert c_x == c_f  # identical probe sets → identical candidate counts
        np.testing.assert_array_equal(ids_x, ids_f)


def test_required_qcap_gives_zero_spill(small_data, ivf):
    """qcap from required_qcap must route every (query, cluster) pair."""
    _, queries = small_data
    import jax.numpy as jnp
    q = jnp.asarray(queries)
    qcap = ivf.required_qcap(q, nprobe=8)
    ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=qcap)
    assert int(ivf.last_spill) == 0
    # a deliberately tiny qcap must spill on the same batch
    ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8)
    assert int(ivf.last_spill) > 0


def test_auto_mode_picks_cluster_for_big_batches(ivf):
    assert ivf._pick_mode(batch=1024, nprobe=8) == "cluster"
    assert ivf._pick_mode(batch=1, nprobe=2) == "query"


def test_padded_layout_invariants(small_data, ivf):
    base, _ = small_data
    offs = np.asarray(ivf._arrays["offsets"])
    sizes = np.asarray(ivf._arrays["sizes"])
    assert (offs % ivf.PAD_BLOCK == 0).all()
    reorder = np.asarray(ivf._arrays["reorder"])
    vecs = ivf._vec_padded_host()  # padded fp32 is host-rebuilt, not device-resident
    # padded rows have reorder -1 and zero vectors; real rows match base
    for c in range(ivf.nlist):
        o, s = offs[c], sizes[c]
        assert (reorder[o : o + s] >= 0).all()
        np.testing.assert_array_equal(vecs[o : o + s], base[reorder[o : o + s]])
        pad_end = o + ((s + ivf.PAD_BLOCK - 1) // ivf.PAD_BLOCK) * ivf.PAD_BLOCK
        assert (reorder[o + s : pad_end] == -1).all()
        assert (vecs[o + s : pad_end] == 0).all()


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_pallas_cluster_kernel_matches_xla(small_data, metric):
    """The kernel's bin-max selection is approximate within a block; with
    the 2k candidate pool + rescore it must track the exact XLA engine."""
    import jax.numpy as jnp

    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric=metric, seed=42, max_iter=10)
    q = jnp.asarray(queries)
    for nprobe in (4, 16):
        v_x, i_x, c_x = idx.search_device(q, k=10, nprobe=nprobe, mode="cluster",
                                          qcap=q.shape[0], engine="xla", rescore=True)
        v_p, i_p, c_p = idx.search_device(q, k=10, nprobe=nprobe, mode="cluster",
                                          qcap=q.shape[0], engine="pallas", rescore=True)
        np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_p))
        assert recall_at_k(np.asarray(i_p), np.asarray(i_x), 10) >= 0.97


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_int8_cluster_engine(small_data, metric):
    """int8 fine scan (int32 MXU dots + L2 bias column) + fp32 rescore must
    track exact ground truth; reported scores are true-metric units."""
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric=metric, dtype="int8",
                         seed=42, max_iter=10)
    gt = ground_truth(base, queries, 10, metric=metric, backend="numpy")
    ids, vals, _ = idx.search(queries, k=10, nprobe=16, mode="cluster",
                              engine="pallas")
    assert recall_at_k(ids, gt, 10) >= 0.97
    # rescore is on by default for int8 → values are exact fp32 scores
    for row_ids, row_vals, q in zip(ids[:8], vals[:8], queries[:8]):
        m = row_ids >= 0
        want = base[row_ids[m]] @ q
        if metric == "l2":
            want = 2.0 * want - np.sum(base[row_ids[m]] ** 2, axis=1)
        np.testing.assert_allclose(row_vals[m], want, rtol=1e-4)


def test_int8_unrescored_scores_are_dequantized(small_data):
    """Without rescore the kernel's selected values must come back in
    true-score units (alpha-rescaled), not raw quantized dots."""
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="ip", dtype="int8",
                         seed=42, max_iter=10)
    import jax.numpy as jnp
    q = jnp.asarray(queries[:16])
    vals, ids, _ = idx.search_device(q, k=5, nprobe=16, mode="cluster",
                                     engine="pallas", rescore=False)
    vals, ids = np.asarray(vals), np.asarray(ids)
    for row_vals, row_ids, qq in zip(vals, ids, queries):
        m = row_ids >= 0
        np.testing.assert_allclose(row_vals[m], base[row_ids[m]] @ qq, rtol=0.05)


def test_empty_clusters_never_pollute_results(small_data):
    """Queries probing an empty cluster must not read unwritten kernel
    output rows (the pallas engine only writes rows of non-empty clusters)."""
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=20)
    # Forge an empty cluster: give cluster 3's rows to cluster 2.
    offs = idx._offsets_np.copy()
    offs[3] = offs[4]
    forged = IVFIndex(idx._centroids_np, idx._vectors_np, offs, idx._reorder_np,
                      metric="ip", coarse_metric="ip")
    assert int(np.diff(forged._offsets_np)[3]) == 0
    ids, vals, _ = forged.search(queries, k=10, nprobe=16, mode="cluster",
                                 engine="pallas")
    assert ((ids >= -1) & (ids < len(base))).all()
    # valid results must carry real scores (no zeros/garbage from
    # uninitialized rows): verify against recomputed dot products
    for row_ids, row_vals, q in zip(ids, vals, queries):
        m = row_ids >= 0
        np.testing.assert_allclose(row_vals[m], base[row_ids[m]] @ q, rtol=1e-2)


@pytest.mark.parametrize("dtype,metric", [("fp32", "ip"), ("fp32", "l2"),
                                          ("int8", "l2")])
def test_routed_engine_matches_gather_engine(small_data, dtype, metric):
    """In-kernel one-hot routing must give the same results as the
    pre-gathered routed table."""
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric=metric, dtype=dtype,
                         seed=42, max_iter=10)
    q = jnp.asarray(queries)
    v_g, i_g, c_g = idx.search_device(q, k=10, nprobe=8, mode="cluster",
                                      engine="pallas", rescore=True)
    v_r, i_r, c_r = idx.search_device(q, k=10, nprobe=8, mode="cluster",
                                      engine="pallas_routed", rescore=True)
    np.testing.assert_array_equal(np.asarray(c_g), np.asarray(c_r))
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(v_g), np.asarray(v_r), rtol=1e-5)


@pytest.mark.parametrize("engine", ["pallas", "pallas_routed"])
def test_spill_recovery_restores_results(small_data, ivf, engine):
    """The spilled-pair recovery pass must make a tiny-qcap search
    equivalent to a zero-spill (qcap=B) search."""
    _, queries = small_data
    q = jnp.asarray(queries)
    b = q.shape[0]
    v_ref, i_ref, c_ref = ivf.search_device(
        q, k=10, nprobe=8, mode="cluster", qcap=b, engine=engine, recover=False)
    assert int(ivf.last_spill) == 0
    # A deliberately tiny qcap spills without recovery...
    ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8,
                      engine=engine, recover=False)
    assert int(ivf.last_spill) > 0
    # ...and recovery brings residual spill to zero and restores results.
    nblocks = ivf._arrays["vectors_t"].shape[0]
    v1, i1, c1 = ivf.search_device(
        q, k=10, nprobe=8, mode="cluster", qcap=8, engine=engine,
        recover=True, recover_qcap=b, recover_blocks=nblocks)
    assert int(ivf.last_spill) == 0
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c1))
    np.testing.assert_allclose(np.sort(np.asarray(v_ref)), np.sort(np.asarray(v1)),
                               rtol=1e-5)
    assert recall_at_k(np.asarray(i1), np.asarray(i_ref), 10) == 1.0


def test_spill_recovery_int8_l2(small_data):
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                         seed=42, max_iter=10)
    q = jnp.asarray(queries)
    b = q.shape[0]
    v_ref, i_ref, _ = idx.search_device(q, k=10, nprobe=8, mode="cluster",
                                        qcap=b, recover=False)
    idx._ensure_kernel_state()
    nblocks = idx._arrays["vectors_t"].shape[0]
    v1, i1, _ = idx.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8,
                                  recover=True, recover_qcap=b,
                                  recover_blocks=nblocks)
    assert int(idx.last_spill) == 0
    assert recall_at_k(np.asarray(i1), np.asarray(i_ref), 10) == 1.0
    np.testing.assert_allclose(np.sort(np.asarray(v_ref)), np.sort(np.asarray(v1)),
                               rtol=1e-5)


def test_spill_recovery_residual_counted(small_data, ivf):
    """When the recovery pass itself runs out of capacity, the leftover is
    reported as residual spill (never silently lost)."""
    _, queries = small_data
    q = jnp.asarray(queries)
    ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8,
                      recover=False)
    full_spill = int(ivf.last_spill)
    ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8,
                      recover=True, recover_qcap=2,
                      recover_blocks=ivf._arrays["vectors_t"].shape[0])
    residual = int(ivf.last_spill)
    assert 0 < residual < full_spill


def test_spill_recovery_multi_pass(small_data, ivf):
    """Passes drain the spill monotonically; enough passes reach zero even
    when one pass's capacity cannot absorb the whole overflow."""
    _, queries = small_data
    q = jnp.asarray(queries)
    b = q.shape[0]
    nblocks = ivf._arrays["vectors_t"].shape[0]
    residuals = []
    for passes in (1, 2, 4):
        ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=4,
                          recover=True, recover_qcap=8,
                          recover_blocks=nblocks, recover_passes=passes)
        residuals.append(int(ivf.last_spill))
    assert residuals[0] > residuals[1] >= residuals[2]
    # full-capacity reference vs multi-pass small-capacity recovery
    v_ref, i_ref, _ = ivf.search_device(q, k=10, nprobe=8, mode="cluster",
                                        qcap=b, recover=False)
    v1, i1, _ = ivf.search_device(q, k=10, nprobe=8, mode="cluster", qcap=4,
                                  recover=True, recover_qcap=8,
                                  recover_blocks=nblocks, recover_passes=8)
    assert int(ivf.last_spill) == 0
    assert recall_at_k(np.asarray(i1), np.asarray(i_ref), 10) == 1.0
    np.testing.assert_allclose(np.sort(np.asarray(v_ref)), np.sort(np.asarray(v1)),
                               rtol=1e-5)


def test_spill_excludes_empty_clusters():
    """Pairs dropped on EMPTY clusters are not spill: they lose no
    candidates and can never be "placed" by recovery (an empty cluster has
    no blocks) — counting them made the recovery residual plateau above
    zero forever.  Exact duplicates tie at k-means init, so half the
    clusters here stay empty."""
    rng = np.random.default_rng(0)
    clumps = rng.normal(size=(8, 32)).astype(np.float32)
    base = np.repeat(clumps, 8, axis=0)
    idx = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=20)
    sizes = np.asarray(idx._arrays["sizes"])[: idx.nlist]
    n_nonempty = int((sizes > 0).sum())
    assert n_nonempty < idx.nlist  # the construction did produce empties

    q = jnp.asarray(clumps + 0.01 * rng.normal(size=clumps.shape).astype(np.float32))
    b = q.shape[0]
    # qcap=1, all clusters probed: every non-empty cluster drops B-1 lossy
    # pairs; empty-cluster pairs are excluded from the count.
    idx.search_device(q, k=4, nprobe=16, mode="cluster", qcap=1, engine="xla")
    assert int(idx.last_spill) == (b - 1) * n_nonempty

    # Recovery drains to zero despite the probed empty clusters (they used
    # to be permanently stuck in the todo set).
    idx._ensure_kernel_state()
    nblocks = idx._arrays["vectors_t"].shape[0]
    _, ids, _ = idx.search_device(q, k=4, nprobe=16, mode="cluster", qcap=1,
                                  engine="pallas", recover=True, recover_qcap=b,
                                  recover_blocks=nblocks, recover_passes=1)
    assert int(idx.last_spill) == 0
    _, i_ref, _ = idx.search_device(q, k=4, nprobe=16, mode="cluster", qcap=b)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(i_ref))


@pytest.mark.parametrize("metric,dtype", [("ip", "fp32"), ("l2", "int8")])
def test_compact_store_matches_padded(small_data, metric, dtype):
    """store='compact' (no padded fp32 on device) must return the same
    results as the padded store on the cluster-major pallas path, while
    rejecting the modes that need the padded copy."""
    base, queries = small_data
    q = jnp.asarray(queries)
    pad = IVFIndex.build(base, nlist=16, metric=metric, dtype=dtype,
                         seed=42, max_iter=10)
    cmp_ = IVFIndex.build(base, nlist=16, metric=metric, dtype=dtype,
                          seed=42, max_iter=10, store="compact")
    for nprobe in (4, 16):
        v_p, i_p, c_p = pad.search_device(q, k=10, nprobe=nprobe, mode="cluster",
                                          qcap=q.shape[0])
        v_c, i_c, c_c = cmp_.search_device(q, k=10, nprobe=nprobe)  # auto→cluster
        # same qcap for bit-identical routing
        v_c, i_c, c_c = cmp_.search_device(q, k=10, nprobe=nprobe, mode="cluster",
                                           qcap=q.shape[0])
        np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_c))
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_c))
        np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_c), rtol=1e-5)
    # memory: neither store materializes the padded fp32 copy by default
    # (the dual-padding diet — fp32 lives unpadded in original order)
    assert "vectors" not in cmp_._arrays and "vectors_f32" in cmp_._arrays
    assert "vectors" not in pad._arrays and "vectors_f32" in pad._arrays
    assert cmp_.memory_report()["TOTAL"] <= pad.memory_report()["TOTAL"] + \
        cmp_._arrays["vectors_f32"].size * 4
    # the stores converged: query-major and the XLA engine now work on
    # compact too (XLA materializes its padded copy lazily, both stores)
    v_q, i_q, _ = cmp_.search_device(q, k=10, nprobe=4, mode="query")
    v_qp, i_qp, _ = pad.search_device(q, k=10, nprobe=4, mode="query")
    np.testing.assert_array_equal(np.asarray(i_q), np.asarray(i_qp))
    v_x, i_x, _ = cmp_.search_device(q, k=10, nprobe=4, mode="cluster",
                                     engine="xla", qcap=q.shape[0])
    assert "vectors" in cmp_._arrays  # lazy padded copy, XLA engine only
    v_xp, i_xp, _ = pad.search_device(q, k=10, nprobe=4, mode="cluster",
                                      engine="xla", qcap=q.shape[0])
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_xp))


def test_bin_depth_and_rescore_k(small_data, ivf):
    """Deeper binned selection and a larger rescore pool are recall-safe
    knobs: results at depth 4 / pool 4k must be at least as good as the
    defaults (here: identical, since defaults already reach full recall)."""
    _, queries = small_data
    q = jnp.asarray(queries)
    v0, i0, c0 = ivf.search_device(q, k=10, nprobe=16, mode="cluster",
                                   qcap=q.shape[0])
    v1, i1, c1 = ivf.search_device(q, k=10, nprobe=16, mode="cluster",
                                   qcap=q.shape[0], bin_depth=4, rescore_k=40)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    assert recall_at_k(np.asarray(i1), np.asarray(i0), 10) == 1.0
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5)


def test_xla_engine_exact_on_skewed_clusters():
    """Regression: the XLA cluster engine's dynamic_slice CLAMPS the slab
    start for clusters within max_cluster_padded rows of the array end —
    row labels must come from the clamped start too, or tail clusters
    score earlier clusters' vectors under their own ids.  Needs strongly
    heterogeneous padded cluster sizes (k-means on the uniform fixture
    pads every cluster equally, hiding it), so the index is built
    directly from crafted slabs."""
    import numpy as np
    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.models.ivf import IVFIndex

    rng = np.random.default_rng(11)
    sizes = [600, 40, 24]  # pad_block=128 -> padded 640/128/128, smax=640
    centers = rng.uniform(30, 90, size=(3, 32))
    parts = [np.clip(np.round(centers[c] + rng.normal(0, 12, (s, 32))), 0, 141)
             for c, s in enumerate(sizes)]
    vectors_reordered = np.concatenate(parts).astype(np.float32)
    offsets = np.array([0, 600, 640, 664], np.int32)
    reorder = np.arange(664, dtype=np.int32)
    idx = IVFIndex(centers.astype(np.float32), vectors_reordered, offsets,
                   reorder, metric="l2", pad_block=128)
    # the last cluster's slab start (768) + smax (640) > n_padded (896)
    assert idx.n_padded - idx.max_cluster_padded < int(offsets[2]) + 200

    queries = vectors_reordered[::37][:16] + 1.0
    bf = BruteForceIndex(vectors_reordered, metric="l2", dtype="fp32",
                         select="exact")
    ids_bf, s_bf = bf.search(queries, k=5)
    ids, scores, _ = idx.search(queries, k=5, nprobe=3, mode="cluster",
                                engine="xla")
    np.testing.assert_allclose(np.asarray(scores), s_bf, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), ids_bf)


# Probe-skew tables measured on the real cached indexes (round 5,
# results/qcap_calib_*.json + the base self-probes that validated them):
# hottest-cell probe fraction per nprobe.
_SKEW_10M_8192 = {"1": 0.00146, "2": 0.00537, "4": 0.01269, "8": 0.03052,
                  "16": 0.06238, "32": 0.12195}
_SKEW_1M_1024 = {"1": 0.005, "2": 0.0131, "4": 0.032, "8": 0.0718,
                 "16": 0.1461, "32": 0.2783}
_SKEW_1M_4096 = {"1": 0.0026, "2": 0.0771, "4": 0.209, "8": 0.3964,
                 "16": 0.6421, "32": 0.8589}


def _fake_index(nlist, skew=None, n=1_000_000):
    # The heuristics are pure functions of (nlist, config, batch,
    # nprobe) — exercise them at 10M-scale nlist without a 10M build.
    idx = IVFIndex.__new__(IVFIndex)
    idx.nlist = nlist
    idx.n = n
    idx.config = {"probe_skew": skew} if skew else {}
    # No stored vectors: the lazy self-probe is impossible, so a
    # skew-less fake exercises the clip-rule FALLBACK path.
    idx._vectors_np = None
    return idx


def test_recovery_heuristics_skew_aware():
    """Round-4 regression (10M np-inversion anomaly): at fine quantizers
    the hottest cluster's load is ~30x the mean (measured required_qcap
    480 vs mean 16 at nlist=8192/np=16/B=8192), so the mean-load rule
    left auto-recovery OFF while 21.8K lossy pairs/batch were dropped —
    recall@10 INVERTED with nprobe (0.9981/0.9955/0.9619).  With the
    round-5 measured skew table the heuristics must reproduce the
    decisions round 4 measured as optimal: recovery OFF at np=4
    (required 110 < qcap 128), 1 pass at np=8 (232 ≤ 256), 3 passes at
    np=16 (477 ≤ 512)."""
    fine = _fake_index(8192, _SKEW_10M_8192, n=10_000_000)
    # auto_qcap at B=8192: mean loads 4/8/16 -> capped at 128
    assert IVFIndex._auto_qcap(fine, 8192, 4) == 128
    assert IVFIndex._auto_qcap(fine, 8192, 16) == 128
    # est max load reads the measured table (frac * batch)
    assert IVFIndex._est_max_load(fine, 8192, 16) == pytest.approx(
        0.06238 * 8192, rel=1e-6)
    # recovery engages at np>=8 (measured spill), stays off at np=4
    # (measured required_qcap 110 < qcap 128, zero spill)
    assert not IVFIndex._auto_recover(fine, 8192, 4)
    assert IVFIndex._auto_recover(fine, 8192, 8)
    assert IVFIndex._auto_recover(fine, 8192, 16)
    # pass sizing reaches the measured required capacity: np=16 needs 480
    # total -> 3 passes of 128 on top of qcap 128 (measured: spill -> 0,
    # recall@10 0.9619 -> 0.9983); np=8 needs 256 -> 1 pass
    assert IVFIndex._auto_recover_passes(fine, 8192, 16, recover_qcap=128) == 3
    assert IVFIndex._auto_recover_passes(fine, 8192, 8, recover_qcap=128) == 1
    # 1M headline (nlist=1024, B=8192, np=4): measured est 262 exceeds
    # qcap 256 by only ~6 pairs on one cell — recovery must stay OFF
    # (the smallness threshold; a strict est > qcap test would tax the
    # 596K QPS headline ~20% to recover 5 measured lossy pairs)
    coarse = _fake_index(1024, _SKEW_1M_1024)
    assert IVFIndex._est_max_load(coarse, 8192, 4) > 256
    assert not IVFIndex._auto_recover(coarse, 8192, 4)
    # ... but np=8 now engages with 2 passes (measured required 555 >
    # round-4's 1-pass capacity 512 — the measured table CORRECTED an
    # under-provisioning the clip rule hid)
    assert IVFIndex._auto_recover(coarse, 8192, 8)
    assert IVFIndex._auto_recover_passes(coarse, 8192, 8, recover_qcap=256) == 2


def test_skew_formula_has_no_predictive_power_across_datasets():
    """The round-5 finding that killed the clip(nlist/256, 8, 32) rule:
    1M at nlist=4096 measures max/mean 155-194x (4 cells each drew
    15-19% of all queries) where the rule predicts 16x.  The measured
    table must drive recovery to its max_passes clamp there — the old
    rule silently dropped ~19% of probe pairs (the round-4 np-inversion
    failure class at a point its two calibration anchors bracketed)."""
    path = _fake_index(4096, _SKEW_1M_4096)
    # measured: required_qcap 1553 at np=4/B=8192; est = frac*B = 1712
    assert IVFIndex._est_max_load(path, 8192, 4) == pytest.approx(
        0.209 * 8192, rel=1e-6)
    assert IVFIndex._auto_recover(path, 8192, 4)
    assert IVFIndex._auto_recover_passes(path, 8192, 4, recover_qcap=128) == 8
    # fallback (no table, no vectors): the clip rule under-estimates 12x
    # here — kept only because old artifacts without stored vectors can't
    # self-measure
    bare = _fake_index(4096)
    assert IVFIndex._est_max_load(bare, 8192, 4) == pytest.approx(
        16.0 * 8.0)  # clip(4096/256)=16 x mean 8


def test_probe_skew_measured_persisted_and_lazy(tmp_path):
    """build() measures the self-probe table and save/load round-trips
    it; a pre-round-5 artifact (no table in config) lazily self-measures
    on first use and caches into config so a later save persists it."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(4000, 32)).astype(np.float32)
    idx = IVFIndex.build(base, nlist=32, metric="l2", dtype="fp32", seed=42)
    tab = idx.config["probe_skew"]
    assert set(tab) == {"1", "2", "4", "8", "16", "32"}
    # fractions are monotone in nprobe and in (0, 1]
    fr = [tab[k] for k in ("1", "2", "4", "8", "16", "32")]
    assert all(0 < a <= b <= 1.0 for a, b in zip(fr, fr[1:]))
    d = str(tmp_path / "idx")
    idx.save(d)
    idx2 = IVFIndex.load(d)
    assert idx2.config["probe_skew"] == tab
    # retrofit: wipe the stored table -> first _est_max_load self-measures
    del idx2.config["probe_skew"]
    est = idx2._est_max_load(2048, 4)
    assert est == pytest.approx(idx2.config["probe_skew"]["4"] * 2048)
    # the lazy table tracks the build-time one (same distribution, ~same
    # sample) within a loose factor
    assert idx2.config["probe_skew"]["4"] == pytest.approx(tab["4"], rel=0.5)


def test_probe_skew_concentrated_queries():
    """A query batch that all probes one cell must measure frac -> 1.0
    and drive the load estimate to ~the full batch."""
    rng = np.random.default_rng(0)
    cents = rng.normal(size=(16, 8)).astype(np.float32) * 10
    sample = np.repeat(cents[3:4], 64, axis=0) + rng.normal(
        size=(64, 8)).astype(np.float32) * 1e-3
    tab = IVFIndex.measure_probe_skew(cents, sample, "l2")
    assert tab["1"] == 1.0


def test_search_pads_tail_with_repeats(small_data, ivf):
    """The host API's tail padding must not perturb REAL rows: zero-pad
    rows all probe the same few cells and exhaust those clusters' qcap
    slots (measured round 4: 6384 zero-pad rows carried ~94K lossy pairs
    and evicted real pairs).  Cyclic-repeat padding keeps tail-batch
    results identical to the unpadded search."""
    _, queries = small_data
    ids_full, _, _ = ivf.search(queries, k=5, nprobe=4, mode="cluster")
    # batch_size=24 over 32 queries -> second batch is 8 real + 16 pad
    ids_pad, _, _ = ivf.search(queries, k=5, nprobe=4, batch_size=24,
                               mode="cluster")
    np.testing.assert_array_equal(ids_pad, ids_full)
