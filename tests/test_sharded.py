import jax
import numpy as np
import pytest

from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.models.ivf import IVFIndex
from rag_on_edge_tpu.parallel import ShardedBruteForceIndex, ShardedIVFIndex, make_mesh
from rag_on_edge_tpu.parallel.sharded import _partition_clusters
from rag_on_edge_tpu.utils.datasets import ground_truth
from rag_on_edge_tpu.utils.metrics import recall_at_k


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    return make_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sharded_bruteforce_matches_single(small_data, mesh, metric):
    base, queries = small_data
    single = BruteForceIndex(base, metric=metric, dtype="fp32", select="exact")
    sharded = ShardedBruteForceIndex(base, mesh, metric=metric, dtype="fp32")
    ids_s, s_s = single.search(queries, k=10)
    ids_m, s_m = sharded.search(queries, k=10)
    np.testing.assert_allclose(s_s, s_m, rtol=1e-5)
    assert recall_at_k(ids_m, ids_s, 10) >= 0.999


def test_sharded_bruteforce_unaligned_n(mesh, rng):
    """N not divisible by n_shards — padded rows must never appear."""
    base = rng.uniform(0, 100, size=(1003, 64)).astype(np.float32)
    queries = rng.uniform(0, 100, size=(9, 64)).astype(np.float32)
    sharded = ShardedBruteForceIndex(base, mesh, dtype="fp32")
    ids, scores = sharded.search(queries, k=5)
    assert ids.max() < 1003 and ids.min() >= 0
    gt = ground_truth(base, queries, 5, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 5) >= 0.99


def test_sharded_int8(small_data, mesh):
    base, queries = small_data
    sharded = ShardedBruteForceIndex(base, mesh, dtype="int8")
    ids, scores = sharded.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.85


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_sharded_int8_l2(small_data, mesh, engine):
    """int8 L2 per shard: alpha-rescaled dots minus the LOCAL norms bias,
    f32 selection, cross-shard merge in true-score units."""
    base, queries = small_data
    sharded = ShardedBruteForceIndex(base, mesh, metric="l2", dtype="int8",
                                     engine=engine)
    ids, scores = sharded.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.85
    rs = ShardedBruteForceIndex(base, mesh, metric="l2", dtype="int8",
                                engine=engine, rescore=True)
    ids_r, scores_r = rs.search(queries, k=10)
    assert recall_at_k(ids_r, gt, 10) >= 0.99
    true = 2.0 * np.take_along_axis(queries @ base.T, ids_r.astype(np.int64), axis=1) \
        - (base ** 2).sum(axis=1)[ids_r]
    np.testing.assert_allclose(scores_r, true, rtol=1e-4)


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sharded_bruteforce_engines_agree(small_data, mesh, metric):
    """Fused per-shard kernel vs per-shard XLA path: both exact for fp32."""
    base, queries = small_data
    px = ShardedBruteForceIndex(base, mesh, metric=metric, dtype="fp32", engine="xla")
    pp = ShardedBruteForceIndex(base, mesh, metric=metric, dtype="fp32", engine="pallas")
    ids_x, s_x = px.search(queries, k=10)
    ids_p, s_p = pp.search(queries, k=10)
    np.testing.assert_allclose(s_x, s_p, rtol=1e-5)
    np.testing.assert_array_equal(ids_x, ids_p)


def test_sharded_bruteforce_pallas_unaligned_n(mesh, rng):
    """Pallas engine masks the tail shard via the kernel's dynamic n_valid."""
    base = rng.uniform(-100, 100, size=(1003, 64)).astype(np.float32)
    queries = rng.uniform(-100, 100, size=(9, 64)).astype(np.float32)
    sharded = ShardedBruteForceIndex(base, mesh, dtype="fp32", engine="pallas")
    ids, scores = sharded.search(queries, k=5)
    assert ids.max() < 1003 and ids.min() >= 0
    gt = ground_truth(base, queries, 5, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 5) >= 0.99


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_sharded_rescore_restores_exactness(small_data, mesh, dtype):
    """2k binned selection + per-shard fp32 re-rank before the merge."""
    base, queries = small_data
    sharded = ShardedBruteForceIndex(base, mesh, dtype=dtype, rescore=True)
    ids, scores = sharded.search(queries, k=10)
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    assert recall_at_k(ids, gt, 10) >= 0.97
    # rescored values are exact fp32 inner products
    for row_ids, row_s, q in zip(ids[:8], scores[:8], queries[:8]):
        np.testing.assert_allclose(row_s, base[row_ids] @ q, rtol=1e-4)


def test_partition_clusters_covers_all():
    offsets = np.array([0, 10, 15, 40, 45, 80, 100])
    bounds = _partition_clusters(offsets, 3)
    assert bounds[0][0] == 0 and bounds[-1][1] == 6
    for (l1, h1), (l2, h2) in zip(bounds, bounds[1:]):
        assert h1 == l2  # contiguous, non-overlapping


def test_sharded_ivf_matches_single(small_data, mesh):
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    for nprobe in (4, 16):
        ids_s, v_s, c_s = single.search(queries, k=10, nprobe=nprobe)
        ids_m, v_m, c_m = sharded.search(queries, k=10, nprobe=nprobe)
        np.testing.assert_allclose(v_s, v_m, rtol=1e-5)
        assert c_s == c_m  # same clusters probed → same candidate count
        assert recall_at_k(ids_m, ids_s, 10) >= 0.999


def test_sharded_ivf_l2(small_data, mesh):
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    ids, _, _ = sharded.search(queries, k=10, nprobe=16)
    assert recall_at_k(ids, gt, 10) >= 0.999


def test_sharded_ivf_more_shards_than_queries_probe(small_data, mesh):
    """nprobe=1: most shards own nothing for a query; padding ids must be -1
    or valid, never garbage."""
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    ids, vals, _ = sharded.search(queries, k=10, nprobe=1)
    assert ((ids >= -1) & (ids < len(base))).all()
    # every valid id has a finite score
    assert np.isfinite(vals[ids >= 0]).all()


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sharded_cluster_major(small_data, mesh, metric):
    """Per-shard cluster-major kernel + ownership-masked join must track
    the exact single-chip search."""
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric=metric, seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    for nprobe in (4, 16):
        ids_s, v_s, c_s = single.search(queries, k=10, nprobe=nprobe, mode="query")
        ids_m, v_m, c_m = sharded.search(queries, k=10, nprobe=nprobe, mode="cluster")
        assert c_s == c_m
        assert recall_at_k(ids_m, ids_s, 10) >= 0.95
        # rescored scores are exact for agreeing ids
        agree = ids_m == ids_s
        np.testing.assert_allclose(v_m[agree], v_s[agree], rtol=1e-4)


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sharded_cluster_major_int8(small_data, mesh, metric):
    """int8 per-shard slabs (bias-column L2, alpha rescale) + fp32 rescore
    must track exact single-chip search like the single-chip int8 path."""
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric=metric, dtype="int8",
                            seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    ids_s, v_s, _ = single.search(queries, k=10, nprobe=16, mode="query")
    ids_m, v_m, _ = sharded.search(queries, k=10, nprobe=16, mode="cluster")
    assert recall_at_k(ids_m, ids_s, 10) >= 0.95
    agree = ids_m == ids_s
    np.testing.assert_allclose(v_m[agree], v_s[agree], rtol=1e-4)


def test_sharded_spill_recovery(small_data, mesh):
    """A tiny qcap spills; the per-shard recovery pass must restore the
    zero-spill results and report zero residual spill."""
    import jax.numpy as jnp
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    q = jnp.asarray(queries)
    b = q.shape[0]
    v_ref, i_ref, c_ref = sharded.search_device(q, k=10, nprobe=8, mode="cluster",
                                                qcap=b, recover=False)
    assert int(sharded.last_spill) == 0
    sharded.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8, recover=False)
    assert int(sharded.last_spill) > 0
    nblocks_local = sharded._cm_arrays["vectors_t"].shape[1]
    v1, i1, c1 = sharded.search_device(q, k=10, nprobe=8, mode="cluster", qcap=8,
                                       recover=True, recover_qcap=b,
                                       recover_blocks=nblocks_local)
    assert int(sharded.last_spill) == 0
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c1))
    np.testing.assert_allclose(np.sort(np.asarray(v_ref)), np.sort(np.asarray(v1)),
                               rtol=1e-5)
    assert recall_at_k(np.asarray(i1), np.asarray(i_ref), 10) == 1.0


def test_sharded_spill_recovery_multi_pass(small_data, mesh):
    """When one pass's capacity can't absorb the overflow, recover_passes
    drains it per shard; enough passes reach zero residual and full-qcap
    results."""
    import jax.numpy as jnp
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    q = jnp.asarray(queries)
    b = q.shape[0]
    nblocks_local = None
    residuals = []
    for passes in (1, 2, 8):
        kw = {}
        if nblocks_local is None:
            sharded.search_device(q, k=10, nprobe=8, mode="cluster", qcap=4,
                                  recover=False)
            nblocks_local = sharded._cm_arrays["vectors_t"].shape[1]
        v, i, _ = sharded.search_device(q, k=10, nprobe=8, mode="cluster", qcap=4,
                                        recover=True, recover_qcap=8,
                                        recover_blocks=nblocks_local,
                                        recover_passes=passes)
        residuals.append(int(sharded.last_spill))
    assert residuals[0] >= residuals[1] >= residuals[2] == 0
    v_ref, i_ref, _ = sharded.search_device(q, k=10, nprobe=8, mode="cluster",
                                            qcap=b, recover=False)
    assert recall_at_k(np.asarray(i), np.asarray(i_ref), 10) == 1.0
    np.testing.assert_allclose(np.sort(np.asarray(v_ref)), np.sort(np.asarray(v)),
                               rtol=1e-5)


@pytest.mark.parametrize("metric,dtype", [("l2", "int8"), ("ip", "fp32")])
def test_sharded_compact_store_matches_padded(small_data, mesh, metric, dtype):
    """store='compact' sources shard the cluster-major path (VERDICT r1 #3):
    kernel slabs sliced from the source index's own vectors_t, fp32
    rescore through the compact offset maps — results must match the
    padded-store sharded index exactly."""
    base, queries = small_data
    kw = dict(nlist=16, metric=metric, dtype=dtype, seed=42, max_iter=10)
    padded = IVFIndex.build(base, store="padded", **kw)
    compact = IVFIndex.build(base, store="compact", **kw)
    sh_p = ShardedIVFIndex(padded, mesh)
    sh_c = ShardedIVFIndex(compact, mesh)
    ids_p, s_p, cand_p = sh_p.search(queries, k=10, nprobe=4, mode="cluster")
    ids_c, s_c, cand_c = sh_c.search(queries, k=10, nprobe=4, mode="cluster")
    np.testing.assert_array_equal(ids_p, ids_c)
    np.testing.assert_allclose(s_p, s_c, rtol=1e-5)
    assert cand_p == cand_c


def test_sharded_compact_matches_single_chip(small_data, mesh):
    """Sharded compact cluster-major vs the single-chip compact index."""
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                            store="compact", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    ids_s, _, _ = single.search(queries, k=10, nprobe=4, mode="cluster")
    ids_m, _, _ = sharded.search(queries, k=10, nprobe=4, mode="cluster")
    assert recall_at_k(ids_m, ids_s, 10) >= 0.97


def test_sharded_compact_spill_recovery(small_data, mesh):
    """Recovery passes run against compact-store shards too."""
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                            store="compact", seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    import jax.numpy as jnp
    q = jnp.asarray(queries)
    sharded.search_device(q, k=10, nprobe=4, mode="cluster", qcap=2,
                          recover=False)
    nblocks_local = sharded._cm_arrays["vectors_t"].shape[1]
    vals, ids, _ = sharded.search_device(
        q, k=10, nprobe=4, mode="cluster", qcap=2, recover=True,
        recover_qcap=queries.shape[0], recover_blocks=nblocks_local,
        recover_passes=2,
    )
    assert int(np.asarray(sharded.last_spill)) == 0
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    assert recall_at_k(np.asarray(ids), gt, 10) >= 0.9


@pytest.mark.parametrize("metric,dtype", [("ip", "int8"), ("l2", "int8"),
                                          ("l2", "fp32")])
def test_sharded_accum_engine_matches_grouped(small_data, mesh, metric, dtype):
    """The planes-emit accum engine inside shard_map (the single-chip
    flagship kernel) must agree with the grouped-walk engine on the same
    shards, and both track the exact single-chip search.  `last_engine`
    records which kernel ran (engine attribution, VERDICT r2 item 7)."""
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric=metric, dtype=dtype,
                            seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    ids_a, v_a, c_a = sharded.search(queries, k=10, nprobe=16, mode="cluster")
    assert sharded._cm_accum_ok  # small fixture fits the accum layout gates
    assert sharded.last_engine == "pallas_accum"  # the auto default
    ids_g, v_g, c_g = sharded.search(queries, k=10, nprobe=16, mode="cluster",
                                     engine="pallas")
    assert sharded.last_engine == "pallas"
    assert c_a == c_g  # same probes → same candidate accounting
    assert recall_at_k(ids_a, ids_g, 10) >= 0.99
    agree = ids_a == ids_g
    np.testing.assert_allclose(v_a[agree], v_g[agree], rtol=1e-4)
    ids_s, _, _ = single.search(queries, k=10, nprobe=16, mode="query")
    assert recall_at_k(ids_a, ids_s, 10) >= 0.95


def test_sharded_accum_spill_recovery(small_data, mesh):
    """Accum main pass + grouped recovery pass (the single-chip pairing)
    must reach zero residual spill and full-qcap results."""
    import jax.numpy as jnp
    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                            seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    q = jnp.asarray(queries)
    b = q.shape[0]
    v_ref, i_ref, _ = sharded.search_device(
        q, k=10, nprobe=8, mode="cluster", qcap=b, recover=False,
        engine="pallas_accum")
    assert int(sharded.last_spill) == 0
    nblocks_local = sharded._cm_arrays["vectors_t"].shape[1]
    v1, i1, _ = sharded.search_device(
        q, k=10, nprobe=8, mode="cluster", qcap=8, recover=True,
        recover_qcap=b, recover_blocks=nblocks_local, recover_passes=2,
        engine="pallas_accum")
    assert int(sharded.last_spill) == 0
    assert recall_at_k(np.asarray(i1), np.asarray(i_ref), 10) >= 0.99


@pytest.mark.parametrize("tier_attr,threshold", [
    ("COARSE_BF16_MIN_NLIST", 8), ("COARSE_FUSED_MIN_NLIST", 8)])
def test_sharded_coarse_tier_matches_single(small_data, mesh, tier_attr, threshold):
    """The sharded paths ride the SAME coarse tier as the single-chip index
    (bf16 GEMM / fused Pallas kernel forced by lowering the class
    threshold): identical probe sets -> identical results, both modes."""
    base, queries = small_data
    saved = {a: getattr(IVFIndex, a) for a in
             ("COARSE_BF16_MIN_NLIST", "COARSE_FUSED_MIN_NLIST")}
    try:
        setattr(IVFIndex, tier_attr, threshold)
        single = IVFIndex.build(base, nlist=16, metric="l2", seed=42,
                                max_iter=10)
    finally:
        for a, v in saved.items():
            setattr(IVFIndex, a, v)
    want = "fused" if tier_attr == "COARSE_FUSED_MIN_NLIST" else "bf16"
    assert single._coarse_tier == want
    sharded = ShardedIVFIndex(single, mesh)
    assert sharded._coarse_tier == want
    ids_s, v_s, c_s = single.search(queries, k=10, nprobe=4)
    ids_m, v_m, c_m = sharded.search(queries, k=10, nprobe=4)
    np.testing.assert_allclose(v_s, v_m, rtol=1e-5)
    assert c_s == c_m  # same probes on every shard -> same candidate count
    assert recall_at_k(ids_m, ids_s, 10) >= 0.999
    ids_c, v_c, c_c = sharded.search(queries, k=10, nprobe=4, mode="cluster")
    assert c_c == c_s
    assert recall_at_k(ids_c, ids_s, 10) >= 0.99


def test_sharded_profile_stages(small_data, mesh):
    """The stage= knob (harness/profile_sharded) must run every cumulative
    prefix of the production shard body and leave the full program's
    results untouched — prefixes early-return chainable leaves through
    the SAME jitted entry (out_specs shape contract)."""
    from rag_on_edge_tpu.harness.profile_sharded import STAGES, profile

    base, queries = small_data
    single = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                            seed=42, max_iter=10)
    sharded = ShardedIVFIndex(single, mesh)
    rows = profile(sharded, queries.astype(np.float32), 10, 4, repeats=1)
    assert [r[0] for r in rows] == list(STAGES)
    assert all(np.isfinite(r[1]) and r[1] > 0 for r in rows)
    # full results are unchanged by the prefix machinery
    ids_m, _, _ = sharded.search(queries, k=10, nprobe=4, mode="cluster")
    ids_s, _, _ = single.search(queries, k=10, nprobe=4, mode="query")
    assert recall_at_k(ids_m, ids_s, 10) >= 0.95
