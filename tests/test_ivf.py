import numpy as np
import pytest

from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.models.ivf import IVFIndex
from rag_on_edge_tpu.utils.datasets import ground_truth
from rag_on_edge_tpu.utils.metrics import recall_at_k


@pytest.fixture(scope="module")
def ivf_ip(small_data):
    base, _ = small_data
    return IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=20)


def test_build_layout_invariants(small_data, ivf_ip):
    base, _ = small_data
    idx = ivf_ip
    # reordered rows map back to original vectors
    np.testing.assert_array_equal(idx._vectors_np, base[idx._reorder_np])
    # offsets cover all vectors, sizes positive-sum
    assert idx._offsets_np[0] == 0 and idx._offsets_np[-1] == len(base)
    assert (np.diff(idx._offsets_np) >= 0).all()


def test_full_probe_equals_bruteforce(small_data, ivf_ip):
    """nprobe = nlist probes every cluster → results must equal exact search."""
    base, queries = small_data
    bf = BruteForceIndex(base, metric="ip", dtype="fp32", select="exact")
    ids_bf, s_bf = bf.search(queries, k=10)
    ids_ivf, s_ivf, avg_cand = ivf_ip.search(queries, k=10, nprobe=16)
    np.testing.assert_allclose(s_ivf, s_bf, rtol=1e-5)
    assert avg_cand == len(base)  # every vector scanned
    assert recall_at_k(ids_ivf, ids_bf, 10) >= 0.999


def test_recall_increases_with_nprobe(small_data, ivf_ip):
    base, queries = small_data
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    recalls = []
    for nprobe in (1, 4, 16):
        ids, _, _ = ivf_ip.search(queries, k=10, nprobe=nprobe)
        recalls.append(recall_at_k(ids, gt, 10))
    assert recalls[-1] >= recalls[0]
    assert recalls[-1] >= 0.999  # full probe is exact
    assert recalls[1] >= 0.5  # quarter of clusters already decent


def test_probe_chunking_invariant(small_data, ivf_ip):
    """Chunked probe scan must give identical results to single-chunk."""
    _, queries = small_data
    import jax.numpy as jnp

    q = jnp.asarray(queries[:8])
    v1, i1, c1 = ivf_ip.search_device(q, k=5, nprobe=8, probe_chunk=8)
    v2, i2, c2 = ivf_ip.search_device(q, k=5, nprobe=8, probe_chunk=3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_l2_metric(small_data):
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20)
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    ids, _, _ = idx.search(queries, k=10, nprobe=16, mode="query")  # exact path
    assert recall_at_k(ids, gt, 10) >= 0.999


def test_save_load_roundtrip(tmp_path, small_data, ivf_ip):
    _, queries = small_data
    ivf_ip.save(str(tmp_path / "index"))
    loaded = IVFIndex.load(str(tmp_path / "index"))
    ids_a, s_a, _ = ivf_ip.search(queries, k=5, nprobe=4)
    ids_b, s_b, _ = loaded.search(queries, k=5, nprobe=4)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-6)
    # artifact inventory matches the reference's reordered set (SURVEY §2.3)
    for f in loaded._FILES.values():
        assert (tmp_path / "index" / f).exists()

def test_load_scattered_csr_artifacts(tmp_path, small_data, ivf_ip):
    """A reference-format scattered index set (create_ivf_model.py:151-166:
    original-order vectors.npy + CSR cluster_indices.npy) loads and searches
    identically to the reordered set it was derived from."""
    import json, os
    _, queries = small_data
    d = tmp_path / "scattered"
    os.makedirs(d)
    # reconstruct the scattered artifacts from the reordered index
    reorder = ivf_ip._reorder_np                      # reordered row -> original id
    original = np.empty_like(ivf_ip._vectors_np)
    original[reorder] = ivf_ip._vectors_np            # back to original order
    np.save(d / "vectors.npy", original)
    np.save(d / "cluster_indices.npy", reorder)       # CSR indices == reorder map
    np.save(d / "centroids.npy", ivf_ip._centroids_np)
    np.save(d / "cluster_offsets.npy", ivf_ip._offsets_np)
    with open(d / "ivf_config.json", "w") as f:
        json.dump({k: v for k, v in ivf_ip.config.items()}, f)
    loaded = IVFIndex.load(str(d))
    ids_a, s_a, _ = ivf_ip.search(queries, k=5, nprobe=4)
    ids_b, s_b, _ = loaded.search(queries, k=5, nprobe=4)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-6)


def test_bf16_fine_scan(small_data):
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="ip", dtype="bf16", seed=42, max_iter=10)
    gt = ground_truth(base, queries, 10, metric="ip", backend="numpy")
    ids, _, _ = idx.search(queries, k=10, nprobe=16)
    assert recall_at_k(ids, gt, 10) >= 0.9


def test_small_batch_padding(small_data, ivf_ip):
    _, queries = small_data
    ids_a, _, _ = ivf_ip.search(queries, k=5, nprobe=4)
    ids_b, _, _ = ivf_ip.search(queries, k=5, nprobe=4, batch_size=5)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_stream_mode_matches_query_major(small_data, ivf_ip):
    import jax.numpy as jnp

    _, queries = small_data
    stream = jnp.asarray(queries[:32].reshape(4, 8, -1))
    v_s, i_s, c_s = ivf_ip.search_stream_device(stream, k=5, nprobe=4)
    ids, scores, _ = ivf_ip.search(queries[:32], k=5, nprobe=4, batch_size=8, mode="query")
    np.testing.assert_array_equal(np.asarray(i_s).reshape(32, 5), ids)
    np.testing.assert_allclose(np.asarray(v_s).reshape(32, 5), scores, rtol=1e-6)


def test_stream_cluster_mode(small_data, ivf_ip):
    """Cluster stream mode flattens M micro-batches into one cluster-major
    batch; ids must track the query-major result."""
    import jax.numpy as jnp
    from rag_on_edge_tpu.utils.metrics import recall_at_k

    _, queries = small_data
    stream = jnp.asarray(queries[:32].reshape(4, 8, -1))
    v_s, i_s, c_s = ivf_ip.search_stream_device(stream, k=5, nprobe=4, mode="cluster")
    assert v_s.shape == (4, 8, 5) and c_s.shape == (4, 8)
    ids, _, _ = ivf_ip.search(queries[:32], k=5, nprobe=4, mode="query")
    assert recall_at_k(np.asarray(i_s).reshape(32, 5), ids, 5) >= 0.95


def test_error_paths_and_edge_cases(small_data, ivf_ip):
    """The contract probes: bad args raise cleanly, nprobe clips to nlist,
    k beyond the probed candidate pool pads with id -1."""
    base, queries = small_data
    import pytest
    from rag_on_edge_tpu.models.ivf import IVFIndex

    with pytest.raises(ValueError, match="metric"):
        IVFIndex.build(base, nlist=4, metric="cosine")
    with pytest.raises(ValueError, match="dtype"):
        IVFIndex.build(base, nlist=4, dtype="fp8")
    with pytest.raises(ValueError, match="coarse_metric"):
        IVFIndex.build(base, nlist=4, coarse_metric="dot")

    # nprobe > nlist clips: candidate count equals the whole database
    _, _, avg_cand = ivf_ip.search(queries[:8], k=5, nprobe=10_000)
    assert avg_cand == base.shape[0]

    # k larger than the probed pool pads rows with id -1 and -inf scores
    ids, scores, _ = ivf_ip.search(queries[:4], k=base.shape[0] // 4, nprobe=1)
    assert (ids == -1).any()
    assert np.isneginf(scores[ids == -1]).all()
    assert (ids[:, 0] >= 0).all()


# ------------------------------------------------------------- spilled build


@pytest.fixture(scope="module")
def spill_pair(small_data):
    """Same data/config with and without spilled (redundant) assignment."""
    base, _ = small_data
    plain = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20)
    spilled = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20,
                             spill_eps=0.6)
    return plain, spilled


def test_spill_build_inventory(small_data, spill_pair):
    base, _ = small_data
    plain, spilled = spill_pair
    assert not plain.spilled and plain.n_base == plain.n == len(base)
    assert spilled.spilled and spilled.n_base == len(base)
    assert spilled.n == len(base) + spilled.config["n_spilled"]
    assert spilled.config["n_spilled"] > 0
    assert spilled.config["n_vectors"] == len(base)  # schema: base count
    # every stored row still maps to a real base vector
    np.testing.assert_array_equal(
        spilled._vectors_np, base[spilled._reorder_np])
    # offsets cover all stored rows
    assert spilled._offsets_np[-1] == spilled.n


def test_spill_no_duplicate_ids(small_data, spill_pair):
    _, queries = small_data
    _, spilled = spill_pair
    for mode in ("query", "cluster"):
        ids, _, _ = spilled.search(queries, k=10, nprobe=4, mode=mode)
        ids = np.asarray(ids)
        for row in ids:
            real = row[row >= 0]
            assert len(set(real.tolist())) == len(real), (mode, row)


def test_spill_lifts_recall_at_fixed_nprobe(small_data, spill_pair):
    base, queries = small_data
    plain, spilled = spill_pair
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    r_plain = []
    r_spill = []
    # nprobe=1 is the regime where coarse misses exist on this corpus
    # (plain 0.972 → spilled 1.000 measured; np=2 already saturates).
    for mode in ("query", "cluster"):
        ids_p, _, cand_p = plain.search(queries, k=10, nprobe=1, mode=mode)
        ids_s, _, cand_s = spilled.search(queries, k=10, nprobe=1, mode=mode)
        r_plain.append(recall_at_k(np.asarray(ids_p), gt, 10))
        r_spill.append(recall_at_k(np.asarray(ids_s), gt, 10))
        assert cand_s > cand_p  # spilled copies are scanned
    # strictly better in at least one mode, never worse in any
    assert all(s >= p for s, p in zip(r_spill, r_plain)), (r_spill, r_plain)
    assert any(s > p for s, p in zip(r_spill, r_plain)), (r_spill, r_plain)


def test_spill_full_probe_matches_exact(small_data, spill_pair):
    """nprobe=nlist on a spilled index must equal exact search (dedup
    returns each id once with its exact fp32 score)."""
    base, queries = small_data
    _, spilled = spill_pair
    bf = BruteForceIndex(base, metric="l2", dtype="fp32", select="exact")
    ids_bf, s_bf = bf.search(queries, k=10)
    ids_s, s_s, _ = spilled.search(queries, k=10, nprobe=16)
    np.testing.assert_allclose(s_s, s_bf, rtol=1e-5)
    assert recall_at_k(np.asarray(ids_s), np.asarray(ids_bf), 10) >= 0.999


def test_spill_save_load_roundtrip(tmp_path, small_data, spill_pair):
    _, queries = small_data
    _, spilled = spill_pair
    d = str(tmp_path / "spilled_idx")
    spilled.save(d)
    loaded = IVFIndex.load(d)
    assert loaded.spilled and loaded.n == spilled.n
    assert loaded.n_base == spilled.n_base
    ids_a, _, _ = spilled.search(queries, k=10, nprobe=4)
    ids_b, _, _ = loaded.search(queries, k=10, nprobe=4)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))


def test_spill_int8_compact_cluster_major(small_data):
    """The 10M flagship combination: int8 + store='compact' + spill —
    dedup must work through the compact-store rescore path."""
    base, queries = small_data
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    idx = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                         store="compact", seed=42, max_iter=20, spill_eps=0.6)
    assert idx.spilled
    ids, _, _ = idx.search(queries, k=10, nprobe=1, mode="cluster")
    ids = np.asarray(ids)
    for row in ids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    plain = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8",
                           store="compact", seed=42, max_iter=20)
    ids_p, _, _ = plain.search(queries, k=10, nprobe=1, mode="cluster")
    assert (recall_at_k(ids, gt, 10)
            >= recall_at_k(np.asarray(ids_p), gt, 10))


def test_spill_sharded_no_duplicates_and_matches_single_chip(small_data, spill_pair):
    """Sharded search over a spilled index: duplicate copies must be
    deduped both in-shard and across the merge, and results must match
    the single-chip spilled search."""
    import jax
    from rag_on_edge_tpu.parallel import ShardedIVFIndex, make_mesh

    _, queries = small_data
    _, spilled = spill_pair
    mesh = make_mesh(len(jax.devices()))
    sh = ShardedIVFIndex(spilled, mesh)
    for mode in ("query", "cluster"):
        ids_sh, _, _ = sh.search(queries, k=10, nprobe=4, mode=mode)
        ids_sh = np.asarray(ids_sh)
        for row in ids_sh:
            real = row[row >= 0]
            assert len(set(real.tolist())) == len(real), (mode, row)
        ids_1c, _, _ = spilled.search(queries, k=10, nprobe=4, mode=mode)
        assert recall_at_k(ids_sh, np.asarray(ids_1c), 10) >= 0.99, mode


def test_spill_sharded_full_probe_matches_exact(small_data, spill_pair):
    import jax
    from rag_on_edge_tpu.parallel import ShardedIVFIndex, make_mesh

    base, queries = small_data
    _, spilled = spill_pair
    bf = BruteForceIndex(base, metric="l2", dtype="fp32", select="exact")
    ids_bf, s_bf = bf.search(queries, k=10)
    sh = ShardedIVFIndex(spilled, make_mesh(len(jax.devices())))
    ids_s, s_s, _ = sh.search(queries, k=10, nprobe=16)
    np.testing.assert_allclose(np.asarray(s_s), s_bf, rtol=1e-5)
    assert recall_at_k(np.asarray(ids_s), np.asarray(ids_bf), 10) >= 0.999


def test_spill_sharded_heavy_spill_regime(small_data):
    """Adversarial regime (caught by review, missed by eps=0.6 tests):
    EVERY vector duplicated (huge eps), full probe — in-shard duplicate
    copies must not evict true neighbors from the local pool (needs 2k
    local slots), and dedup-killed slots must not leak real ids with
    -inf scores into the merged output (ids must be -1 there)."""
    import jax
    from rag_on_edge_tpu.parallel import ShardedIVFIndex, make_mesh

    base, queries = small_data
    spilled = IVFIndex.build(base, nlist=16, metric="l2", seed=42,
                             max_iter=20, spill_eps=8.0)
    assert spilled.config["n_spilled"] == len(base)  # everything spilled
    bf = BruteForceIndex(base, metric="l2", dtype="fp32", select="exact")
    ids_bf, s_bf = bf.search(queries, k=10)
    sh = ShardedIVFIndex(spilled, make_mesh(len(jax.devices())))
    ids, vals, _ = sh.search(queries, k=10, nprobe=16)
    vals, ids = np.asarray(vals), np.asarray(ids)
    np.testing.assert_allclose(vals, s_bf, rtol=1e-5)
    np.testing.assert_array_equal(ids, np.asarray(ids_bf))
    # a short row (fewer valid candidates than k) must pad with id -1:
    i32, v32, _ = sh.search(queries, k=32, nprobe=1)
    v32, i32 = np.asarray(v32), np.asarray(i32)
    assert (i32[v32 == -np.inf] == -1).all()
    for row in i32:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


def test_spill_stream_mode_no_duplicates(small_data):
    """search_stream_device (query mode) on a spilled index must dedup
    (the stream path bypasses search_device's rescore defaulting)."""
    import jax.numpy as jnp
    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20,
                         spill_eps=8.0)
    stream = jnp.asarray(np.stack([queries[:8], queries[8:16]]))  # [2, 8, D]
    _, ids, _ = idx.search_stream_device(stream, k=10, nprobe=4)
    ids = np.asarray(ids).reshape(-1, 10)
    for row in ids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


def test_spill_with_routing_recovery(small_data):
    """Spilled index + tiny qcap (forced routing spill) + recovery passes:
    the recovery kernel walk and the dedup must compose — every id unique,
    recall unharmed vs the un-spilled recovered baseline."""
    import jax.numpy as jnp

    base, queries = small_data
    gt = ground_truth(base, queries, 10, metric="l2", backend="numpy")
    idx = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20,
                         spill_eps=0.6)
    q = jnp.asarray(queries)
    _, ids, _ = idx.search_device(
        q, k=10, nprobe=4, mode="cluster", qcap=2,
        recover=True, recover_qcap=16, recover_passes=3,
    )
    ids = np.asarray(ids)
    for row in ids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    assert int(np.asarray(idx.last_spill)) == 0  # recovery placed all pairs
    r = recall_at_k(ids, gt, 10)
    plain = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20)
    _, ids_p, _ = plain.search_device(
        q, k=10, nprobe=4, mode="cluster", qcap=2,
        recover=True, recover_qcap=16, recover_passes=3,
    )
    assert r >= recall_at_k(np.asarray(ids_p), gt, 10) - 1e-9


# ----------------------------------------------------- pre-trained centroids


def test_build_with_pretrained_centroids_matches(small_data):
    """build(centroids=...) skips Lloyd and must reproduce the same index
    a fresh build with those final centroids would: identical layout and
    identical search results, with and without spilled assignment (the
    spill_eps-sweep centroid-reuse path in build_or_load_index)."""
    base, queries = small_data
    ref = IVFIndex.build(base, nlist=16, metric="l2", seed=42, max_iter=20)
    cents = ref._centroids_np
    # Spill-free: assignment against the FINAL centroids can differ from
    # Lloyd's penultimate-centroid assignment on a handful of boundary
    # rows, so compare search RESULTS (full probe = exact), not layout.
    rebuilt = IVFIndex.build(base, nlist=16, metric="l2", centroids=cents)
    np.testing.assert_array_equal(rebuilt._centroids_np, cents)
    ids_a, s_a, _ = ref.search(queries, k=10, nprobe=16)
    ids_b, s_b, _ = rebuilt.search(queries, k=10, nprobe=16)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-6)
    # Spilled: the spill path recomputes a1/a2 from the given centroids in
    # both builds, so the layouts must match EXACTLY.
    sp_ref = IVFIndex.build(base, nlist=16, metric="l2", seed=42,
                            max_iter=20, spill_eps=0.6)
    sp_new = IVFIndex.build(base, nlist=16, metric="l2", spill_eps=0.6,
                            centroids=sp_ref._centroids_np)
    assert sp_new.spilled and sp_new.n == sp_ref.n
    np.testing.assert_array_equal(sp_new._reorder_np, sp_ref._reorder_np)
    np.testing.assert_array_equal(sp_new._offsets_np, sp_ref._offsets_np)
    with pytest.raises(ValueError, match="centroids shape"):
        IVFIndex.build(base, nlist=8, centroids=cents)
