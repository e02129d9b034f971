import numpy as np

from rag_on_edge_tpu.models import kmeans


def test_kmeans_deterministic(small_data):
    base, _ = small_data
    c1, a1 = kmeans.kmeans(base, 16, seed=42, max_iter=10)
    c2, a2 = kmeans.kmeans(base, 16, seed=42, max_iter=10)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(a1, a2)


def test_assignments_are_nearest(small_data):
    base, _ = small_data
    cents, assign = kmeans.kmeans(base, 16, seed=42, max_iter=20)
    d = ((base[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    chosen = d[np.arange(len(base)), assign]
    # fp32 GEMM-based assignment may differ from float64 argmin only on ties
    assert np.all(chosen <= d.min(axis=1) + 1e-2 * (1 + d.min(axis=1)))


def test_kmeans_reduces_inertia(small_data):
    base, _ = small_data

    def inertia(cents, assign):
        return float(((base - cents[assign]) ** 2).sum())

    c1, a1 = kmeans.kmeans(base, 16, seed=42, max_iter=1)
    c20, a20 = kmeans.kmeans(base, 16, seed=42, max_iter=20)
    assert inertia(c20, a20) <= inertia(c1, a1)


def test_chunked_assignment_matches(small_data):
    base, _ = small_data
    cents, _ = kmeans.kmeans(base, 8, seed=1, max_iter=5)
    import jax.numpy as jnp

    a_full = np.asarray(kmeans.assign_clusters(jnp.asarray(base), jnp.asarray(cents)))
    a_chunk = np.asarray(
        kmeans.assign_clusters(jnp.asarray(base), jnp.asarray(cents), chunk=300)
    )
    np.testing.assert_array_equal(a_full, a_chunk)


def test_default_nlist_guard():
    assert kmeans.default_nlist(10_000, 100) == 100
    assert kmeans.default_nlist(10_000, 5_000) == max(16, 10_000 // 100)
    assert kmeans.default_nlist(1_000_000) == 1024


def test_kmeanspp_init_beats_random_sample_init(small_data):
    """D²-sampled init should match or beat random-sample init on final
    inertia at a fixed (small) Lloyd budget — the coarse-quantizer-quality
    lever for the 10M recall ceiling."""
    import numpy as np
    from rag_on_edge_tpu.models.kmeans import assign_clusters, kmeans

    base, _ = small_data

    def inertia(cents, assign):
        return float(np.sum((base - cents[assign]) ** 2))

    c_pp, a_pp = kmeans(base, 16, seed=42, max_iter=3, init="kmeans++")
    c_rs, a_rs = kmeans(base, 16, seed=42, max_iter=3, init="sample")
    assert inertia(c_pp, a_pp) <= inertia(c_rs, a_rs) * 1.02


def test_kmeanspp_deterministic(small_data):
    from rag_on_edge_tpu.models.kmeans import kmeans

    import numpy as np
    base, _ = small_data
    c1, a1 = kmeans(base, 16, seed=7, max_iter=2, init="kmeans++")
    c2, a2 = kmeans(base, 16, seed=7, max_iter=2, init="kmeans++")
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(c1, c2)


def test_kmeans_checkpoint_resume_replays_trajectory(small_data, tmp_path):
    """A run resumed from a mid-build checkpoint must land on the exact
    centroids of an uninterrupted run (the checkpoint is the loop state)."""
    base, _ = small_data
    ck = str(tmp_path / "km.ckpt.npz")
    ref_c, ref_a = kmeans.kmeans(base, 16, seed=42, max_iter=8, tol=0.0)
    # "Crash" after 3 iterations: run with max_iter=3 writing the checkpoint.
    kmeans.kmeans(base, 16, seed=42, max_iter=3, tol=0.0, checkpoint=ck)
    import numpy as _np
    assert int(_np.load(ck)["next_iter"]) == 3
    # Resume to 8 total; must equal the uninterrupted trajectory exactly.
    c2, a2 = kmeans.kmeans(base, 16, seed=42, max_iter=8, tol=0.0, checkpoint=ck)
    np.testing.assert_array_equal(ref_c, c2)
    np.testing.assert_array_equal(ref_a, a2)


def test_kmeans_checkpoint_mismatch_is_ignored(small_data, tmp_path):
    """A checkpoint from a different seed or shape must not be loaded."""
    base, _ = small_data
    ck = str(tmp_path / "km.ckpt.npz")
    kmeans.kmeans(base, 16, seed=7, max_iter=2, tol=0.0, checkpoint=ck)
    ref_c, _ = kmeans.kmeans(base, 16, seed=42, max_iter=2, tol=0.0)
    c2, _ = kmeans.kmeans(base, 16, seed=42, max_iter=2, tol=0.0, checkpoint=ck)
    np.testing.assert_array_equal(ref_c, c2)


def test_kmeans_checkpoint_resume_past_max_iter(small_data, tmp_path):
    """Crash AFTER the last Lloyd step but before consuming the result:
    resume must return EXACTLY what the uninterrupted run returned (the
    last step is replayed from the stored previous centroids — keeping
    the extra step's centroid update would silently advance the
    trajectory)."""
    base, _ = small_data
    ck = str(tmp_path / "km.ckpt.npz")
    c1, a1 = kmeans.kmeans(base, 16, seed=42, max_iter=4, tol=0.0, checkpoint=ck)
    c2, a2 = kmeans.kmeans(base, 16, seed=42, max_iter=4, tol=0.0, checkpoint=ck)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(a1, a2)


def test_kmeans_checkpoint_resume_after_convergence(small_data, tmp_path):
    """A tol-converged checkpointed run must also resume to the identical
    result (the done flag stops further iteration)."""
    base, _ = small_data
    ck = str(tmp_path / "km.ckpt.npz")
    c1, a1 = kmeans.kmeans(base, 16, seed=42, max_iter=50, tol=1e-4, checkpoint=ck)
    c2, a2 = kmeans.kmeans(base, 16, seed=42, max_iter=50, tol=1e-4, checkpoint=ck)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(a1, a2)
