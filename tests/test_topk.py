import jax.numpy as jnp
import numpy as np

from rag_on_edge_tpu.ops import topk


def test_two_stage_matches_exact(rng):
    scores = jnp.asarray(rng.normal(size=(8, 5000)).astype(np.float32))
    v1, i1 = topk.topk(scores, 10)
    v2, i2 = topk.two_stage_topk(scores, 10, block=512)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # values determine the set; ids must point at equal scores
    s = np.asarray(scores)
    np.testing.assert_allclose(
        np.take_along_axis(s, np.asarray(i2), axis=1), np.asarray(v1), rtol=1e-6
    )


def test_two_stage_unaligned_tail(rng):
    scores = jnp.asarray(rng.normal(size=(3, 1237)).astype(np.float32))
    v1, _ = topk.topk(scores, 7)
    v2, i2 = topk.two_stage_topk(scores, 7, block=256)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    assert np.asarray(i2).max() < 1237


def test_topk_with_id_map(rng):
    scores = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    ids = jnp.arange(1000, 1064, dtype=jnp.int32)
    _, mapped = topk.topk(scores, 5, ids=ids)
    _, raw = topk.topk(scores, 5)
    np.testing.assert_array_equal(np.asarray(mapped), np.asarray(raw) + 1000)


def test_merge_topk(rng):
    a = rng.normal(size=(4, 40)).astype(np.float32)
    b = rng.normal(size=(4, 24)).astype(np.float32)
    va, ia = topk.topk(jnp.asarray(a), 8)
    vb, ib = topk.topk(jnp.asarray(b), 8)
    ib = ib + 1000  # disjoint id space
    vm, im = topk.merge_topk(va, ia, vb, ib, k=8)
    full = np.concatenate([a, b], axis=1)
    expect = -np.sort(-full, axis=1)[:, :8]
    np.testing.assert_allclose(np.asarray(vm), expect, rtol=1e-6)
    assert np.asarray(im).shape == (4, 8)


def test_approx_topk_recall(rng):
    scores = jnp.asarray(rng.normal(size=(16, 8192)).astype(np.float32))
    _, exact = topk.topk(scores, 10)
    _, approx = topk.approx_topk(scores, 10, recall_target=0.95)
    hits = sum(
        len(np.intersect1d(e, a)) for e, a in zip(np.asarray(exact), np.asarray(approx))
    )
    assert hits / (16 * 10) >= 0.9


def test_iterative_topk_matches_exact(rng):
    scores = jnp.asarray(rng.normal(size=(8, 3000)).astype(np.float32))
    v1, i1 = topk.topk(scores, 10)
    v2, i2 = topk.iterative_topk(scores, 10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_iterative_topk_int32_with_ties(rng):
    scores = jnp.asarray(rng.integers(0, 5, size=(4, 200)).astype(np.int32))
    v1, i1 = topk.topk(scores, 6)
    v2, i2 = topk.iterative_topk(scores, 6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))  # ties -> lowest id


def test_iterative_topk_k_exceeds_n(rng):
    scores = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    v, i = topk.iterative_topk(scores, 7)
    assert v.shape == (2, 7)
    assert np.isneginf(np.asarray(v)[:, 4:]).all()


def test_fused_topk_matches_numpy(rng):
    from rag_on_edge_tpu.ops.pallas_topk import fused_topk

    for b, w, k in [(100, 256, 10), (512, 1024, 20), (7, 128, 5)]:
        x = rng.integers(-(2**30), 2**30, size=(b, w)).astype(np.int32)
        v, i = fused_topk(jnp.asarray(x), k)
        ref = np.sort(x, axis=1)[:, ::-1][:, :k]
        assert np.array_equal(np.asarray(v), ref)
        assert np.array_equal(np.take_along_axis(x, np.asarray(i), 1), ref)
        xf = x.astype(np.float32)
        v2, i2 = fused_topk(jnp.asarray(xf), k)
        assert np.array_equal(np.asarray(v2), ref.astype(np.float32))


def test_fused_topk_tie_resolution(rng):
    from rag_on_edge_tpu.ops.pallas_topk import fused_topk

    x = np.zeros((8, 128), np.int32)  # all ties -> lowest positions win
    _, i = fused_topk(jnp.asarray(x), 4)
    assert np.array_equal(np.asarray(i), np.tile(np.arange(4), (8, 1)))
