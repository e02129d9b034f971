import threading

import numpy as np
import pytest

from rag_on_edge_tpu.models.brute_force import BruteForceIndex
from rag_on_edge_tpu.runtime.executor import BatchingExecutor


@pytest.fixture(scope="module")
def index(small_data):
    base, _ = small_data
    return BruteForceIndex(base, metric="ip", dtype="fp32", select="exact")


def test_executor_matches_direct_search(small_data, index):
    _, queries = small_data
    direct_ids, direct_scores = index.search(queries[:40], k=5)
    with BatchingExecutor(
        lambda q: index.search_device(q, k=5), dim=queries.shape[1],
        batch_size=16, max_delay_ms=5.0,
    ) as ex:
        futs = [ex.submit(q) for q in queries[:40]]
        for i, f in enumerate(futs):
            vals, ids = f.result(timeout=30)
            assert ids.shape == (5,)
            np.testing.assert_array_equal(ids, direct_ids[i])
            np.testing.assert_allclose(vals, direct_scores[i], rtol=1e-6)


def test_executor_concurrent_submitters(small_data, index):
    _, queries = small_data  # 32 queries
    direct_ids, _ = index.search(queries, k=3)
    results = {}
    with BatchingExecutor(
        lambda q: index.search_device(q, k=3), dim=queries.shape[1],
        batch_size=16, max_delay_ms=2.0,
    ) as ex:
        def worker(lo, hi):
            for i in range(lo, hi):
                results[i] = ex.submit(queries[i]).result(timeout=30)[1]

        threads = [threading.Thread(target=worker, args=(i * 8, (i + 1) * 8))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for i, ids in results.items():
        np.testing.assert_array_equal(ids, direct_ids[i])


def test_executor_group_submit_and_deadline(small_data, index):
    """An underfull batch must still launch once the deadline passes, and
    group submissions come back as a slice."""
    _, queries = small_data
    with BatchingExecutor(
        lambda q: index.search_device(q, k=4), dim=queries.shape[1],
        batch_size=64, max_delay_ms=1.0,  # 3 rows never fill 64
    ) as ex:
        vals, ids = ex.submit(queries[:3]).result(timeout=30)
        assert ids.shape == (3, 4)
        direct_ids, _ = index.search(queries[:3], k=4)
        np.testing.assert_array_equal(ids, direct_ids)


def test_executor_submit_many(small_data, index):
    """submit_many enqueues contiguous blocks (one queue item per
    batch_size chunk) and returns per-row handles that each resolve like
    a singleton submit — including when M spans multiple batches and
    when the tail underfills one."""
    _, queries = small_data  # 32 queries
    q = np.resize(queries, (40, queries.shape[1])).astype(np.float32)
    q += np.linspace(0, 1, 40, dtype=np.float32)[:, None]  # distinct rows
    direct_ids, direct_scores = index.search(q, k=5, batch_size=16)
    with BatchingExecutor(
        lambda b: index.search_device(b, k=5), dim=q.shape[1],
        batch_size=16, max_delay_ms=2.0,
    ) as ex:
        futs = ex.submit_many(q)
        assert len(futs) == 40
        for i, f in enumerate(futs):
            vals, ids = f.result(timeout=30)
            assert ids.shape == (5,)
            np.testing.assert_array_equal(ids, direct_ids[i])
            np.testing.assert_allclose(vals, direct_scores[i], rtol=1e-6)
    with BatchingExecutor(
        lambda b: index.search_device(b, k=3), dim=q.shape[1], batch_size=16
    ) as ex:
        with pytest.raises(ValueError, match="M >= 1"):
            ex.submit_many(np.empty((0, q.shape[1]), np.float32))
        with pytest.raises(ValueError, match="dim"):
            ex.submit_many(np.zeros((4, 7), np.float32))


def test_executor_mixed_singleton_and_group_batch(small_data, index):
    """A batch mixing singletons and groups must place every row at its
    handle's offset (regression for the vectorized all-singleton fill)."""
    _, queries = small_data
    direct_ids, _ = index.search(queries[:8], k=4)
    with BatchingExecutor(
        lambda b: index.search_device(b, k=4), dim=queries.shape[1],
        batch_size=8, max_delay_ms=50.0,
    ) as ex:
        f0 = ex.submit(queries[0])
        g = ex.submit(queries[1:5])     # group of 4
        f1 = ex.submit(queries[5])
        f2 = ex.submit(queries[6])
        f3 = ex.submit(queries[7])      # fills batch_size=8 by rows
        np.testing.assert_array_equal(f0.result(timeout=30)[1], direct_ids[0])
        np.testing.assert_array_equal(g.result(timeout=30)[1], direct_ids[1:5])
        np.testing.assert_array_equal(f1.result(timeout=30)[1], direct_ids[5])
        np.testing.assert_array_equal(f2.result(timeout=30)[1], direct_ids[6])
        np.testing.assert_array_equal(f3.result(timeout=30)[1], direct_ids[7])


def test_executor_rejects_bad_inputs(small_data, index):
    _, queries = small_data
    ex = BatchingExecutor(
        lambda q: index.search_device(q, k=3), dim=queries.shape[1], batch_size=8
    )
    with pytest.raises(ValueError, match="dim"):
        ex.submit(np.zeros(7, np.float32))
    with pytest.raises(ValueError, match="batch_size"):
        ex.submit(np.zeros((9, queries.shape[1]), np.float32))
    ex.close()
    ex.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        ex.submit(queries[0])


def test_executor_propagates_engine_errors(small_data, index):
    """An fn that raises must fail every waiter in the batch with the
    original exception, and the executor must stay usable afterwards."""
    _, queries = small_data
    calls = {"n": 0}

    def flaky(q):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("engine exploded")
        return index.search_device(q, k=3)

    with BatchingExecutor(
        flaky, dim=queries.shape[1], batch_size=4, max_delay_ms=1.0
    ) as ex:
        bad = [ex.submit(queries[i]) for i in range(4)]
        for f in bad:
            with pytest.raises(RuntimeError, match="engine exploded"):
                f.result(timeout=30)
        ok = ex.submit(queries[0]).result(timeout=30)
        direct_ids, _ = index.search(queries[:1], k=3)
        np.testing.assert_array_equal(ok[1], direct_ids[0])


def test_executor_result_timeout(small_data, index):
    """result(timeout) on a never-resolving handle raises TimeoutError
    (concurrent.futures.TimeoutError semantics)."""
    from concurrent.futures import TimeoutError as FutureTimeoutError
    import time

    _, queries = small_data
    slow_release = threading.Event()

    def slow(q):
        slow_release.wait(10)
        return index.search_device(q, k=3)

    ex = BatchingExecutor(
        slow, dim=queries.shape[1], batch_size=4, max_delay_ms=1.0
    )
    try:
        f = ex.submit(queries[0])
        t0 = time.perf_counter()
        with pytest.raises(FutureTimeoutError):
            f.result(timeout=0.2)
        assert time.perf_counter() - t0 < 5.0
        assert not f.done()
        slow_release.set()
        f.result(timeout=30)  # resolves once the engine finishes
        assert f.done()
    finally:
        slow_release.set()
        ex.close()


def test_executor_pipelined_integrity(small_data, index):
    """Many batches in flight (pipelined dispatch) must not scramble or
    corrupt per-request results — regression for buffer aliasing across
    in-flight batches."""
    base, queries = small_data
    q = np.resize(queries, (512, queries.shape[1])).astype(np.float32)
    q += np.linspace(0, 1, 512, dtype=np.float32)[:, None]  # distinct rows
    direct_ids, _ = index.search(q, k=5, batch_size=32)
    with BatchingExecutor(
        lambda b: index.search_device(b, 5),
        dim=base.shape[1], batch_size=32, max_delay_ms=50.0, inflight=8,
    ) as ex:
        futs = [ex.submit(q[i]) for i in range(512)]
        got = np.stack([np.asarray(f.result(timeout=120)[1]) for f in futs])
    np.testing.assert_array_equal(got, direct_ids)


def test_executor_rejects_zero_row_group(small_data, index):
    """[0, D] passed validation but crashed the dispatcher thread outside
    its try block, hanging every future — must raise at submit()."""
    _, queries = small_data
    with BatchingExecutor(
        lambda q: index.search_device(q, k=3), dim=queries.shape[1], batch_size=8
    ) as ex:
        with pytest.raises(ValueError, match="1..batch_size"):
            ex.submit(np.empty((0, queries.shape[1]), np.float32))
        # executor still alive and serving
        ids = ex.submit(queries[0]).result(timeout=30)[1]
        direct_ids, _ = index.search(queries[:1], k=3)
        np.testing.assert_array_equal(ids, direct_ids[0])


def test_executor_group_rows_trigger_size_launch(small_data, index):
    """Four [8, D] groups fill batch_size=32 by ROWS (len(queue)=4):
    the batch must launch on fullness, not wait out a long deadline."""
    import time

    _, queries = small_data  # 32 queries
    with BatchingExecutor(
        lambda q: index.search_device(q, k=3), dim=queries.shape[1],
        batch_size=32, max_delay_ms=10_000.0,  # deadline would dominate
    ) as ex:
        t0 = time.perf_counter()
        futs = [ex.submit(queries[i * 8:(i + 1) * 8]) for i in range(4)]
        for f in futs:
            f.result(timeout=30)
        elapsed = time.perf_counter() - t0
    assert elapsed < 5.0, f"batch waited for the deadline ({elapsed:.1f}s)"


def test_executor_lost_wakeup_self_heals(small_data, index):
    """Two concurrent singleton submits into an empty queue can interleave
    so that NEITHER sets _wake (both read len(queue)==2): the dispatcher's
    empty-queue wait must be bounded so the deadline policy still fires.
    Simulated directly: enqueue without signalling, as the race would."""
    import time

    _, queries = small_data
    with BatchingExecutor(
        lambda q: index.search_device(q, k=3), dim=queries.shape[1],
        batch_size=32, max_delay_ms=20.0,
    ) as ex:
        # Let the dispatcher reach its empty-queue wait point.
        time.sleep(0.2)
        # Bypass submit()'s wake logic entirely: append raw items the way
        # the raced interleaving would leave them (queued, event unset).
        from rag_on_edge_tpu.runtime.executor import SliceFuture

        futs = []
        for i in range(2):
            f = SliceFuture(ex)
            f._q = np.asarray(queries[i], np.float32)
            f._t = time.perf_counter()
            ex._queue.append(f)
            futs.append(f)
        ex._wake.clear()  # ensure no wake signal exists
        direct_ids, _ = index.search(queries[:2], k=3)
        for i, f in enumerate(futs):
            ids = f.result(timeout=10)[1]
            np.testing.assert_array_equal(ids, direct_ids[i])


def test_executor_stats_counters(small_data, index):
    """Pipeline counters: rows/batches account exactly; every dispatched
    batch is collected; batches_per_drain >= 1 when drains happened."""
    _, queries = small_data
    with BatchingExecutor(
        lambda q: index.search_device(q, k=5), dim=queries.shape[1],
        batch_size=16, max_delay_ms=5.0,
    ) as ex:
        futs = [ex.submit(q) for q in queries[:32]]
        for f in futs:
            f.result(timeout=30)
        s = ex.stats()
    assert s["rows_dispatched"] == 32
    assert s["batches_dispatched"] >= 2  # 32 rows / batch_size 16
    assert s["batches_collected"] == s["batches_dispatched"]
    assert s["drains"] >= 1
    assert s["batches_per_drain"] >= 1.0
    assert s["avg_rows_per_batch"] <= 16


def test_executor_pack_engages_and_matches(small_data, index):
    """Result packing (bitcast+concat to ONE device array per batch) is
    on by default for multi-leaf 4-byte results and must be invisible:
    identical ids/scores, packed_batches counts every batch."""
    _, queries = small_data
    direct_ids, direct_scores = index.search(queries[:32], k=5)
    with BatchingExecutor(
        lambda q: index.search_device(q, k=5), dim=queries.shape[1],
        batch_size=16, max_delay_ms=5.0,
    ) as ex:
        futs = [ex.submit(q) for q in queries[:32]]
        for i, f in enumerate(futs):
            vals, ids = f.result(timeout=30)
            assert ids.dtype == direct_ids.dtype
            np.testing.assert_array_equal(ids, direct_ids[i])
            np.testing.assert_allclose(vals, direct_scores[i], rtol=1e-6)
        s = ex.stats()
    assert s["packed_batches"] == s["batches_dispatched"] > 0


def test_executor_pack_off_matches(small_data, index):
    """pack=False keeps the plain multi-array fetch path."""
    _, queries = small_data
    direct_ids, _ = index.search(queries[:16], k=5)
    with BatchingExecutor(
        lambda q: index.search_device(q, k=5), dim=queries.shape[1],
        batch_size=16, max_delay_ms=5.0, pack=False,
    ) as ex:
        futs = [ex.submit(q) for q in queries[:16]]
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(f.result(timeout=30)[1],
                                          direct_ids[i])
        assert ex.stats()["packed_batches"] == 0


def test_executor_pack_mixed_leaf_shapes(small_data, index):
    """Packing handles the full leaf zoo in one tree: [B, k] f32,
    [B, k] i32, a [B] vector, and a [B, 2, 3] trailing-multi-dim leaf."""
    import jax.numpy as jnp

    _, queries = small_data

    def fn(q):
        scores, ids = index.search_device(q, k=4)
        ncand = jnp.full((q.shape[0],), 7, jnp.int32)
        cube = jnp.broadcast_to(
            scores[:, :1, None], (q.shape[0], 2, 3)).astype(jnp.float32)
        return scores, ids, ncand, cube

    direct_ids, direct_scores = index.search(queries[:16], k=4)
    with BatchingExecutor(fn, dim=queries.shape[1], batch_size=16,
                          max_delay_ms=5.0) as ex:
        futs = [ex.submit(q) for q in queries[:16]]
        for i, f in enumerate(futs):
            scores, ids, ncand, cube = f.result(timeout=30)
            np.testing.assert_array_equal(ids, direct_ids[i])
            np.testing.assert_allclose(scores, direct_scores[i], rtol=1e-6)
            assert ncand == 7 and ncand.dtype == np.int32
            assert cube.shape == (2, 3)
            np.testing.assert_allclose(cube, np.broadcast_to(
                scores[:1, None], (2, 3)), rtol=1e-6)
        assert ex.stats()["packed_batches"] > 0


def test_executor_pack_falls_back_on_narrow_dtype(small_data, index):
    """A non-4-byte leaf (int8) permanently disables packing — results
    still correct through the plain path."""
    import jax.numpy as jnp

    _, queries = small_data

    def fn(q):
        scores, ids = index.search_device(q, k=3)
        flag = jnp.zeros((q.shape[0],), jnp.int8)
        return scores, ids, flag

    with BatchingExecutor(fn, dim=queries.shape[1], batch_size=16,
                          max_delay_ms=5.0) as ex:
        direct_ids, _ = index.search(queries[:16], k=3)
        futs = [ex.submit(q) for q in queries[:16]]
        for i, f in enumerate(futs):
            _, ids, flag = f.result(timeout=30)
            np.testing.assert_array_equal(ids, direct_ids[i])
            assert flag.dtype == np.int8
        assert ex.stats()["packed_batches"] == 0


def test_executor_drain_fusion_matches(small_data, index, monkeypatch):
    """Cross-batch drain fusion: when the collector drains >= 2 packed
    batches it stacks them into ONE device array before the fetch.
    Stalling the first drain piles later batches into the inflight queue,
    so the second drain must fuse — with results identical to a direct
    search."""
    import time as time_mod

    import jax

    _, queries = small_data
    real_get = jax.device_get
    first = [True]

    def slow_first_get(x):
        if first[0]:
            first[0] = False
            time_mod.sleep(0.3)  # let the dispatcher run ahead
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", slow_first_get)
    # 64 distinct rows (small_data has only 32 queries): 4 full batches.
    qs = np.concatenate([queries, queries + 0.25], axis=0).astype(np.float32)
    direct_ids, direct_scores = index.search(qs, k=5)
    with BatchingExecutor(
        lambda q: index.search_device(q, k=5), dim=qs.shape[1],
        batch_size=16, max_delay_ms=50.0, inflight=8,
    ) as ex:
        futs = [ex.submit(q) for q in qs]
        for i, f in enumerate(futs):
            vals, ids = f.result(timeout=30)
            np.testing.assert_array_equal(ids, direct_ids[i])
            np.testing.assert_allclose(vals, direct_scores[i], rtol=1e-6)
        s = ex.stats()
    assert s["packed_batches"] == s["batches_dispatched"] == 4
    assert s["fused_drains"] >= 1
    assert s["drains"] < s["batches_collected"]  # at least one multi-batch drain


def test_executor_drain_fusion_off_without_pack(small_data, index):
    """pack=False also disables drain fusion (there is nothing packed to
    stack) — counter stays zero, results unaffected."""
    _, queries = small_data
    direct_ids, _ = index.search(queries[:16], k=5)
    with BatchingExecutor(
        lambda q: index.search_device(q, k=5), dim=queries.shape[1],
        batch_size=16, max_delay_ms=5.0, pack=False,
    ) as ex:
        futs = [ex.submit(q) for q in queries[:16]]
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(f.result(timeout=30)[1],
                                          direct_ids[i])
        assert ex.stats()["fused_drains"] == 0


def test_executor_set_max_delay_live(small_data, index):
    """set_max_delay_ms retunes the deadline window at runtime: a window
    far above the test budget would strand an underfull batch; shrinking
    it live must release the pending request promptly."""
    import time

    _, queries = small_data
    with BatchingExecutor(
        lambda q: index.search_device(q, k=3), dim=queries.shape[1],
        batch_size=32, max_delay_ms=60_000.0,
    ) as ex:
        f = ex.submit(queries[0])
        time.sleep(0.1)
        assert not f.done()  # 60 s window: underfull batch is held
        ex.set_max_delay_ms(5.0)
        ids = f.result(timeout=10)[1]
        direct_ids, _ = index.search(queries[:1], k=3)
        np.testing.assert_array_equal(ids, direct_ids[0])


def test_auto_max_delay_knee():
    """auto_max_delay_ms = clamp(min(fill, cycle), 5, 200): below-capacity
    loads get the relay-cycle window, near-capacity loads the batch-fill
    time, and pathological rates hit the clamps."""
    from rag_on_edge_tpu.harness.bench_executor import auto_max_delay_ms

    # 25% of a 66K-capacity at B=4096: fill=248 ms, cycle=62 ms -> cycle.
    assert auto_max_delay_ms(4096, 16_500, 66_000) == pytest.approx(
        1e3 * 4096 / 66_000)
    # At capacity, fill == cycle.
    assert auto_max_delay_ms(4096, 66_000, 66_000) == pytest.approx(
        1e3 * 4096 / 66_000)
    # Overload (offered > capacity): fill < cycle -> fill.
    assert auto_max_delay_ms(4096, 132_000, 66_000) == pytest.approx(
        1e3 * 4096 / 132_000)
    # Clamps: tiny batch -> floor 5 ms; tiny offered load -> ceiling 200.
    assert auto_max_delay_ms(32, 66_000, 66_000) == 5.0
    assert auto_max_delay_ms(65_536, 1_000, 2_000) == 200.0
