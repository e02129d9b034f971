"""Smoke coverage for the round-5 harnesses (qcap_calib, recover_sweep,
serve_hunt) on CPU with tiny configs: the numbers are meaningless here,
but the plumbing — arg schemas, recovery-knob forwarding, incremental
artifact writes — must not rot between TPU runs (same contract as
tests/test_relay_probe.py)."""

import json
import sys


def test_qcap_calib_artifact_and_sanity(tmp_path):
    from rag_on_edge_tpu.harness import qcap_calib

    qcap_calib.main(["--dataset", "siftsmall", "--nlist", "16",
                     "--pad-block", "128", "--nprobe", "2", "4",
                     "--batch", "128", "--outdir", str(tmp_path), "--json"])
    files = list(tmp_path.glob("qcap_calib_*.json"))
    assert len(files) == 1
    rows = json.loads(files[0].read_text())
    assert len(rows) == 2
    for r in rows:
        # The hottest cluster carries at least the mean load, never more
        # than the whole batch.
        assert r["measured_max_load"] >= r["mean_load"]
        assert r["measured_max_load"] <= r["batch"]


def test_recover_sweep_rows_and_artifact(tmp_path):
    from rag_on_edge_tpu.harness import recover_sweep

    recover_sweep.main([
        "--dataset", "siftsmall", "--nlist", "16", "--spill-eps", "0",
        "--pad-block", "128", "--store", "padded", "--batch", "128",
        "--k", "10", "--nprobe", "4", "--recover-qcap", "128",
        "--recover-passes", "1", "--outdir", str(tmp_path), "--json"])
    files = list(tmp_path.glob("recover_sweep_*.json"))
    assert len(files) == 1
    data = json.loads(files[0].read_text())
    rows = data["rows"]
    # off + auto anchors + the single swept combo.
    assert [r["config"] for r in rows][0] == "off"
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["qps"] > 0
        assert r["spill_max"] >= 0
    # recover_qcap=128 >= batch=128 can never spill (a cluster's load is
    # at most B): the swept row must report zero residual spill.
    assert rows[-1]["spill_total"] == 0


def test_serve_hunt_out_of_time_runs_once_and_persists(tmp_path, monkeypatch):
    from rag_on_edge_tpu.harness import serve_hunt

    monkeypatch.setattr(sys, "argv", [
        "serve_hunt", "--dataset", "siftsmall", "--batch", "64",
        "--nprobe", "4", "--requests", "256", "--max-wait-s", "0",
        "--good-ms", "0", "--max-delay-ms", "5",
        "--outdir", str(tmp_path)])
    assert serve_hunt.main() == 0
    files = list(tmp_path.glob("serving_hunt_*.json"))
    assert len(files) == 1
    rec = json.loads(files[0].read_text())
    # out_of_time at t=0: one probe, one run, best recorded and stamped.
    assert len(rec["probes"]) == 1
    assert "cycle_ms" in rec["probes"][0]
    assert len(rec["runs"]) == 1
    run = rec["runs"][0]
    assert run["trigger"] == "out_of_time"
    assert run["relay_cycle_ms"] == rec["probes"][0]["cycle_ms"]
    assert rec["best"]["qps_end_to_end"] == run["qps_end_to_end"]
    assert 0.0 <= rec["best"]["recall"] <= 1.0


def test_serve_hunt_survives_probe_outage(tmp_path, monkeypatch):
    """A relay outage during the weather probe is logged and the hunt
    continues (ADVICE r4 medium: a 10-min UNAVAILABLE drop must not lose
    the artifact)."""
    from rag_on_edge_tpu.harness import bench_executor, serve_hunt

    calls = {"n": 0}
    real_probe = bench_executor.relay_cycle_probe

    def flaky_probe(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")
        return real_probe(*a, **kw)

    monkeypatch.setattr(bench_executor, "relay_cycle_probe", flaky_probe)
    monkeypatch.setattr(sys, "argv", [
        "serve_hunt", "--dataset", "siftsmall", "--batch", "64",
        "--nprobe", "4", "--requests", "256", "--max-wait-s", "1e9",
        "--good-ms", "1e9", "--max-delay-ms", "5", "--target-qps", "0",
        "--poll-s", "0.01", "--outdir", str(tmp_path)])
    assert serve_hunt.main() == 0
    rec = json.loads(list(tmp_path.glob("serving_hunt_*.json"))[0].read_text())
    assert "error" in rec["probes"][0]          # the outage is in the record
    assert rec["probes"][1]["cycle_ms"] > 0     # ... and the hunt recovered
    assert rec["runs"] and rec["best"] is not None


def test_wire_dtype_detection():
    import numpy as np

    from rag_on_edge_tpu.harness.bench_executor import _wire_dtype

    integral = np.array([[0.0, 141.0, 37.0]], np.float32)
    fractional = np.array([[0.5, 1.0, 2.0]], np.float32)
    assert _wire_dtype(integral, "auto") == np.uint8
    assert _wire_dtype(fractional, "auto") is None
    assert _wire_dtype(integral, "f32") is None
    assert _wire_dtype(integral, "uint8") == np.uint8
    try:
        _wire_dtype(fractional, "uint8")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_executor_uint8_wire_matches_f32():
    """uint8 wire upload is LOSSLESS for integral queries: results match
    the f32 wire bit-for-bit (the device program casts back to f32)."""
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.runtime.executor import BatchingExecutor

    def fn(q):
        qf = q.astype(jnp.float32)
        return qf.sum(axis=1), (qf * 3.0 + 1.0).max(axis=1)

    rng = np.random.default_rng(3)
    qs = rng.integers(0, 142, size=(64, 16)).astype(np.float32)
    outs = {}
    for wd in (None, np.uint8):
        with BatchingExecutor(fn, dim=16, batch_size=8, max_delay_ms=2.0,
                              wire_dtype=wd) as ex:
            futs = [ex.submit(q) for q in qs]
            rows = [f.result(timeout=120) for f in futs]
        outs[wd] = rows
    for a, b in zip(outs[None], outs[np.uint8]):
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_ivf_search_device_accepts_uint8_queries(small_data):
    """search_device casts inside its jit — uint8 queries (the serving
    wire format) return exactly the f32 results on integral corpora."""
    import jax.numpy as jnp
    import numpy as np

    from rag_on_edge_tpu.models.ivf import IVFIndex

    base, queries = small_data
    idx = IVFIndex.build(base, nlist=16, metric="l2", dtype="int8", seed=0)
    qf = jnp.asarray(queries)
    qu = jnp.asarray(queries.astype(np.uint8))
    assert np.array_equal(np.asarray(queries, np.uint8).astype(np.float32),
                          queries)  # corpus is integral: cast is lossless
    vf, idf, _ = idx.search_device(qf, 10, 4, mode="cluster")
    vu, idu, _ = idx.search_device(qu, 10, 4, mode="cluster")
    assert np.array_equal(np.asarray(idf), np.asarray(idu))
    assert np.array_equal(np.asarray(vf), np.asarray(vu))


def test_bench_executor_run_accepts_prebuilt_index():
    """ADVICE r4: serve_hunt shares ONE device-resident index with run()."""
    from rag_on_edge_tpu.harness import bench_executor
    from rag_on_edge_tpu.harness.bench_ivf import build_or_load_index
    from rag_on_edge_tpu.utils.datasets import load_dataset

    ds = load_dataset("siftsmall", gt_k=10)
    idx = build_or_load_index(ds, nlist=None, metric="l2", dtype="int8",
                              pad_block=None)
    r = bench_executor.run(dataset="siftsmall", batch=64, nprobe=4, k=10,
                           requests=256, quiet=True, index=idx)
    assert r["qps_end_to_end"] > 0
    assert 0.0 <= r["recall"] <= 1.0
