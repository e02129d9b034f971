"""Smoke coverage for the relay cost-structure probe (CPU: the numbers
are meaningless here, but the probe's plumbing — fresh-array staging,
pack-program borrowing, key schema — must not rot between TPU runs)."""

from rag_on_edge_tpu.harness import relay_probe


def test_probe_fetch_schema():
    out = relay_probe.probe_fetch(rounds=1, total_mb=0.01)
    for key in ("fetch_1_arrays_ms", "fetch_3_arrays_ms",
                "fetch_9_arrays_ms", "fetch_per_array_ms",
                "fetch_per_mb_ms", "sync_rtt_ms"):
        assert key in out, key
    assert out["fetch_1_arrays_ms"] >= 0


def test_probe_cycle_runs_and_packs(tmp_path):
    out = relay_probe.probe_cycle(batch=32, nprobe=4, k=5, rounds=1,
                                  dataset="siftsmall")
    assert out["cycle_packed_ms"] > 0
    assert out["cycle_unpacked_ms"] > 0
    assert out["capacity_packed_qps"] > 0
