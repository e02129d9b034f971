"""Smoke tests for the benchmark harnesses (the driver runs bench.py on
real hardware every round; these catch API drift on the CPU backend)."""

import json
import os

import numpy as np
import pytest

from rag_on_edge_tpu.harness import bench_bruteforce, bench_ivf, sweep


@pytest.fixture(autouse=True)
def _data_root(tmp_path, monkeypatch):
    # Redirect the dataset cache so tests never touch the real data/ dir.
    monkeypatch.setattr(
        "rag_on_edge_tpu.utils.datasets.DEFAULT_DATA_ROOT", str(tmp_path)
    )
    monkeypatch.setattr(
        "rag_on_edge_tpu.harness.bench_ivf.DEFAULT_DATA_ROOT", str(tmp_path)
    )
    yield


def test_bench_bruteforce_run(tmp_path):
    r = bench_bruteforce.run(
        dataset="unit", batch=8, k=5, dtype="int8", repeats=2,
        outdir=str(tmp_path / "out"), quiet=True,
    )
    assert r["qps"] > 0 and 0.5 <= r["recall"] <= 1.0
    cfg_dir = tmp_path / "out" / "unit_b8_k5_int8"
    assert (cfg_dir / "results.txt").exists()
    metrics_txt = (cfg_dir / "metrics.txt").read_text()
    for section in ("Dataset Info", "Operational Intensity", "Overall Performance",
                    "Device Execution", "Accuracy"):
        assert section in metrics_txt
    csv = (tmp_path / "out" / "benchmark_bruteforce.csv").read_text().splitlines()
    assert csv[0] == "dataset,batch,qps,gflops,avg_ms,p95_ms,p99_ms"
    assert csv[1].startswith("unit,8,")


def test_bench_ivf_run(tmp_path):
    rows = bench_ivf.run(
        dataset="unit", nlist=16, nprobes=(4,), k=5, batch=8, repeats=2,
        outdir=str(tmp_path / "out"), quiet=True,
    )
    assert len(rows) == 1 and rows[0]["recall"] >= 0.5
    out = tmp_path / "out"
    assert (out / "timing.txt").exists()
    csv = (out / "benchmark_ivf.csv").read_text().splitlines()
    assert csv[0].startswith("dataset,nprobe,top_k,recall,qps")
    metrics_txt = next(out.glob("unit_ivf*/metrics.txt")).read_text()
    assert "Phase Breakdown" in metrics_txt and "Candidate Statistics" in metrics_txt


def test_recall_target_summary():
    rows = [
        {"nprobe": 4, "recall": 0.85, "qps": 100.0, "k": 10},
        {"nprobe": 8, "recall": 0.96, "qps": 50.0, "k": 10},
    ]
    lines = sweep.recall_target_summary(rows, targets=(0.95, 0.80))
    assert "nprobe=8" in lines[0]
    assert "nprobe=4" in lines[1]  # fastest config meeting 80%


def test_bench_gemm_run():
    """The spatial-GEMM benchmark (AIE host-driver contract) runs on the
    CPU mesh, verifies its output, and reports GFLOPs."""
    from rag_on_edge_tpu.harness import bench_gemm

    res = bench_gemm.run(m=32, k=64, n=256, dtype="int8", rows=2, cols=2,
                         iters=3, stack=2, quiet=True)
    assert res["verified"]
    assert res["gflops_sustained"] > 0
    # fp32 on the xla path too
    res = bench_gemm.run(m=32, k=64, n=256, dtype="fp32", rows=2, cols=2,
                         iters=3, stack=2, pallas=False, quiet=True)
    assert res["verified"]


def test_memory_report(small_data):
    from rag_on_edge_tpu.models.brute_force import BruteForceIndex
    from rag_on_edge_tpu.models.ivf import IVFIndex

    base, queries = small_data
    bf = BruteForceIndex(base, dtype="int8", engine="pallas")
    rep = bf.memory_report()
    n, d = base.shape
    assert rep["base_t"] == n * d  # int8: one byte per element
    assert rep["TOTAL"] >= rep["base_t"]

    ivf = IVFIndex.build(base, nlist=16, metric="ip", seed=42, max_iter=5)
    rep0 = ivf.memory_report()
    assert rep0["TOTAL"] > 0
    ivf.search(queries[:8], k=5, nprobe=4, mode="cluster")  # materialize kernel state
    rep1 = ivf.memory_report()
    assert "vectors_t" in rep1  # block-padded slabs counted once present
    assert rep1["TOTAL"] > rep0["TOTAL"]
