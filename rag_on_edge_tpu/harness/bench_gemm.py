"""Spatial-GEMM benchmark — the XRT host driver's workload, TPU-native.

Reproduces the reference's AIE benchmark contract (``AMD_npu/Codes/
test.cpp:57-401`` + ``Codes/test/README.md:236-248``): fixed-seed inputs,
an iteration loop with warmup exclusion, full-vs-stochastic verification,
and avg/min/max per-pass time with GFLOPs = 2·M·K·N / time
(``test.cpp:373-385``).  The published workload is GEMM 128×128×N,
N = 2048 → 10240, SIFT-small rows L2-normalized and scaled
(``benchmarks/README.md:33-38``, ``preprocess.py:24-36``); the AIE array
reached ~100-675 GFLOPs/pass (typ. 400-600) at int16 (``benchmarks/
graph.png``).  Here the inputs go through the same normalize → scale →
pad pipeline to int8 (the MXU's narrow dtype — ``utils/preprocess.py``)
and the GEMM runs spatially partitioned over a 2-D mesh
(``parallel/spatial_gemm.py``); a single chip uses a 1×1 mesh.

Usage::

    python -m rag_on_edge_tpu.harness.bench_gemm -M 128 -K 128 -N 10240 \
        --dtype int8 --iters 100
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from rag_on_edge_tpu.parallel.spatial_gemm import (
    _spatial_fn,
    make_mesh_2d,
    spatial_matmul,
    verify_matmul,
)
from rag_on_edge_tpu.harness import timing
from rag_on_edge_tpu.utils.preprocess import prepare_int8_operands


def _make_inputs(m: int, k: int, n: int, dtype: str, seed: int):
    """Fixed-seed inputs (CI reproducibility, ``test.cpp:73``), pushed
    through the reference's normalize → scale → narrow pipeline for int8
    (``preprocess.py:24-36``; rows of A and columns of B unit-normalized)."""
    rng = np.random.default_rng(seed)
    a = rng.uniform(0.0, 141.0, size=(m, k)).astype(np.float32)  # SIFT range
    b = rng.uniform(0.0, 141.0, size=(k, n)).astype(np.float32)
    if dtype == "int8":
        a_i8, b_i8, _ = prepare_int8_operands(a, b.T, query_row_multiple=1,
                                              base_row_multiple=1)
        return a_i8, b_i8.T.copy()
    if dtype == "bf16":
        return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return a, b


def run(m: int = 128, k: int = 128, n: int = 10240, dtype: str = "int8",
        rows: int | None = None, cols: int | None = None, iters: int = 100,
        warmup: int = 2, pallas: bool = True, seed: int = 0,
        stack: int = 16, quiet: bool = False) -> dict:
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if rows is None or cols is None:
        nd = len(jax.devices())
        rows = rows or (4 if nd >= 16 else (2 if nd >= 4 else 1))
        cols = cols or (4 if nd >= 16 else (2 if nd >= 4 else 1))
    mesh = make_mesh_2d(rows, cols)
    a_np, b_np = _make_inputs(m, k, n, dtype, seed)
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    c = jax.block_until_ready(spatial_matmul(a, b, mesh, use_pallas_kernel=pallas))
    ok = verify_matmul(np.asarray(a_np), np.asarray(b_np), np.asarray(c), seed=seed)

    # Iteration loop with warmup exclusion (test.cpp:253-275), under the
    # chained-dependency protocol (harness/timing.py — per-pass host syncs
    # would time the relay round trip, not the GEMM): distinct A per pass,
    # pass i+1's input depends on pass i's output, one final
    # materialization.  Operands are placed on the mesh ONCE (the
    # reference syncs its BOs to the device once, ``test.cpp:238-243``);
    # per-pass sync latency is reported alongside (its run.wait() number).
    a_dev = jax.device_put(a, NamedSharding(mesh, P("row", None)))
    b_dev = jax.device_put(b, NamedSharding(mesh, P(None, "col")))
    acc = "int32" if a.dtype == jnp.int8 else "float32"
    jitted = _spatial_fn(mesh, pallas, acc)
    fn = lambda av: jitted(av, b_dev)  # noqa: E731
    passes_per_s = timing.measure_throughput(fn, [a_dev], repeats=iters) / m

    # Stacked passes: `stack` independent A tiles per dispatch (one
    # [stack·M, K] GEMM — the AIE design likewise streams A tiles through
    # the array back-to-back).  On a tunnelled chip the per-pass number
    # above is dispatch-bound; this is the device-capacity number.
    a_stack = jnp.asarray(
        np.concatenate([np.roll(a_np, i + 1, axis=0) for i in range(stack)])
    )
    a_stack = jax.device_put(a_stack, NamedSharding(mesh, P("row", None)))
    fs = lambda av: jitted(av, b_dev)  # noqa: E731
    stacked_passes_per_s = (
        timing.measure_throughput(fs, [a_stack], repeats=max(4, iters // stack))
        / m
    )
    lat = timing.measure_latency(fn, [a_dev], warmup=warmup)
    flops = 2.0 * m * k * n
    res = {
        "M": m, "K": k, "N": n, "dtype": dtype, "mesh": f"{rows}x{cols}",
        "kernel": "pallas" if pallas else "xla",
        "verified": bool(ok),
        "avg_us": float(1e6 / passes_per_s),
        "stacked_avg_us": float(1e6 / stacked_passes_per_s),
        "sync_p50_us": float(lat.p50 * 1e3),
        "sync_max_us": float(lat.max * 1e3),
        "gflops_dispatch": float(flops * passes_per_s / 1e9),
        "gflops_sustained": float(flops * stacked_passes_per_s / 1e9),
    }
    if not quiet:
        print(f"GEMM {m}x{k}x{n} {dtype} mesh={rows}x{cols} "
              f"({'pallas' if pallas else 'xla'}) verified={ok}")
        print(f"per pass: {res['avg_us']:.1f} us one-dispatch-per-pass, "
              f"{res['stacked_avg_us']:.1f} us at {stack} passes/dispatch "
              f"(sync round trip p50 {res['sync_p50_us']:.1f} us)")
        print(f"GFLOPs: {res['gflops_dispatch']:.1f} dispatch-bound, "
              f"{res['gflops_sustained']:.1f} sustained "
              f"(reference AIE: ~100-675/pass, typ. 400-600, int16 4x4 array)")
    return res


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-M", type=int, default=128)
    p.add_argument("-K", type=int, default=128)
    p.add_argument("-N", type=int, default=10240)
    p.add_argument("--dtype", default="int8", choices=["int8", "bf16", "fp32"])
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--cols", type=int, default=None)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction, default=True,
                   help="tiled Pallas MXU kernel (measured 8x the XLA int8 path)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stack", type=int, default=16,
                   help="passes fused into one dispatch for the sustained number")
    args = p.parse_args(argv)
    run(args.M, args.K, args.N, args.dtype, args.rows, args.cols,
        args.iters, pallas=args.pallas, seed=args.seed, stack=args.stack)


if __name__ == "__main__":
    main()
