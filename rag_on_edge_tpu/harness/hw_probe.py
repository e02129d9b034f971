"""Platform probes: establish the hardware ceiling and the Pallas floor.

Round-1 measured both production kernels at a ~7 µs/grid-step fixed cost
(kernel_lab), invariant to grouping/qcap/layout, and effective streaming
of ~91 GB/s (int8) / ~190 GB/s (bf16) — far below v5e paper specs
(819 GB/s HBM, 394 int8 TOPS).  Before optimizing further, this harness
separates three candidate explanations:

1. the PLATFORM (axon-relayed chip) is itself slower than paper specs —
   measured by pure-XLA GEMM TFLOPS and reduce/copy GB/s ceilings;
2. MOSAIC per-grid-step overhead — measured by trivial kernels whose
   per-step work is ~zero, over growing grids (the slope is the floor);
3. per-DMA / per-tile-shape cost — measured by streaming kernels at
   several tile shapes, dtypes, and dimension_semantics.

Usage:
    python -m rag_on_edge_tpu.harness.hw_probe --probes xla pallas_step
    python -m rag_on_edge_tpu.harness.hw_probe            # everything
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_on_edge_tpu.harness import timing


def _sec_per_call(fn, batch, repeats=8):
    """Chained timing (timing.py defenses) -> seconds per call."""
    qps = timing.measure_throughput(fn, [batch], repeats=repeats)
    return batch.shape[0] / qps


# ---------------------------------------------------------------- XLA ceiling


@functools.partial(jax.jit, static_argnames=("acc",))
def _gemm(a, b, acc):
    return jnp.sum(
        jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=acc),
        dtype=jnp.float32,
    ).reshape(1)


@jax.jit
def _reduce(v, big):
    return (jnp.sum(big, dtype=jnp.float32) + jnp.sum(v)).reshape(1)


@jax.jit
def _copy(v, big):
    # read + write one big array; the first-row sum ties it into the chain.
    out = big + v[0, 0].astype(big.dtype)
    return jnp.sum(out[0], dtype=jnp.float32).reshape(1)


def probe_xla(repeats=8):
    print("== XLA ceilings (pure XLA ops, no Pallas) ==")
    rng = np.random.default_rng(0)

    for m, k, n, dt, acc in [
        (1024, 4096, 4096, jnp.bfloat16, jnp.float32),
        (4096, 4096, 4096, jnp.bfloat16, jnp.float32),
        (1024, 4096, 4096, jnp.int8, jnp.int32),
        (4096, 4096, 4096, jnp.int8, jnp.int32),
        (2048, 128, 16384, jnp.int8, jnp.int32),  # search-shaped: K=D=128
    ]:
        if dt == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
            b = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
        else:
            a = jnp.asarray(rng.standard_normal((m, k)), dt)
            b = jnp.asarray(rng.standard_normal((k, n)), dt)
        fn = functools.partial(_gemm, b=b, acc=acc)
        sec = _sec_per_call(fn, a, repeats)
        tflops = 2 * m * k * n / sec / 1e12
        print(f"  gemm {m}x{k}x{n} {np.dtype(dt).name:<9} {sec*1e3:8.3f} ms"
              f"  {tflops:8.2f} TOPS")

    nbytes = 1 << 30
    for dt in [jnp.int8, jnp.bfloat16, jnp.float32]:
        elems = nbytes // np.dtype(dt).itemsize
        big = jnp.zeros((elems,), dt)
        v = jnp.zeros((8, 128), jnp.float32)
        fn = functools.partial(_reduce, big=big)
        sec = _sec_per_call(fn, v, repeats)
        print(f"  reduce 1GiB {np.dtype(dt).name:<9} {sec*1e3:8.3f} ms"
              f"  {nbytes/sec/1e9:8.1f} GB/s read")
        fn = functools.partial(_copy, big=big)
        sec = _sec_per_call(fn, v, repeats)
        print(f"  copy   1GiB {np.dtype(dt).name:<9} {sec*1e3:8.3f} ms"
              f"  {2*nbytes/sec/1e9:8.1f} GB/s r+w")


# ------------------------------------------------------- Pallas per-step cost


def _noop_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


@functools.partial(jax.jit, static_argnames=("g", "moving", "semantics"))
def _step_probe(x, g, moving, semantics):
    """Trivial kernel over a grid of g steps.

    moving=False: input/output windows pinned -> pure grid-loop overhead.
    moving=True:  input window advances per step (4 KB f32 tile) -> adds
    one small DMA issue+wait per step.
    """
    if moving:
        big = jnp.broadcast_to(x, (g, 8, 128)).reshape(g * 8, 128)
        in_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        inp = big
    else:
        in_spec = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        inp = x
    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))
    out = pl.pallas_call(
        _noop_kernel,
        grid=(g,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        **params,
    )(inp)
    return out.reshape(-1)[:1]


def probe_pallas_step(repeats=8):
    print("== Pallas per-grid-step floor (trivial kernel) ==")
    x = jnp.ones((8, 128), jnp.float32)
    for semantics in [None, "arbitrary", "parallel"]:
        for moving in [False, True]:
            times = {}
            for g in [256, 1024, 4096]:
                fn = functools.partial(_step_probe, g=g, moving=moving,
                                       semantics=semantics)
                times[g] = _sec_per_call(fn, x, repeats)
            slope = (times[4096] - times[256]) / (4096 - 256)
            print(f"  semantics={semantics!s:<10} moving={moving!s:<6}"
                  f" t(256)={times[256]*1e3:7.3f} ms t(4096)={times[4096]*1e3:7.3f} ms"
                  f"  slope={slope*1e6:6.3f} us/step")


# ------------------------------------------------------ Pallas streaming cost


def _stream_kernel(x_ref, v_ref, o_ref, *, fat, gemm):
    s = None
    for i in range(fat):
        tile = v_ref[0, i] if fat > 1 else v_ref[0]
        if gemm:
            sc = jax.lax.dot_general(
                x_ref[:], tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
                if tile.dtype == jnp.int8 else jnp.float32,
            )
            m = jnp.max(sc.astype(jnp.float32))
        else:
            m = jnp.max(tile.astype(jnp.float32))
        s = m if s is None else jnp.maximum(s, m)
    o_ref[:] = jnp.full((8, 128), s, jnp.float32)


@functools.partial(jax.jit, static_argnames=("blk", "fat", "gemm", "semantics"))
def _stream_probe(x, data, blk, fat, gemm, semantics):
    """Walk `data` [nblocks, d, blk] tile by tile; per step pull `fat`
    blocks in one window and reduce them (optionally through a GEMM
    against a VMEM-resident x [128, d])."""
    nblocks, d, _ = data.shape
    g = nblocks // fat
    if fat > 1:
        data = data.reshape(g, fat, d, blk)
        in_spec = pl.BlockSpec((1, fat, d, blk), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((1, d, blk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))
    out = pl.pallas_call(
        functools.partial(_stream_kernel, fat=fat, gemm=gemm),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((x.shape[0], x.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            in_spec,
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        **params,
    )(x, data)
    return out.reshape(-1)[:1]


def probe_pallas_stream(repeats=6):
    print("== Pallas streaming (512 MB walk, per-variant) ==")
    rng = np.random.default_rng(0)
    d = 128
    total = 512 << 20
    for dt in [jnp.int8, jnp.bfloat16]:
        isz = np.dtype(dt).itemsize
        for blk in [2048, 8192]:
            nblocks = total // (d * blk * isz)
            nblocks -= nblocks % 16
            if dt == jnp.int8:
                data = jnp.asarray(
                    rng.integers(-127, 127, (nblocks, d, blk), dtype=np.int8))
                x = jnp.asarray(
                    rng.integers(-127, 127, (128, d), dtype=np.int8))
            else:
                data = jnp.asarray(rng.standard_normal((nblocks, d, blk)), dt)
                x = jnp.asarray(rng.standard_normal((128, d)), dt)
            xf = jnp.asarray(np.zeros((8, 128), np.float32))
            for fat in [1, 4]:
                if 2 * fat * d * blk * isz > 12 << 20:
                    continue  # double-buffered window would blow VMEM
                for gemm in [False, True]:
                    for semantics in [None, "arbitrary"]:
                        fn = lambda v, _d=data, _x=x, _b=blk, _f=fat, _g=gemm, _s=semantics: (  # noqa: E731,E501
                            _stream_probe(
                                (_x + v[0, 0].astype(_x.dtype))
                                if _x.dtype != jnp.int8 else _x,
                                _d, _b, _f, _g, _s)
                            + jnp.sum(v) * 0)
                        sec = _sec_per_call(fn, xf, repeats)
                        nb = nblocks * d * blk * isz
                        us_step = sec / (nblocks // fat) * 1e6
                        print(f"  {np.dtype(dt).name:<8} blk={blk:<5} fat={fat}"
                              f" gemm={int(gemm)} sem={semantics!s:<9}"
                              f" {sec*1e3:8.2f} ms  {nb/sec/1e9:7.1f} GB/s"
                              f"  {us_step:6.2f} us/step")


# ------------------------------------------------- manual multi-DMA pipeline


def _dma_kernel(hbm_ref, o_ref, scratch, sems, *, depth, nblocks, gemm, q=None):
    """Walk hbm_ref [nblocks, d, blk] with `depth` DMAs in flight."""
    ngroups = nblocks // depth

    def group(g, acc):
        accs = acc
        for j in range(depth):
            pltpu.make_async_copy(
                hbm_ref.at[g * depth + j], scratch.at[j], sems.at[j]
            ).start()
        for j in range(depth):
            pltpu.make_async_copy(
                hbm_ref.at[g * depth + j], scratch.at[j], sems.at[j]
            ).wait()
            accs = jnp.maximum(accs, jnp.max(scratch[j].astype(jnp.float32)))
        return accs

    acc = jax.lax.fori_loop(0, ngroups, group, jnp.float32(-jnp.inf))
    o_ref[:] = jnp.full((8, 128), acc, jnp.float32)


@functools.partial(jax.jit, static_argnames=("depth",))
def _dma_probe(x, data, depth):
    nblocks, d, blk = data.shape
    return pl.pallas_call(
        functools.partial(_dma_kernel, depth=depth, nblocks=nblocks, gemm=False),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, d, blk), data.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )(data).reshape(-1)[:1] + jnp.sum(x) * 0


def probe_pallas_dma(repeats=6):
    """MARGINAL bandwidth: time a full and a quarter walk of the same
    array and divide the byte delta by the time delta — the ~5-6 ms
    per-execution fixed cost of this platform otherwise dominates any
    sub-GB walk and understates bandwidth several-fold."""
    print("== Pallas manual multi-DMA streaming (marginal GB/s) ==")
    rng = np.random.default_rng(0)
    d = 128
    total = 2 << 30
    xf = jnp.zeros((8, 128), jnp.float32)
    for dt, blk in [(jnp.int8, 2048), (jnp.int8, 8192), (jnp.bfloat16, 2048)]:
        isz = np.dtype(dt).itemsize
        nblocks = total // (d * blk * isz)
        nblocks -= nblocks % 64
        if dt == jnp.int8:
            data = jnp.asarray(
                rng.integers(-127, 127, (nblocks, d, blk), dtype=np.int8))
        else:
            data = jnp.asarray(rng.standard_normal((nblocks, d, blk)), dt)
        small = data[: nblocks // 4]
        for depth in [1, 4, 8]:
            if depth * d * blk * isz > 12 << 20:
                continue
            t_full = _sec_per_call(
                lambda v, _d=data, _k=depth: _dma_probe(v, _d, _k), xf, repeats)
            t_quarter = _sec_per_call(
                lambda v, _d=small, _k=depth: _dma_probe(v, _d, _k), xf, repeats)
            db = (nblocks - nblocks // 4) * d * blk * isz
            gbs = db / max(t_full - t_quarter, 1e-9) / 1e9
            print(f"  {np.dtype(dt).name:<8} blk={blk:<5} depth={depth}"
                  f" full={t_full*1e3:8.2f} ms quarter={t_quarter*1e3:8.2f} ms"
                  f"  marginal {gbs:7.1f} GB/s")


# ----------------------------------------------------- in-kernel GEMM rate


def _gemm_rate_kernel(q_ref, v_ref, o_ref, *, sel):
    i = pl.program_id(0)
    # Per-step scalar twist defeats loop-invariant hoisting of the GEMM.
    q = q_ref[:]
    if q.dtype == jnp.int8:
        # i-dependent row twist (defeats hoisting); i8 sub/rotate don't
        # lower in Mosaic, but select does.
        rows = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
        qx = jnp.where(rows == (i % q.shape[0]), jnp.int8(1), q)
        acc = jnp.int32
    else:
        qx = q * (1.0 + i).astype(q.dtype)
        acc = jnp.float32
    scores = jax.lax.dot_general(
        qx, v_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=acc
    )
    if sel:
        m = jnp.max(scores.astype(jnp.float32), axis=1, keepdims=True)
    else:
        m = jnp.max(scores.astype(jnp.float32))

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = jnp.full((8, 128), jnp.max(m), jnp.float32)


@functools.partial(jax.jit, static_argnames=("g", "tb", "tn", "sel"))
def _gemm_rate_probe(x, q, v, g, tb, tn, sel):
    out = pl.pallas_call(
        functools.partial(_gemm_rate_kernel, sel=sel),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tb, q.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v.shape[0], tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(q, v)
    return out.reshape(-1)[:1] + jnp.sum(x) * 0


def probe_pallas_gemm(repeats=6):
    """Pure MXU rate inside a Mosaic grid loop (no DMA: operands resident),
    measured as a slope between two grid lengths."""
    print("== Pallas in-kernel GEMM rate (slope) ==")
    rng = np.random.default_rng(0)
    d = 128
    xf = jnp.zeros((8, 128), jnp.float32)
    for dt in [jnp.int8, jnp.bfloat16]:
        for tb, tn in [(128, 2048), (256, 2048), (512, 2048), (256, 5632),
                       (1024, 2048), (256, 1024)]:
            if dt == jnp.int8:
                q = jnp.asarray(rng.integers(-127, 127, (tb, d), dtype=np.int8))
                v = jnp.asarray(rng.integers(-127, 127, (d, tn), dtype=np.int8))
            else:
                q = jnp.asarray(rng.standard_normal((tb, d)), dt)
                v = jnp.asarray(rng.standard_normal((d, tn)), dt)
            ts = {}
            for g in [512, 2048]:
                fn = lambda w, _g=g: _gemm_rate_probe(w, q, v, _g, tb, tn, False)  # noqa: E731
                ts[g] = _sec_per_call(fn, xf, repeats)
            slope = (ts[2048] - ts[512]) / (2048 - 512)
            tops = 2 * tb * d * tn / max(slope, 1e-12) / 1e12
            print(f"  {np.dtype(dt).name:<8} [{tb:>4}x{d}]x[{d}x{tn:>5}]"
                  f"  {slope*1e6:7.2f} us/step  {tops:7.1f} TOPS")


PROBES = {
    "xla": probe_xla,
    "pallas_step": probe_pallas_step,
    "pallas_stream": probe_pallas_stream,
    "pallas_dma": probe_pallas_dma,
    "pallas_gemm": probe_pallas_gemm,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", nargs="+", default=list(PROBES))
    args = ap.parse_args()
    from rag_on_edge_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    for p in args.probes:
        PROBES[p]()


if __name__ == "__main__":
    main()
