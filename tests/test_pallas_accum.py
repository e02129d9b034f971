"""Packed-accumulation kernels (ops/pallas_bruteforce_dma, ops/pallas_ivf_dma).

The hot-loop selection is one elementwise maximum over packed score+code
keys; these tests pin the packing/unpacking algebra (exact int dots, code
recovery, tie direction), the L2 integer-bias path, the f32 monotone-key
path, and end-to-end parity through the index classes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rag_on_edge_tpu as ret
from rag_on_edge_tpu.ops import pallas_ivf
from rag_on_edge_tpu.ops.pallas_bruteforce_dma import (
    fused_topk_accum,
    l2_bias_rows,
    tile_base,
    tile_norms,
)
from rag_on_edge_tpu.ops.pallas_ivf_dma import cluster_major_accum
from rag_on_edge_tpu.utils.datasets import ground_truth
from rag_on_edge_tpu.utils.metrics import recall_at_k


def _bin_recall(got, ref):
    return np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / len(b) for a, b in zip(got, ref)]
    )


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(0)
    n, d, b = 5000, 64, 48
    base = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    return base, q


class TestFusedTopkAccum:
    def test_f32_ip_matches_exact(self, small):
        base, q = small
        n, k = base.shape[0], 10
        tiled, _ = tile_base(np.ascontiguousarray(base.T), 512, 8)
        v, i = fused_topk_accum(jnp.asarray(q), jnp.asarray(tiled), n, k,
                                group=8, depth=4)
        sc = q @ base.T
        ref = np.argsort(-sc, axis=1)[:, :k]
        assert _bin_recall(np.asarray(i), ref) >= 0.99  # bin-collision budget
        # values reproduce true scores to the 4 truncated mantissa bits
        vs = np.take_along_axis(sc, np.asarray(i), axis=1)
        assert np.max(np.abs(np.asarray(v) - vs) / (np.abs(vs) + 1e-9)) < 1e-4

    def test_int8_ip_values_exact(self, small):
        base, q = small
        n, k = base.shape[0], 10
        bq = np.clip(np.round(base / 0.02), -127, 127).astype(np.int8)
        qq = np.clip(np.round(q / 0.02), -127, 127).astype(np.int8)
        tiled, _ = tile_base(np.ascontiguousarray(bq.T), 512, 8)
        v, i = fused_topk_accum(jnp.asarray(qq), jnp.asarray(tiled), n, k,
                                group=8, depth=4)
        sc = qq.astype(np.int32) @ bq.astype(np.int32).T
        ref = np.argsort(-sc, axis=1)[:, :k]
        assert _bin_recall(np.asarray(i), ref) >= 0.99
        # unpacked int dots are EXACT (shift algebra loses nothing)
        vs = np.take_along_axis(sc, np.asarray(i), axis=1)
        assert np.array_equal(np.asarray(v), vs)

    def test_int8_l2_bias_path(self, small):
        base, q = small
        n, k = base.shape[0], 10
        sb = sq = 0.02
        bq = np.clip(np.round(base / sb), -127, 127).astype(np.int8)
        qq = np.clip(np.round(q / sq), -127, 127).astype(np.int8)
        tiled, _ = tile_base(np.ascontiguousarray(bq.T), 512, 8)
        norms = np.sum(base.astype(np.float64) ** 2, axis=1).astype(np.float32)
        alpha = 2.0 * sq * sb
        rows = l2_bias_rows(jnp.asarray(tile_norms(norms, 512, 8)), alpha, 8)
        v, i = fused_topk_accum(jnp.asarray(qq), jnp.asarray(tiled), n, k,
                                group=8, depth=4, bias_rows=rows)
        sc = (qq.astype(np.int64) @ bq.astype(np.int64).T
              - np.round(norms / alpha).astype(np.int64)[None, :])
        ref = np.argsort(-sc, axis=1)[:, :k]
        assert _bin_recall(np.asarray(i), ref) >= 0.98
        vs = np.take_along_axis(sc, np.asarray(i), axis=1)
        assert np.array_equal(np.asarray(v).astype(np.int64), vs)

    def test_group_must_divide(self, small):
        base, q = small
        tiled, _ = tile_base(np.ascontiguousarray(base.T), 512, 8)
        with pytest.raises(ValueError):
            fused_topk_accum(jnp.asarray(q), jnp.asarray(tiled),
                             base.shape[0], 5, group=12, depth=4)


class TestClusterMajorAccum:
    @pytest.fixture(scope="class")
    def clustered(self):
        rng = np.random.default_rng(1)
        blk, d = 256, 64
        sizes = np.array([300, 120, 0, 700, 256, 90], np.int64)
        offsets = np.concatenate([[0], np.cumsum(-(-sizes // blk) * blk)])[:-1]
        bc, bf, bl, rv, lastb = pallas_ivf.build_block_tables(offsets, sizes, blk)
        padb = (-len(bc)) % 8
        if len(bc) + padb < 8:
            padb = 8 - len(bc)
        bc, bf, bl, rv = (np.pad(x, (0, padb)) for x in (bc, bf, bl, rv))
        n_padded = int(offsets[-1] + -(-int(sizes[-1]) // blk) * blk)
        vecs = np.zeros((n_padded, d), np.float32)
        for c in range(len(sizes)):
            vecs[offsets[c]:offsets[c] + sizes[c]] = rng.standard_normal(
                (sizes[c], d))
        vq = np.clip(np.round(vecs / 0.02), -127, 127).astype(np.int8)
        vt = np.zeros((len(bc), d, blk), np.int8)
        for j in range(len(bc) - padb):
            vt[j] = vq[j * blk:(j + 1) * blk].T
        qs = rng.standard_normal((32, d)).astype(np.float32)
        qi = np.clip(np.round(qs / 0.02), -127, 127).astype(np.int8)
        cq = np.full((len(sizes), 16), -1, np.int32)
        for c in range(len(sizes)):
            cq[c, :5] = rng.choice(32, size=5, replace=False)
        qk = np.where((cq >= 0)[..., None], qi[np.clip(cq, 0, None)], 0)
        return dict(blk=blk, sizes=sizes, offsets=offsets, lastb=lastb,
                    bf=bf, bl=bl, rv=rv, bc=bc, vq=vq, vt=vt, qi=qi, cq=cq,
                    qb=qk[bc].astype(np.int8))

    def test_matches_exact_per_cluster(self, clustered):
        c_ = clustered
        k = 5
        pv, pr = cluster_major_accum(
            jnp.asarray(c_["qb"]), jnp.asarray(c_["vt"]),
            jnp.asarray(c_["bf"]), jnp.asarray(c_["bl"]), jnp.asarray(c_["rv"]),
            k=k, blk=c_["blk"], group=8, depth=8, bin2=True)
        pr = np.asarray(pr)
        pv = np.asarray(pv)
        for c in range(len(c_["sizes"])):
            if c_["sizes"][c] == 0:
                continue
            j = c_["lastb"][c]
            lo, hi = c_["offsets"][c], c_["offsets"][c] + c_["sizes"][c]
            for s in range(5):
                sc = (c_["qi"][c_["cq"][c, s]].astype(np.int32)
                      @ c_["vq"][lo:hi].astype(np.int32).T)
                order = np.argsort(-sc, kind="stable")[:k]
                rows_exact = (lo + order).astype(np.int64)
                got = pr[j, s].astype(np.int64)
                inter = len(set(got.tolist()) & set(rows_exact.tolist()))
                assert inter >= k - 1  # <=1 binned loss per slot
                # values are the f32 casts of the exact int dots
                both = np.array_equal(got, rows_exact)
                if both:
                    assert np.allclose(pv[j, s], np.sort(sc)[::-1][:k])

    def test_unroutable_slots_are_neg_inf(self, clustered):
        c_ = clustered
        pv, pr = cluster_major_accum(
            jnp.asarray(c_["qb"]), jnp.asarray(c_["vt"]),
            jnp.asarray(c_["bf"]), jnp.asarray(c_["bl"]), jnp.asarray(c_["rv"]),
            k=200, blk=c_["blk"], group=8, depth=8, bin2=True)
        # cluster 5 has 90 rows < k=200: the tail must be -inf with row 0
        j = c_["lastb"][5]
        row = np.asarray(pv[j, 0])
        assert np.isneginf(row[-1])
        assert np.asarray(pr[j, 0])[-1] == 0


class TestIndexEngines:
    def test_bruteforce_accum_engine(self):
        rng = np.random.default_rng(2)
        n, d, b, k = 30000, 64, 64, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        q = (base[rng.integers(0, n, b)]
             + 0.2 * rng.standard_normal((b, d))).astype(np.float32)
        for metric in ("ip", "l2"):
            gt = ground_truth(base, q, k, metric=metric)
            idx = ret.BruteForceIndex(base, metric=metric, dtype="int8",
                                      engine="accum")
            ids, vals = idx.search(q, k=k, batch_size=64)
            assert recall_at_k(ids, gt, k) >= 0.93
            assert vals.shape == (b, k)

    def test_ivf_accum_engine_matches_grouped(self):
        rng = np.random.default_rng(3)
        n, d, b, k = 20000, 64, 128, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        q = (base[rng.integers(0, n, b)]
             + 0.2 * rng.standard_normal((b, d))).astype(np.float32)
        idx = ret.IVFIndex.build(base, nlist=64, seed=42, metric="l2",
                                 dtype="int8", pad_block=512)
        qd = jnp.asarray(q)
        _, ids_ref, _ = idx.search_device(qd, k, 8, mode="cluster",
                                          engine="pallas")
        _, ids_acc, _ = idx.search_device(qd, k, 8, mode="cluster",
                                          engine="pallas_accum")
        # both rescore in fp32 over near-identical candidate pools
        agree = np.mean(np.asarray(ids_ref) == np.asarray(ids_acc))
        assert agree >= 0.98

    def test_ivf_accum_block_cap_guard(self):
        rng = np.random.default_rng(4)
        base = rng.standard_normal((3000, 32)).astype(np.float32)
        # nlist=1 forces one giant cluster: 3000 rows / 128 blk > 16 blocks
        idx = ret.IVFIndex.build(base, nlist=1, seed=42, metric="ip",
                                 dtype="int8", pad_block=128)
        with pytest.raises(ValueError, match="pallas_accum"):
            idx.search_device(jnp.asarray(base[:8]), 5, 1, mode="cluster",
                              engine="pallas_accum")

    def test_ivf_planes_multiblock_clusters(self):
        """Multi-block clusters exercise the planes emit's block-offset
        decode (code bits): pad_block=128 forces ~3-block clusters."""
        rng = np.random.default_rng(5)
        n, d, b, k = 20000, 64, 128, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        q = (base[rng.integers(0, n, b)]
             + 0.2 * rng.standard_normal((b, d))).astype(np.float32)
        idx = ret.IVFIndex.build(base, nlist=64, seed=42, metric="l2",
                                 dtype="int8", pad_block=128)
        idx._ensure_kernel_state()
        assert idx._cm_max_nb >= 2
        qd = jnp.asarray(q)
        gt = ground_truth(base, q, k, metric="l2")
        _, ids_ref, _ = idx.search_device(qd, k, 8, mode="cluster",
                                          engine="pallas")
        _, ids_acc, _ = idx.search_device(qd, k, 8, mode="cluster",
                                          engine="pallas_accum")
        # Both pools are bin-approximate and differ slightly; what must
        # hold is equal recall within the probed set (a decode bug would
        # collapse it) plus near-total id agreement.
        r_ref = recall_at_k(np.asarray(ids_ref), gt, k)
        r_acc = recall_at_k(np.asarray(ids_acc), gt, k)
        assert r_acc >= r_ref - 0.005
        agree = np.mean(np.asarray(ids_ref) == np.asarray(ids_acc))
        assert agree >= 0.95

    @pytest.mark.parametrize("dtype,metric", [("fp32", "ip"), ("fp32", "l2"),
                                              ("bf16", "l2")])
    def test_ivf_planes_float_paths(self, dtype, metric):
        """Float planes keys (monotone i32, 8 low mantissa bits ceded)."""
        rng = np.random.default_rng(6)
        n, d, b, k = 12000, 64, 64, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        q = (base[rng.integers(0, n, b)]
             + 0.2 * rng.standard_normal((b, d))).astype(np.float32)
        idx = ret.IVFIndex.build(base, nlist=32, seed=42, metric=metric,
                                 dtype=dtype, pad_block=512)
        qd = jnp.asarray(q)
        _, ids_ref, _ = idx.search_device(qd, k, 6, mode="cluster",
                                          engine="pallas", rescore=True)
        _, ids_acc, _ = idx.search_device(qd, k, 6, mode="cluster",
                                          engine="pallas_accum", rescore=True)
        agree = np.mean(np.asarray(ids_ref) == np.asarray(ids_acc))
        assert agree >= 0.98

    def test_engine_auto_picks_accum(self):
        rng = np.random.default_rng(7)
        base = rng.standard_normal((5000, 32)).astype(np.float32)
        idx = ret.IVFIndex.build(base, nlist=16, seed=42, metric="ip",
                                 dtype="int8", pad_block=512)
        v, i, c = idx.search_device(jnp.asarray(base[:16]), 5, 4,
                                    mode="cluster")  # engine="auto" default
        assert i.shape == (16, 5)
        # ineligible layout (one 24-block cluster) falls back to grouped
        idx2 = ret.IVFIndex.build(base, nlist=1, seed=42, metric="ip",
                                  dtype="int8", pad_block=128)
        v2, i2, c2 = idx2.search_device(jnp.asarray(base[:16]), 5, 1,
                                        mode="cluster")
        assert i2.shape == (16, 5)


def test_int8_planes_dim_bound_rejected():
    """int8 packed keys overflow int32 beyond d=512 (IP) / 384 (L2 bias):
    the kernel must refuse, and IVFIndex auto must fall back to the
    grouped engine instead of returning silently-garbage rankings."""
    import numpy as np
    import pytest
    from rag_on_edge_tpu.models.ivf import IVFIndex
    from rag_on_edge_tpu.ops import pallas_ivf_dma

    rng = np.random.default_rng(0)
    base = rng.normal(scale=20, size=(2048, 768)).astype(np.float32)
    idx = IVFIndex.build(base, nlist=8, metric="l2", dtype="int8",
                         seed=42, max_iter=5)
    assert idx._accum_dim_cap() == pallas_ivf_dma.INT8_DIM_MAX_BIAS
    q = base[:16]
    with pytest.raises(ValueError, match="dim"):
        idx.search(q, k=5, nprobe=2, mode="cluster", engine="pallas_accum")
    # auto falls back to the grouped engine and still searches correctly
    ids, _, _ = idx.search(q, k=1, nprobe=8, mode="cluster", engine="auto")
    assert (np.asarray(ids)[:, 0] == np.arange(16)).mean() >= 0.9
