"""Distributed stats merge: flatten -> psum -> rebuild must reproduce the
host-side merge (the invariant the reference gets for free by being
single-process, SURVEY §4.3)."""

import numpy as np

from bs_call_tpu.parallel.distributed import (
    merge_stats_collective,
    my_contigs,
    sparse_into_stats,
    stats_to_sparse,
    stats_to_vectors,
    vectors_to_stats,
)
from bs_call_tpu.stats.collect import BsStats


def random_stats(seed):
    rng = np.random.default_rng(seed)
    s = BsStats()
    s.snps = [int(rng.integers(100)), int(rng.integers(50))]
    s.CpG_ref = [int(rng.integers(100)), int(rng.integers(50))]
    s.mut_counts = rng.integers(0, 100, (12, 2))
    s.qual = rng.integers(0, 1000, (4, 256))
    s.filter_cts = rng.integers(0, 100, 15)
    s.filter_bases = rng.integers(0, 5000, 15)
    s.base_filter = rng.integers(0, 100, 5)
    s.filter_counts = rng.integers(0, 100, (2, 32))
    s.CpG_ref_meth = rng.random((2, 101))
    for d in rng.integers(1, 100, 10):
        cs = s.cov_stats[int(d)]
        cs.all = int(rng.integers(1, 50))
        cs.var = int(rng.integers(0, 10))
        cs.CpG = [int(rng.integers(5)), int(rng.integers(5))]
        cs.CpG_inf = [int(rng.integers(5)), int(rng.integers(5))]
        cs.gc_pcent = rng.integers(0, 10, 101)
    for k in rng.integers(0, 200, 8):
        s.fs_stats[int(k)][0] = int(rng.integers(10))
        s.fs_stats[int(k)][1] = int(rng.integers(10))
    s.grow_meth_profile(60)
    s.meth_profile[:61] = rng.integers(0, 50, (61, 4))
    return s


def test_vector_roundtrip():
    s = random_stats(0)
    s2 = vectors_to_stats(stats_to_vectors(s))
    sparse_into_stats(s2, stats_to_sparse(s), s.meth_profile_used)
    np.testing.assert_array_equal(s2.qual, s.qual)
    np.testing.assert_array_equal(s2.mut_counts, s.mut_counts)
    assert s2.snps == s.snps
    assert {k: v.all for k, v in s2.cov_stats.items()} == {
        k: v.all for k, v in s.cov_stats.items()
    }
    assert dict(s2.fs_stats) == dict(s.fs_stats)
    np.testing.assert_array_equal(
        s2.meth_profile[:61], s.meth_profile[:61]
    )


def test_collective_merge_equals_host_merge():
    # single process: the collective runs over the 8 virtual devices; one
    # device carries this process's payload, so psum == local stats
    s = random_stats(1)
    merged = merge_stats_collective(s)
    np.testing.assert_array_equal(merged.qual, s.qual)
    np.testing.assert_array_equal(merged.filter_counts, s.filter_counts)
    assert merged.snps == s.snps
    np.testing.assert_allclose(merged.CpG_ref_meth, s.CpG_ref_meth)
    assert {k: v.all for k, v in merged.cov_stats.items()} == {
        k: v.all for k, v in s.cov_stats.items()
    }


def test_collective_merge_exact_beyond_old_fold_bounds():
    """Depths >4096 and fs/qd/mq keys >512 (the round-2 dense-fold clip
    bounds) must survive the collective EXACTLY — the reference's
    coverage hash is unbounded (stats.c:208-228), so a deep mito/rRNA
    pileup or an extreme FS key must not be silently folded."""
    s = BsStats()
    for d in (3, 4095, 4096, 50_000, 1_000_000):
        cs = s.cov_stats[d]
        cs.all = d + 1
        cs.var = 2
        cs.gc_pcent = np.arange(101, dtype=np.int64)
    s.fs_stats[10_000][0] = 7
    s.qd_stats[511][1] = 3
    s.qd_stats[9_999][1] = 4
    s.mq_stats[70_000][0] = 5
    merged = merge_stats_collective(s)
    assert {k: v.all for k, v in merged.cov_stats.items()} == {
        k: v.all for k, v in s.cov_stats.items()
    }
    np.testing.assert_array_equal(
        merged.cov_stats[1_000_000].gc_pcent, np.arange(101)
    )
    assert dict(merged.fs_stats) == dict(s.fs_stats)
    assert dict(merged.qd_stats) == dict(s.qd_stats)
    assert dict(merged.mq_stats) == dict(s.mq_stats)


def test_contig_assignment_partitions():
    universe = [(f"c{i}", 1000 * (i + 1)) for i in range(10)]
    seen = []
    for h in range(4):
        seen.extend(my_contigs(universe, 4, h))
    assert sorted(seen) == sorted(n for n, _ in universe)


def test_collective_preserves_int64_and_float64():
    """Big counters (>> 2^31) and f64 grids must survive the collective
    bit-exact even when the caller never enabled x64 (device_put would
    otherwise canonicalize int64->int32 / f64->f32)."""
    s = BsStats()
    s.filter_bases = np.zeros(15, dtype=np.int64)
    s.filter_bases[0] = (1 << 35) + 7
    s.CpG_ref_meth = np.full((2, 101), 1.0 + 2.0**-40, dtype=np.float64)
    merged = merge_stats_collective(s)
    assert int(merged.filter_bases[0]) == (1 << 35) + 7
    np.testing.assert_array_equal(merged.CpG_ref_meth, s.CpG_ref_meth)
