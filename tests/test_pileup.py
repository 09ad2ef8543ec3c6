"""Pileup tensorization tests against a direct transcription of the C loop
(call_genotypes.c:180-226)."""

import numpy as np

from bs_call_tpu.constants import BASE_TAB_ST, FLT_QUAL
from bs_call_tpu.ops.pileup import build_pileup
from bs_call_tpu.ops.postprocess import aggregate_pileup, fisher_strand
from bs_call_tpu.ops import oracle
from bs_call_tpu.pipeline.alignments import AlignDetails


def pileup_oracle(align_list, x, y, min_qual):
    """Scalar loop mirroring call_genotypes.c:180-226."""
    sz = y - x + 1
    counts2 = np.zeros((sz, 2, 8), dtype=np.int64)
    qual_sum = np.zeros((sz, 8), dtype=np.float32)
    mapq2_sum = np.zeros(sz, dtype=np.float32)
    n_tot = np.zeros(sz, dtype=np.int64)
    for al in align_list:
        ori = al.orientation
        st = al.bs_strand
        for k in range(2):
            rd = al.read[k]
            if rd is None or len(rd) == 0:
                ori ^= 1
                continue
            rl = len(rd)
            rs = None
            for j in range(rl):
                q = int(rd[j]) >> 2
                if q > 0 and q != FLT_QUAL:
                    rs = j
                    break
            if rs is None:
                ori ^= 1
                continue
            re_ = None
            for j in range(rl - 1, -1, -1):
                q = int(rd[j]) >> 2
                if q > 0 and q != FLT_QUAL:
                    re_ = j
                    break
            pos = (al.reverse_position if k else al.forward_position) + rs
            mapq2 = np.float32(al.mapq[k] * al.mapq[k])
            j = rs
            while j <= re_ and pos <= y:
                c = int(BASE_TAB_ST[st, int(rd[j]) & 3])
                q = int(rd[j]) >> 2
                if q >= min_qual and q != FLT_QUAL:
                    n_tot[pos - x] += 1
                    qual_sum[pos - x, c] += np.float32(q)
                    mapq2_sum[pos - x] += mapq2
                    counts2[pos - x, ori, c] += 1
                j += 1
                pos += 1
            ori ^= 1
    return counts2, qual_sum, mapq2_sum, n_tot


def make_read(rng, length):
    base = rng.integers(0, 4, size=length).astype(np.uint8)
    qual = rng.integers(0, 44, size=length).astype(np.uint8)
    # sprinkle masked (63) and zero-quality bases
    qual[rng.random(length) < 0.1] = 63
    qual[rng.random(length) < 0.1] = 0
    return (base | (qual << 2)).astype(np.uint8)


def random_block(rng, n_templates, x, y):
    als = []
    for _ in range(n_templates):
        al = AlignDetails()
        al.orientation = int(rng.integers(0, 2))
        al.bs_strand = int(rng.integers(0, 3))
        paired = rng.random() < 0.6
        span = y - x - 10
        al.forward_position = x + int(rng.integers(0, max(1, span)))
        length = int(rng.integers(5, 40))
        al.read[0] = make_read(rng, length)
        al.mapq[0] = int(rng.integers(0, 60))
        if paired:
            al.reverse_position = al.forward_position + int(rng.integers(0, 30))
            length2 = int(rng.integers(5, 40))
            al.read[1] = make_read(rng, length2)
            al.mapq[1] = int(rng.integers(0, 60))
        als.append(al)
    return als


def test_pileup_matches_scalar_loop():
    rng = np.random.default_rng(7)
    x, y = 1000, 1200
    als = random_block(rng, 40, x, y)
    got = build_pileup(als, x, y, 20)
    want = pileup_oracle(als, x, y, 20)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])  # f32 exact (same order)
    np.testing.assert_array_equal(got[2], want[2])
    agg = aggregate_pileup(*got)
    np.testing.assert_array_equal(agg["n"], want[3])


def test_aggregate_rounding_matches_c_float32():
    # qual average uses float32 division + floor(0.5 + ...) (call_genotypes.c:50)
    counts2 = np.zeros((1, 2, 8), dtype=np.int32)
    counts2[0, 0, 1] = 3
    qual_sum = np.zeros((1, 8), dtype=np.float32)
    qual_sum[0, 1] = np.float32(100.0)  # 100/3 = 33.333 -> 33
    mapq2 = np.array([3 * 40.0 * 40.0], dtype=np.float32)
    agg = aggregate_pileup(counts2, qual_sum, mapq2)
    assert agg["quals"][0, 1] == 33
    assert agg["mq"][0] == 40
    assert agg["aq"][0] == 33


def test_fisher_strand_matches_oracle():
    rng = np.random.default_rng(3)
    n = 50
    counts2 = rng.integers(0, 20, size=(n, 2, 8)).astype(np.int32)
    max_gt = rng.integers(0, 10, size=n).astype(np.int32)
    fs = fisher_strand(counts2, max_gt)
    from bs_call_tpu.constants import GT_HET

    for i in range(n):
        if not GT_HET[max_gt[i]]:
            assert fs[i] == 0.0


def test_fisher_oracle_basic_properties():
    # symmetric table -> p == 1 region; independence table -> high p
    assert abs(oracle.fisher([5, 5, 5, 5]) - 1.0) < 1e-9 or oracle.fisher(
        [5, 5, 5, 5]
    ) <= 1.0 + 1e-12
    p = oracle.fisher([20, 0, 0, 20])  # extreme strand bias
    assert p < 1e-8
    assert oracle.fisher([0, 0, 0, 0]) == 1.0
    # compare against scipy-style exact value for a known table
    # table [[3, 1], [1, 3]]: two-sided p = 0.485714...
    p = oracle.fisher([3, 1, 1, 3])
    assert abs(p - 0.4857142857142857) < 1e-12
