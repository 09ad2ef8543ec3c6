"""Native C++ f64 genotype model vs the numpy f64 twin and the scalar
oracle.

bsc_model.cpp is the default exact-mode host engine (engine.py
_call_native_f64). Its contract: same results as
ops/genotype_np.py::call_genotypes_np up to libm-ulp noise — argmax
disagreements may only occur where the margin is below the engine's
oracle-rescue threshold (1e-9), where _finish_exact recomputes the
site through ops/oracle.py anyway."""

import numpy as np
import pytest

from bs_call_tpu.constants import MAX_QUAL
from bs_call_tpu.ops import oracle
from bs_call_tpu.ops.genotype_native import NativeGtModel, native_model
from bs_call_tpu.ops.genotype_np import call_genotypes_np

PARAMS = (0.01, 0.05, 2.0)


def _rand_batch(rng, n, max_count=30, sparsity=0.5):
    counts = rng.integers(0, max_count, (n, 8)).astype(np.int32)
    counts[rng.random((n, 8)) < sparsity] = 0
    quals = np.where(
        counts > 0, rng.integers(0, MAX_QUAL + 1, (n, 8)), 0
    ).astype(np.int32)
    ref = rng.integers(0, 5, n).astype(np.int32)
    return counts, quals, ref


@pytest.fixture(scope="module")
def model():
    m = native_model(*PARAMS)
    assert m is not None, "native model must build in this environment"
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_model_matches_numpy(model, seed):
    rng = np.random.default_rng(seed)
    counts, quals, ref = _rand_batch(rng, 20000)
    gp, mx, mg, off = model.call(counts, quals, ref)
    gp2, mx2, mg2, off2 = call_genotypes_np(counts, quals, ref, *PARAMS)
    np.testing.assert_allclose(gp, gp2, rtol=0, atol=1e-10)
    np.testing.assert_allclose(mg, mg2, rtol=0, atol=1e-10)
    np.testing.assert_allclose(off, off2, rtol=0, atol=1e-10)
    # argmax may differ only at true ties (both are then oracle-rescued)
    bad = mx != mx2
    assert (mg2[bad] < 1e-9).all()


def test_native_model_edge_batches(model):
    """Zero coverage, single-category pileups, qual extremes, huge
    depth: every row must match the numpy twin."""
    rows = []
    rows.append((np.zeros(8), np.zeros(8)))  # empty
    for c in range(8):  # one category only, extremes of qual
        for q in (0, 1, MAX_QUAL):
            cnt = np.zeros(8)
            cnt[c] = 1000
            ql = np.zeros(8)
            ql[c] = q
            rows.append((cnt, ql))
    # saturated informative pairs (Z boundaries)
    for a, b in [(4, 6), (5, 7), (4, 5), (6, 7)]:
        cnt = np.zeros(8)
        cnt[a] = 500
        cnt[b] = 500
        ql = np.zeros(8)
        ql[a] = ql[b] = 40
        rows.append((cnt, ql))
    counts = np.array([r[0] for r in rows], dtype=np.int32)
    quals = np.array([r[1] for r in rows], dtype=np.int32)
    n = len(rows)
    for refc in range(5):
        ref = np.full(n, refc, dtype=np.int32)
        gp, mx, mg, off = model.call(counts, quals, ref)
        gp2, mx2, mg2, off2 = call_genotypes_np(
            counts, quals, ref, *PARAMS
        )
        np.testing.assert_allclose(gp, gp2, atol=1e-10)
        bad = mx != mx2
        assert (mg2[bad] < 1e-9).all()


def test_native_model_vs_oracle_spot(model):
    """Direct scalar-oracle agreement away from ties (the reference's
    calc_gt_prob, genotype_model.c:87-247)."""
    rng = np.random.default_rng(7)
    counts, quals, ref = _rand_batch(rng, 300)
    gp, mx, mg, off = model.call(counts, quals, ref)
    for i in range(len(ref)):
        ogp, omx = oracle.calc_gt_prob(
            counts[i], quals[i], int(ref[i]), *PARAMS
        )
        if mg[i] > 1e-9:
            assert mx[i] == omx
            # non-argmax entries agree with the oracle at print grade
            sel = np.arange(10) != omx
            np.testing.assert_allclose(
                gp[i][sel], np.asarray(ogp)[sel], atol=1e-8
            )


def test_native_model_thread_determinism():
    """Identical results for any thread partition (contiguous ranges,
    no cross-thread reductions)."""
    from bs_call_tpu import native

    lib = native.load()
    m = NativeGtModel(lib, *PARAMS)
    rng = np.random.default_rng(3)
    counts, quals, ref = _rand_batch(rng, 50000)
    import bs_call_tpu.ops.genotype_native as gn

    results = []
    for nt in (1, 3, 8):
        orig = gn._n_threads
        gn._n_threads = lambda: nt
        try:
            results.append(m.call(counts, quals, ref))
        finally:
            gn._n_threads = orig
    for r in results[1:]:
        for a, b in zip(results[0], r):
            np.testing.assert_array_equal(a, b)
