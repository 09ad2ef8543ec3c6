"""Unit tests: vectorized JAX genotype model vs the scalar float64 oracle.

The oracle (bs_call_tpu.ops.oracle) transcribes genotype_model.c:44-246
directly using libm (math.log/exp) like the C binary; the JAX kernel uses
XLA's transcendentals, which differ in the last ulp. Positions whose top-2
log-likelihood margin is below a tolerance are therefore excluded here and
handled by the runtime rescue path, which recomputes them with the oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bs_call_tpu.ops import oracle
from bs_call_tpu.ops.genotype import ModelParams, call_genotypes

PARAMS = ModelParams(under_conv=0.01, over_conv=0.05, ref_bias=2.0)


def random_cases(rng, n, max_count=40):
    counts = rng.integers(0, max_count, size=(n, 8)).astype(np.int32)
    # make some categories zero to hit the n==0 guard paths
    mask = rng.random((n, 8)) < 0.45
    counts[mask] = 0
    quals = np.where(
        counts > 0, rng.integers(1, 44, size=(n, 8)), 0
    ).astype(np.int32)
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    return counts, quals, ref


def oracle_batch(counts, quals, ref):
    probs = np.zeros((len(ref), 10))
    gts = np.zeros(len(ref), dtype=np.int32)
    for i in range(len(ref)):
        probs[i], gts[i] = oracle.calc_gt_prob(
            counts[i], quals[i], int(ref[i]), 0.01, 0.05, 2.0
        )
    return probs, gts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_oracle_f64(seed):
    rng = np.random.default_rng(seed)
    counts, quals, ref = random_cases(rng, 500)
    gt_prob, max_gt, margin, _ = call_genotypes(
        counts, quals, ref, PARAMS, dtype=jnp.float64
    )
    gt_prob, max_gt, margin = map(np.asarray, (gt_prob, max_gt, margin))
    want_prob, want_gt = oracle_batch(counts, quals, ref)
    clear = margin > 1e-9  # rescue path handles the rest at runtime
    assert clear.mean() > 0.95
    np.testing.assert_array_equal(max_gt[clear], want_gt[clear])
    np.testing.assert_allclose(
        gt_prob[clear], want_prob[clear], rtol=1e-10, atol=1e-10
    )


def test_matches_oracle_f32_tolerance():
    rng = np.random.default_rng(42)
    counts, quals, ref = random_cases(rng, 2000)
    gt_prob, max_gt, margin, _ = call_genotypes(
        counts, quals, ref, PARAMS, dtype=jnp.float32
    )
    gt_prob, max_gt, margin = map(np.asarray, (gt_prob, max_gt, margin))
    want_prob, want_gt = oracle_batch(counts, quals, ref)
    # float32: absolute ll error scales with magnitude; rescue threshold
    clear = margin > 1e-2 * np.maximum(1.0, np.abs(gt_prob).max(axis=1))
    assert clear.mean() > 0.9
    np.testing.assert_array_equal(max_gt[clear], want_gt[clear])
    np.testing.assert_allclose(
        gt_prob[clear], want_prob[clear], rtol=5e-3, atol=5e-3
    )


def test_empty_position():
    counts = np.zeros((1, 8), dtype=np.int32)
    quals = np.zeros((1, 8), dtype=np.int32)
    ref = np.array([2], dtype=np.int32)
    gt_prob, max_gt, _, _ = call_genotypes(counts, quals, ref, PARAMS, dtype=jnp.float64)
    want_prob, want_gt = oracle.calc_gt_prob(counts[0], quals[0], 2, 0.01, 0.05, 2.0)
    assert int(max_gt[0]) == want_gt == 4  # CC favored by ref prior
    np.testing.assert_allclose(np.asarray(gt_prob)[0], want_prob, rtol=1e-12)


def test_high_depth_homozygote():
    counts = np.array([[0, 100, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
    quals = np.array([[0, 40, 0, 0, 0, 0, 0, 0]], dtype=np.int32)
    ref = np.array([2], dtype=np.int32)
    _, max_gt, _, _ = call_genotypes(counts, quals, ref, PARAMS, dtype=jnp.float64)
    assert int(max_gt[0]) == 4  # CC


def test_informative_counts_drive_meth_genotypes():
    # C-informative + T-informative mixture on ref C: CC vs CT decision uses Z
    counts = np.array([[0, 0, 0, 0, 0, 10, 0, 3]], dtype=np.int32)
    quals = np.array([[0, 0, 0, 0, 0, 35, 0, 35]], dtype=np.int32)
    ref = np.array([2], dtype=np.int32)
    gt_prob, max_gt, _, _ = call_genotypes(counts, quals, ref, PARAMS, dtype=jnp.float64)
    want_prob, want_gt = oracle.calc_gt_prob(counts[0], quals[0], 2, 0.01, 0.05, 2.0)
    assert int(max_gt[0]) == want_gt
    np.testing.assert_allclose(np.asarray(gt_prob)[0], want_prob, rtol=1e-10)


def test_z_clamping_edges():
    # extreme imbalance drives sinm outside [-1, 1] (genotype_model.c:29-40)
    for c5, c7 in [(50, 0), (0, 50), (50, 1), (1, 50)]:
        counts = np.zeros((1, 8), dtype=np.int32)
        counts[0, 5] = c5
        counts[0, 7] = c7
        quals = np.where(counts > 0, 30, 0).astype(np.int32)
        ref = np.array([2], dtype=np.int32)
        gt_prob, max_gt, margin, _ = call_genotypes(
            counts, quals, ref, PARAMS, dtype=jnp.float64
        )
        want_prob, want_gt = oracle.calc_gt_prob(
            counts[0], quals[0], 2, 0.01, 0.05, 2.0
        )
        if float(margin[0]) > 1e-9:
            assert int(max_gt[0]) == want_gt
            np.testing.assert_allclose(
                np.asarray(gt_prob)[0], want_prob, rtol=1e-10, atol=1e-10
            )
