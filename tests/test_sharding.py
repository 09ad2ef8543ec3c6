"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bs_call_tpu.ops.genotype import ModelParams, call_genotypes
from bs_call_tpu.parallel.sharding import (
    make_mesh,
    shard_positions,
    sharded_call_step,
)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(5)
    n = 128 * 8
    counts = rng.integers(0, 30, size=(n, 8)).astype(np.int32)
    counts[rng.random((n, 8)) < 0.5] = 0
    quals = np.where(
        counts > 0, rng.integers(20, 44, size=(n, 8)), 0
    ).astype(np.int32)
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    return counts, quals, ref


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(batch):
    counts, quals, ref = batch
    params = ModelParams()
    mesh = make_mesh(8)
    step = sharded_call_step(mesh, params)
    sc, sq, sr = shard_positions(mesh, counts, quals, ref)
    gt_prob, mx, cg, gt_hist, cov_hist = step(sc, sq, sr)
    want_prob, want_mx, _, _ = call_genotypes(
        counts, quals, ref, params, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(gt_prob), np.asarray(want_prob), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(want_mx))
    # psum stats equal the global histogram
    covered = counts.sum(axis=1) > 0
    want_hist = np.bincount(
        np.asarray(want_mx)[covered], minlength=10
    )
    np.testing.assert_array_equal(np.asarray(gt_hist), want_hist)


def test_halo_exchange_cg_detection(batch):
    # craft a CG pair straddling the shard boundary (positions 127/128)
    counts = np.zeros((128 * 8, 8), dtype=np.int32)
    quals = np.zeros((128 * 8, 8), dtype=np.int32)
    ref = np.zeros(128 * 8, dtype=np.int32)
    # CC call at 127 (last of shard 0), GG call at 128 (first of shard 1)
    counts[127, 1] = 20
    quals[127, 1] = 40
    ref[127] = 2
    counts[128, 2] = 20
    quals[128, 2] = 40
    ref[128] = 3
    mesh = make_mesh(8)
    step = sharded_call_step(mesh, ModelParams())
    sc, sq, sr = shard_positions(mesh, counts, quals, ref)
    _, _, cg, _, _ = step(sc, sq, sr)
    cg = np.asarray(cg)
    assert cg[127] and cg[128]
    assert cg.sum() == 2


def test_graft_entry_hooks():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert np.asarray(out[0]).shape == (len(args[2]), 10)
    ge.dryrun_multichip(8)


def test_full_step_emitter_grade_halo():
    """sharded_full_step must hand every slab its ±1 neighbour genotype
    AND hom-ref-skip bits across shard borders, and its gt_prob/margin/
    off must match the single-device engine contract bitwise."""
    from bs_call_tpu.parallel.sharding import sharded_full_step

    rng = np.random.default_rng(9)
    n = 128 * 8
    counts = rng.integers(0, 30, size=(n, 8)).astype(np.int32)
    counts[rng.random((n, 8)) < 0.5] = 0
    quals = np.where(
        counts > 0, rng.integers(20, 44, size=(n, 8)), 0
    ).astype(np.int32)
    ref = rng.integers(0, 5, size=n).astype(np.int32)

    params = ModelParams()
    mesh = make_mesh(8)
    step = sharded_full_step(mesh, params, dtype=jnp.float64)
    soa = {k: np.asarray(v) for k, v in step(
        *__import__("bs_call_tpu.parallel.sharding", fromlist=["x"])
        .shard_positions(mesh, counts, quals, ref)
    ).items()}

    want_prob, want_mx, want_margin, want_off = map(
        np.asarray,
        call_genotypes(counts, quals, ref, params, dtype=jnp.float64),
    )
    # single-device C-style absorption for comparison
    want_prob = want_prob.copy()
    want_prob[np.arange(n), want_mx] = -np.log1p(want_off) / np.log(10.0)
    np.testing.assert_array_equal(soa["max_gt"], want_mx)
    np.testing.assert_array_equal(soa["margin"], want_margin)
    np.testing.assert_array_equal(soa["off_sum"], want_off)
    np.testing.assert_allclose(soa["gt_prob"], want_prob, rtol=1e-12)

    covered = counts.sum(axis=1) > 0
    gt1 = np.where(covered, want_mx + 1, 0)
    skip = ((gt1 == 1) & (ref == 1)) | ((gt1 == 10) & (ref == 4))
    # global shifts == per-shard halo'd shifts, including shard borders
    np.testing.assert_array_equal(
        soa["prev_gt"], np.concatenate([[0], gt1[:-1]])
    )
    np.testing.assert_array_equal(
        soa["next_gt"], np.concatenate([gt1[1:], [0]])
    )
    np.testing.assert_array_equal(
        soa["prev_skip"], np.concatenate([[False], skip[:-1]])
    )
    np.testing.assert_array_equal(
        soa["next_skip"], np.concatenate([skip[1:], [False]])
    )
    # shard-border rows (multiples of 128) got their context via ppermute
    for b in range(1, 8):
        i = b * 128
        assert soa["prev_gt"][i] == gt1[i - 1]
        assert soa["next_gt"][i - 1] == gt1[i]
