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
