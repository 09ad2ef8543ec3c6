"""Pallas genotype kernel parity vs the jnp implementation (interpret mode
on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from bs_call_tpu.ops.genotype import ModelParams, call_genotypes
from bs_call_tpu.ops.kernels.genotype_pallas import (
    TILE,
    call_genotypes_pallas,
)

PARAMS = ModelParams()


def test_pallas_matches_jnp():
    rng = np.random.default_rng(0)
    n = TILE * 4
    counts = rng.integers(0, 30, size=(n, 8)).astype(np.int32)
    counts[rng.random((n, 8)) < 0.5] = 0
    quals = np.where(counts > 0, rng.integers(20, 44, size=(n, 8)), 0).astype(
        np.int32
    )
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    gp_p, mx_p, mg_p, off_p = call_genotypes_pallas(
        counts, quals, ref, PARAMS, interpret=True
    )
    gp_j, mx_j, mg_j, off_j = call_genotypes(
        counts, quals, ref, PARAMS, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(mx_p), np.asarray(mx_j))
    np.testing.assert_allclose(
        np.asarray(gp_p), np.asarray(gp_j), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(off_p), np.asarray(off_j), rtol=1e-4, atol=1e-30
    )
