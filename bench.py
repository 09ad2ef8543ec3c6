"""Benchmark: genotype-calling throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) and cannot be built here
(no htslib), so the baseline denominator is the single-threaded float64
scalar implementation of the same math (ops/oracle.py, a direct
transcription of the C inner loop genotype_model.c:44-246) measured on this
host — a faithful stand-in for the C binary's per-position calc cost.
"""

import json
import time

import numpy as np


def make_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 30, size=(n, 8)).astype(np.int32)
    counts[rng.random((n, 8)) < 0.5] = 0
    quals = np.where(counts > 0, rng.integers(20, 44, size=(n, 8)), 0).astype(
        np.int32
    )
    ref = rng.integers(0, 5, size=n).astype(np.int32)
    return counts, quals, ref


def bench_device(n=1 << 20, iters=20):
    import jax
    import jax.numpy as jnp

    from bs_call_tpu.ops.genotype import ModelParams, call_genotypes

    params = ModelParams()
    counts, quals, ref = make_batch(n)
    counts = jnp.asarray(counts)
    quals = jnp.asarray(quals)
    ref = jnp.asarray(ref)
    # warmup / compile
    out = call_genotypes(counts, quals, ref, params, dtype=jnp.float32)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call_genotypes(counts, quals, ref, params, dtype=jnp.float32)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n * iters / dt


def bench_oracle(n=2000):
    from bs_call_tpu.ops import oracle

    counts, quals, ref = make_batch(n, seed=1)
    t0 = time.perf_counter()
    for i in range(n):
        oracle.calc_gt_prob(counts[i], quals[i], int(ref[i]), 0.01, 0.05, 2.0)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    pos_per_sec = bench_device()
    baseline = bench_oracle()
    print(
        json.dumps(
            {
                "metric": "genotype_call_positions_per_sec_per_chip",
                "value": round(pos_per_sec),
                "unit": "positions/s",
                "vs_baseline": round(pos_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
