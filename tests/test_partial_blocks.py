"""Settled-prefix partial staging parity: with partial staging enabled the
native builder hands over overlapping sub-ranges of open blocks; every
range's pileup columns must be bit-identical to the full-block run, the
meth profile and stats must match exactly, and the end-to-end VCF must be
byte-identical (VERDICT r1 item 4i)."""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.native import load
from bs_call_tpu.native.pipeline import NativePipeline

from test_native_pipeline import random_bam

pytestmark = pytest.mark.skipif(
    load() is None, reason="native toolchain unavailable"
)


def _tid_keep():
    return np.ones(1, dtype=np.int8)


def collect(ref, bam, cfg, partial_limit=0, with_meth=True):
    """Run the native pipeline, returning (ranges, pileups, meth, stats)."""
    from bs_call_tpu.io.fasta import FastaIndex, sequence_window

    npipe = NativePipeline(
        bam, cfg, _tid_keep(), collect_stats=True, threads=2
    )
    if partial_limit:
        npipe.set_partial(partial_limit)
    fasta = FastaIndex(ref)
    pseq = fasta.load_contig("chr1")
    mprof = np.zeros((256, 4), dtype=np.int64)
    out = []
    while True:
        b = npipe.next_block()
        if b is None:
            break
        if with_meth:
            mx = b.get("meth_x", b["x"])
            rw = sequence_window(pseq, mx, b["y"] - mx + 3)
            npipe.block_meth_profile(rw, mprof)
        out.append(b)
    stats = npipe.get_stats()
    npipe.close()
    return out, mprof, stats


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("limit", [400, 900])
def test_partial_ranges_match_full_blocks(tmp_path, seed, limit):
    ref, bam = random_bam(tmp_path, n_pairs=400, seed=seed)
    cfg = CallerConfig(left_trim=(2, 1), right_trim=(1, 0))
    full, mprof_full, stats_full = collect(ref, bam, cfg)
    part, mprof_part, stats_part = collect(
        ref, bam, cfg, partial_limit=limit
    )
    assert len(part) > len(full), "partial staging never triggered"
    assert any(b["partial"] for b in part)

    # index the full-run pileup by absolute position
    cols = {}
    for b in full:
        for i in range(b["y"] - b["x"] + 1):
            cols[b["x"] + i] = (
                b["counts2"][i], b["qual_sum"][i], b["mapq2_sum"][i]
            )
    covered_full = set(cols)
    covered_part = set()
    for b in part:
        for i in range(b["y"] - b["x"] + 1):
            p = b["x"] + i
            covered_part.add(p)
            c2, qs, m2 = cols[p]
            np.testing.assert_array_equal(b["counts2"][i], c2, err_msg=str(p))
            np.testing.assert_array_equal(b["qual_sum"][i], qs)
            assert b["mapq2_sum"][i] == m2
            # aggregates must match too
            fb = next(
                fb for fb in full if fb["x"] <= p <= fb["y"]
            )
            j = p - fb["x"]
            for key in ("counts", "quals", "mq", "aq", "n"):
                np.testing.assert_array_equal(
                    b["agg"][key][i], fb["agg"][key][j]
                )
    assert covered_part == covered_full

    # meth profile and filter stats are exact sums
    np.testing.assert_array_equal(mprof_part, mprof_full)
    for a, b2 in zip(stats_part, stats_full):
        np.testing.assert_array_equal(a, b2)

    # template accounting: each align processed exactly once
    assert sum(b["n_templates"] for b in part) == sum(
        b["n_templates"] for b in full
    )


@pytest.mark.parametrize("seed", [0, 5])
def test_partial_end_to_end_byte_identical(tmp_path, seed):
    """Dense gap-free fixture through run_caller: tiny batch_positions
    force partial staging; output must equal the partial-disabled run."""
    from bs_call_tpu.pipeline.runner import run_caller
    from bs_call_tpu.stats.collect import BsStats
    from bs_call_tpu.stats.report import write_report

    ref, bam = random_bam(tmp_path, n_pairs=500, seed=seed)

    def run(batch, partial_env):
        cfg = CallerConfig(
            input_file=bam,
            reference_file=ref,
            benchmark_mode=True,
            sample_name="t",
            batch_positions=batch,
            left_trim=(1, 0),
            right_trim=(0, 1),
        )
        out = io.BytesIO()
        stats = BsStats()
        import bs_call_tpu.pipeline.runner as runner_mod

        if not partial_env:
            # disable by stubbing set_partial
            orig = NativePipeline.set_partial
            NativePipeline.set_partial = lambda self, lim: None
            try:
                stats, table = run_caller(cfg, out_fileobj=out, stats=stats)
            finally:
                NativePipeline.set_partial = orig
        else:
            stats, table = run_caller(cfg, out_fileobj=out, stats=stats)
        rep = io.StringIO()
        write_report(rep, cfg, stats, table)
        return out.getvalue(), rep.getvalue()

    vcf_on, rep_on = run(512, True)
    vcf_off, rep_off = run(512, False)
    assert vcf_on == vcf_off
    strip = lambda r: "\n".join(  # noqa: E731
        l for l in r.splitlines() if '"date"' not in l
    )
    assert strip(rep_on) == strip(rep_off)
