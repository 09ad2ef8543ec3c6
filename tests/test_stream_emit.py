"""Streamed (chunked) in-block emission must be byte-identical to
whole-block emission, including the JSON report.

The native driver splits big blocks into batch_positions-sized chunks so
engine batches overlap formatting (pipeline/runner.py); chunks overlap by
4 positions and non-final chunks withhold their last 2 rows
(output/vector_site.py emit_block hold_back). These tests pin the
invariant that chunking is invisible in every output byte."""

import io
import os

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller
from bs_call_tpu.stats.collect import BsStats
from bs_call_tpu.stats.report import write_report


def _fixture(tmp_path, n_reads=6000, ctg_len=40_000, seed=7):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, ctg_len, 60):
            f.write(seq[i : i + 60] + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    w = BamWriter(str(bam), hdr)
    bases = "ACGT"
    starts = np.sort(rng.integers(0, ctg_len - 160, n_reads))
    for n, p in enumerate(starts):
        p = int(p)
        rseq = list(seq[p : p + 150])
        for i in np.nonzero(rng.random(150) < 0.03)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(15, 44, 150).astype(np.uint8)
        # carve a low-coverage zone so some chunks straddle gaps
        if 15000 < p < 15800 and rng.random() < 0.9:
            continue
        w.write(
            f"r{n}", 0, 0, p, 50, [(150, 0)], -1, -1, 0,
            "".join(rseq), q,
        )
    w.close()
    return str(bam), str(ref)


@pytest.mark.parametrize("dbsnp", [False, True])
def test_chunked_equals_whole_block(tmp_path, dbsnp):
    bam, ref = _fixture(tmp_path)
    dbsnp_path = None
    if dbsnp:
        from bs_call_tpu.io.dbsnp_idx import DbSnpIndexBuilder

        b = DbSnpIndexBuilder(maf_limit=0.1)
        rng = np.random.default_rng(1)
        for p in np.sort(rng.integers(1, 40_000, 500)):
            b.add_snp("chr1", int(p), f"rs{int(p)}", maf=0.3)
        dbsnp_path = str(tmp_path / "snp.idx")
        b.write(dbsnp_path)
    outs, reps = [], []
    for bp in (1 << 20, 2048, 1024):
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            report_file="x", dbsnp_file=dbsnp_path,
        )
        cfg.batch_positions = bp
        o = io.BytesIO()
        st = BsStats()
        st, table = run_caller(cfg, out_fileobj=o, stats=st)
        outs.append(o.getvalue())
        r = io.StringIO()
        write_report(r, cfg, st, table)
        reps.append(r.getvalue())
    assert outs[0] == outs[1] == outs[2]
    assert reps[0] == reps[1] == reps[2]
    assert outs[0].count(b"\n") > 1000
