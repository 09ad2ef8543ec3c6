"""BAI index build + indexed region query tests."""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bai import IndexedBamReader, write_bai
from bs_call_tpu.io.bam import BamHeader, BamReader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller


def make_bam(tmp_path, n=2000, ctg_len=300000, seed=0):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list("ACGT"), 200))
    hdr = BamHeader(
        text=(
            "@HD\tVN:1.6\tSO:coordinate\n"
            f"@SQ\tSN:chr1\tLN:{ctg_len}\n@SQ\tSN:chr2\tLN:{ctg_len}\n"
        ),
        ref_names=["chr1", "chr2"],
        ref_lens=[ctg_len, ctg_len],
    )
    bam = tmp_path / "t.bam"
    w = BamWriter(str(bam), hdr)
    for tid in (0, 1):
        starts = np.sort(rng.integers(0, ctg_len - 200, n))
        for k, pos in enumerate(starts):
            rlen = int(rng.integers(50, 150))
            q = rng.integers(20, 44, rlen).astype(np.uint8)
            w.write(
                f"t{tid}r{k}", 0, tid, int(pos), 60, [(rlen, 0)], -1, -1,
                0, (seq * 2)[:rlen], q,
            )
    w.close()
    return str(bam)


def test_index_query_matches_linear_scan(tmp_path):
    bam = make_bam(tmp_path)
    write_bai(bam)
    idx = IndexedBamReader(bam)
    all_recs = list(BamReader(bam))
    for tid, beg, end in [
        (0, 0, 1000),
        (0, 150000, 160000),
        (1, 299000, 300000),
        (0, 50000, 50001),
        (1, 0, 300000),
    ]:
        want = [
            r.name
            for r in all_recs
            if r.tid == tid
            and r.pos < end
            and r.pos + sum(l for l, op in r.cigar if op == 0) > beg
        ]
        got = [r.name for r in idx.query(tid, beg, end)]
        assert got == want, (tid, beg, end, len(got), len(want))
    idx.close()


def test_indexed_region_run_matches_linear(tmp_path):
    bam = make_bam(tmp_path, n=500, ctg_len=50000)
    ctg_len = 50000
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n>chr2\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t10000\t20000\nchr2\t5000\t9000\n")
    outs = []
    for use_index in (False, True):
        if use_index:
            write_bai(bam)
        else:
            import os

            if os.path.exists(bam + ".bai"):
                os.unlink(bam + ".bai")
        cfg = CallerConfig(
            input_file=bam,
            reference_file=str(ref),
            benchmark_mode=True,
            contig_bed=str(bed),
        )
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]
