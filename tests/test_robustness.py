"""Degenerate-input robustness: the caller must produce a valid (header
-only) VCF, not crash, on empty inputs, unmapped-only reads, header
contigs missing sequence data, reads running past the contig end,
fully-soft-clipped reads, and all-filtered coverage."""

import io
import os

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller
from bs_call_tpu.stats.collect import BsStats

CTG_LEN = 2000


@pytest.fixture()
def refseq(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), CTG_LEN))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, CTG_LEN, 60))
        + "\n"
    )
    return str(ref), seq


HDR = BamHeader(
    text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{CTG_LEN}\n",
    ref_names=["chr1"],
    ref_lens=[CTG_LEN],
)


def _run(bam, ref):
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        report_file="x",
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out, stats=BsStats())
    data = out.getvalue()
    assert data.startswith(b"##fileformat=VCF")
    return data


def _write(tmp_path, recs):
    bam = tmp_path / "in.bam"
    w = BamWriter(str(bam), HDR)
    for r in recs:
        w.write(*r)
    w.close()
    return str(bam)


def test_empty_bam(tmp_path, refseq):
    ref, _ = refseq
    _run(_write(tmp_path, []), ref)


def test_unmapped_only(tmp_path, refseq):
    ref, _ = refseq
    q = np.full(50, 30, np.uint8)
    recs = [
        (f"u{k}", 4, -1, -1, 0, [], -1, -1, 0, "A" * 50, q)
        for k in range(10)
    ]
    _run(_write(tmp_path, recs), ref)


def test_read_past_contig_end(tmp_path, refseq):
    ref, seq = refseq
    q = np.full(80, 30, np.uint8)
    bam = _write(
        tmp_path,
        [("e", 0, 0, CTG_LEN - 10, 60, [(80, 0)], -1, -1, 0, "A" * 80, q)],
    )
    data = _run(bam, ref)
    # emitted positions never exceed the contig length
    for line in data.decode().splitlines():
        if line.startswith("#"):
            continue
        assert int(line.split("\t")[1]) <= CTG_LEN


def test_fully_soft_clipped_read(tmp_path, refseq):
    ref, seq = refseq
    q = np.full(40, 30, np.uint8)
    recs = [
        ("s", 0, 0, 500, 60, [(40, 4)], -1, -1, 0, "A" * 40, q),
        ("t", 0, 0, 600, 60, [(20, 0)], -1, -1, 0, seq[600:620], q[:20]),
    ]
    _run(_write(tmp_path, recs), ref)


def test_all_reads_filtered_by_mapq(tmp_path, refseq):
    ref, seq = refseq
    q = np.full(40, 30, np.uint8)
    bam = _write(
        tmp_path,
        [("z", 0, 0, 300, 0, [(40, 0)], -1, -1, 0, seq[300:340], q)],
    )
    data = _run(bam, ref)
    assert all(
        line.startswith("#") for line in data.decode().splitlines()
    )


def test_header_contig_missing_from_reference(tmp_path, refseq):
    ref, seq = refseq
    hdr2 = BamHeader(
        text=(
            f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{CTG_LEN}\n"
            "@SQ\tSN:chrX\tLN:5000\n"
        ),
        ref_names=["chr1", "chrX"],
        ref_lens=[CTG_LEN, 5000],
    )
    bam = tmp_path / "in.bam"
    w = BamWriter(str(bam), hdr2)
    q = np.full(50, 30, np.uint8)
    w.write("a", 0, 0, 100, 60, [(50, 0)], -1, -1, 0, seq[100:150], q)
    w.write("b", 0, 1, 100, 60, [(50, 0)], -1, -1, 0, "A" * 50, q)
    w.close()
    data = _run(str(bam), ref)
    for line in data.decode().splitlines():
        if not line.startswith("#"):
            assert line.split("\t")[0] == "chr1"
