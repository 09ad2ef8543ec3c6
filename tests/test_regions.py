"""-C contig-bed / -s contig-sizes region semantics."""

import io

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller

SEQ1 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
SEQ2 = "CGCGCGCGCGCGCGCGCGCGCGCGCGCGCGCGCGCGCGCG"


def make_fixture(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ1 + "\n>chr2\n" + SEQ2 + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text=(
            "@HD\tVN:1.6\tSO:coordinate\n"
            "@SQ\tSN:chr1\tLN:40\n@SQ\tSN:chr2\tLN:40\n"
        ),
        ref_names=["chr1", "chr2"],
        ref_lens=[40, 40],
    )
    w = BamWriter(str(bam), hdr)
    n = 0
    for tid, seq in ((0, SEQ1), (1, SEQ2)):
        for pos in range(0, 28):
            w.write(
                f"r{n}", 0, tid, pos, 60, [(12, 0)], -1, -1, 0,
                seq[pos : pos + 12], np.full(12, 40, np.uint8),
            )
            n += 1
    w.close()
    return tmp_path, str(ref), str(bam)


def run(cfg):
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    sites = []
    header = []
    for line in out.getvalue().decode().splitlines():
        if line.startswith("#"):
            header.append(line)
        else:
            f = line.split("\t")
            sites.append((f[0], int(f[1])))
    return header, sites


def test_multi_contig_no_regions(tmp_path):
    tmp, ref, bam = make_fixture(tmp_path)
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True
    )
    header, sites = run(cfg)
    chroms = {c for c, _ in sites}
    assert chroms == {"chr1", "chr2"}
    assert sum(1 for l in header if l.startswith("##contig=")) == 2


def test_contig_bed_restricts_sites(tmp_path):
    tmp, ref, bam = make_fixture(tmp_path)
    bed = tmp / "regions.bed"
    # 0-based bed: chr1 only, positions 10..20 (1-based 11..20)
    bed.write_text("chr1\t10\t20\n")
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        benchmark_mode=True,
        contig_bed=str(bed),
    )
    header, sites = run(cfg)
    assert sites, "no sites in region"
    for chrom, pos in sites:
        assert chrom == "chr1"
        assert 11 <= pos <= 20
    # only requested contig in header (case b, process_sam_header.c:60-63)
    assert sum(1 for l in header if l.startswith("##contig=")) == 1


def test_contig_sizes_keeps_uniform_header(tmp_path):
    tmp, ref, bam = make_fixture(tmp_path)
    bed = tmp / "regions.bed"
    bed.write_text("chr1\t0\t40\n")
    sizes = tmp / "sizes.txt"
    sizes.write_text("chr1\t40\nchr2\t40\n")
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        benchmark_mode=True,
        contig_bed=str(bed),
        contig_sizes=str(sizes),
    )
    header, sites = run(cfg)
    # both contigs in header (concat-compatible), only chr1 processed
    assert sum(1 for l in header if l.startswith("##contig=")) == 2
    assert {c for c, _ in sites} == {"chr1"}


def test_two_regions_same_contig(tmp_path):
    tmp, ref, bam = make_fixture(tmp_path)
    bed = tmp / "regions.bed"
    bed.write_text("chr1\t4\t10\nchr1\t20\t26\n")
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        benchmark_mode=True,
        contig_bed=str(bed),
    )
    _, sites = run(cfg)
    pos = sorted(p for _, p in sites)
    assert all(5 <= p <= 10 or 21 <= p <= 26 for p in pos), pos
    assert any(p <= 10 for p in pos) and any(p > 20 for p in pos)
