"""I/O layer tests: BGZF, BAM round-trip, SAM text, FASTA/fai."""

import gzip

import numpy as np
import pytest

from bs_call_tpu.io.bam import (
    BamHeader,
    BamReader,
    BamWriter,
    FPAIRED,
    FREVERSE,
    aux_tag,
    decode_bs_strand,
)
from bs_call_tpu.io.bgzf import BgzfWriter, bgzf_compress, is_bgzf
from bs_call_tpu.io.fasta import FastaIndex, sequence_window
from bs_call_tpu.io.sam import SamReader, open_alignment_file
from bs_call_tpu.constants import NON_CONVERTED, STRAND_C2T, STRAND_G2A


def test_bgzf_roundtrip(tmp_path):
    p = tmp_path / "x.gz"
    payload = b"hello world " * 10000
    with open(p, "wb") as f, BgzfWriter(f) as w:
        w.write(payload)
    assert is_bgzf(str(p))
    with gzip.open(p, "rb") as f:
        assert f.read() == payload


def test_bam_roundtrip(tmp_path):
    p = tmp_path / "t.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000\n",
        ref_names=["chr1"],
        ref_lens=[1000],
    )
    w = BamWriter(str(p), hdr)
    qual = np.array([30, 31, 32, 33, 34], dtype=np.uint8)
    w.write(
        "read1",
        FPAIRED,
        0,
        99,
        42,
        [(5, 0)],
        0,
        199,
        105,
        "ACGTN",
        qual,
        aux_tag("XB", "A", "C"),
    )
    w.close()
    r = BamReader(str(p))
    assert r.header.ref_names == ["chr1"]
    recs = list(r)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.name == "read1"
    assert rec.pos == 99 and rec.mapq == 42
    np.testing.assert_array_equal(rec.seq_code, [1, 2, 3, 4, 0])
    np.testing.assert_array_equal(rec.qual, qual)
    assert decode_bs_strand(rec.aux) == STRAND_C2T
    # packed encoding: (base-1)|(qual<<2), N -> 0
    packed = rec.packed_read()
    assert packed[0] == (0 | (30 << 2))
    assert packed[4] == 0


def test_bs_strand_tags():
    assert decode_bs_strand(aux_tag("XB", "A", "G")) == STRAND_G2A
    assert decode_bs_strand(aux_tag("XG", "Z", "CT")) == STRAND_C2T
    assert decode_bs_strand(aux_tag("ZB", "Z", "GA")) == STRAND_G2A
    assert decode_bs_strand(aux_tag("ZS", "Z", "+-")) == STRAND_C2T
    assert decode_bs_strand(aux_tag("YD", "Z", "r")) == STRAND_G2A
    assert decode_bs_strand(b"") == NON_CONVERTED
    # later tag wins (reference scans all tags)
    two = aux_tag("XB", "A", "C") + aux_tag("ZS", "Z", "-")
    assert decode_bs_strand(two) == STRAND_G2A
    # unrelated tags are skipped correctly
    mixed = aux_tag("NM", "i", 3) + aux_tag("MD", "Z", "50") + aux_tag("XG", "Z", "GA")
    assert decode_bs_strand(mixed) == STRAND_G2A


def test_sam_reader(tmp_path):
    p = tmp_path / "t.sam"
    p.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chr1\tLN:1000\n"
        "r1\t0\tchr1\t100\t40\t3M1I2M\t*\t0\t0\tACGTAC\tIIIIII\tXG:Z:CT\n"
    )
    r = SamReader(str(p))
    assert r.header.ref_names == ["chr1"]
    recs = list(r)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.pos == 99
    assert rec.cigar == [(3, 0), (1, 1), (2, 0)]
    np.testing.assert_array_equal(rec.qual, np.full(6, ord("I") - 33))
    assert decode_bs_strand(rec.aux) == STRAND_C2T
    assert isinstance(open_alignment_file(str(p)), SamReader)


def test_fasta_index_and_window(tmp_path):
    p = tmp_path / "ref.fa"
    seq1 = "NNNACGTACGTNNACGT"  # 17 bases, start_pos = 4
    seq2 = "ACGT" * 30
    p.write_text(
        ">chr1 description\n"
        + seq1[:10]
        + "\n"
        + seq1[10:]
        + "\n>chr2\n"
        + "\n".join(seq2[i : i + 40] for i in range(0, len(seq2), 40))
        + "\n"
    )
    idx = FastaIndex(str(p))
    assert idx.names() == ["chr1", "chr2"]
    assert idx.seq_len("chr1") == 17
    assert (tmp_path / "ref.fa.fai").exists()
    # reload via the generated fai
    idx2 = FastaIndex(str(p))
    ctg = idx2.load_contig("chr1")
    assert ctg.start_pos == 4
    assert ctg.end_pos == 17
    np.testing.assert_array_equal(
        ctg.codes, [0, 0, 0, 1, 2, 3, 4, 1, 2, 3, 4, 0, 0, 1, 2, 3, 4]
    )
    # window: 1-based [2, 8)
    w = sequence_window(ctg, 2, 6)
    np.testing.assert_array_equal(w, [0, 0, 1, 2, 3, 4])
    # reference quirk: final contig base reads as N
    w = sequence_window(ctg, 15, 5)
    np.testing.assert_array_equal(w, [2, 3, 0, 0, 0])


def test_fasta_gc_bins(tmp_path):
    p = tmp_path / "ref.fa"
    seq = "G" * 100 + "A" * 100 + "GCGC" * 25 + "A" * 50
    p.write_text(">c\n" + seq + "\n")
    idx = FastaIndex(str(p))
    ctg = idx.load_contig("c", calc_gc=True)
    np.testing.assert_array_equal(ctg.gc_bins, [100, 0, 100])


def test_bgzip_fasta(tmp_path):
    """bgzip-compressed reference: FastaIndex reads it through the .gzi
    block index (htslib's BGZF-backed faidx, read_reference.c:60-87) and
    a CLI-style run over it is byte-identical to the plain-text run."""
    import io as _io

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.bgzf import BgzfWriter
    from bs_call_tpu.pipeline.runner import run_caller

    rng = np.random.default_rng(7)
    seq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 150_000))
    seq2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 7_000))
    text = (
        ">chr1\n"
        + "\n".join(seq1[i : i + 60] for i in range(0, len(seq1), 60))
        + "\n>chr2\n"
        + "\n".join(seq2[i : i + 60] for i in range(0, len(seq2), 60))
        + "\n"
    )
    plain = tmp_path / "ref.fa"
    plain.write_text(text)
    gz = tmp_path / "refz.fa.gz"
    with open(gz, "wb") as f:
        w = BgzfWriter(f)
        w.write(text.encode())
        w.close()
    ia, ib = FastaIndex(str(plain)), FastaIndex(str(gz))
    assert (tmp_path / "refz.fa.gz.gzi").exists()
    for name in ("chr1", "chr2"):
        np.testing.assert_array_equal(
            ia.load_contig(name).codes, ib.load_contig(name).codes
        )
    # .gzi reload path (index already on disk)
    ic = FastaIndex(str(gz))
    np.testing.assert_array_equal(
        ia.load_contig("chr1").codes, ic.load_contig("chr1").codes
    )
    # plain gzip is not random-accessible: reject like htslib
    import gzip as _gzip

    pg = tmp_path / "plain.fa.gz"
    with _gzip.open(pg, "wb") as f:
        f.write(text.encode())
    with pytest.raises(ValueError, match="bgzip"):
        FastaIndex(str(pg))
    # CLI-equivalent byte identity on a real run
    from bs_call_tpu.io.bam import BamHeader, BamWriter

    hdr = BamHeader(
        text=(
            "@HD\tVN:1.6\tSO:coordinate\n"
            "@SQ\tSN:chr1\tLN:150000\n@SQ\tSN:chr2\tLN:7000\n"
        ),
        ref_names=["chr1", "chr2"],
        ref_lens=[150_000, 7_000],
    )
    bam = tmp_path / "in.bam"
    w = BamWriter(str(bam), hdr)
    quals = np.full(50, 40, dtype=np.uint8)
    for n, pos in enumerate(range(0, 3000, 7)):
        w.write(
            f"r{n}", 0, 0, pos, 60, [(50, 0)], -1, -1, 0,
            seq1[pos : pos + 50], quals,
        )
    w.close()
    outs = []
    for ref in (plain, gz):
        cfg = CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            sample_name="s", benchmark_mode=True, all_positions=False,
        )
        buf = _io.BytesIO()
        run_caller(cfg, out_fileobj=buf)
        outs.append(buf.getvalue())
    assert outs[0] == outs[1] and outs[0].count(b"\n") > 100
