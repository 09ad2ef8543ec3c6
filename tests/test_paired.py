"""Paired-end correctness: overlap resolution, -L/-R trims, indel
normalization, duplicate selection — template-level unit tests plus an
end-to-end paired run."""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.constants import FLT_QUAL, FORWARD, REVERSE
from bs_call_tpu.io.bam import (
    BamHeader,
    BamWriter,
    FPAIRED,
    FPROPER_PAIR,
    FREVERSE,
    FMREVERSE,
    FREAD1,
    FREAD2,
    FDUP,
)
from bs_call_tpu.pipeline.alignments import AlignDetails, Misms, MismsType
from bs_call_tpu.pipeline.runner import run_caller
from bs_call_tpu.pipeline.template import (
    handle_overlap,
    normalize_indels,
    process_template,
    trim_read,
    trim_soft_clips,
)


def packed(bases, quals):
    """bases: string of ACGT; quals: ints."""
    b2c = {"A": 0, "C": 1, "G": 2, "T": 3}
    return np.array(
        [b2c[b] | (q << 2) for b, q in zip(bases, quals)], dtype=np.uint8
    )


def test_trim_read_masks_quality():
    rd = packed("ACGTACGT", [30] * 8)
    trim_read(rd, 2, 1)
    q = rd >> 2
    assert list(q) == [63, 63, 30, 30, 30, 30, 30, 63]
    assert list(rd & 3) == [0, 1, 2, 3, 0, 1, 2, 3]  # bases intact


def test_soft_clip_left_and_right():
    al = AlignDetails()
    al.read[0] = packed("AAACGTACGTTT", [30] * 12)
    al.mismatches[0] = [
        Misms(MismsType.SOFT, 0, 3),
        Misms(MismsType.DEL, 5, 1),
        Misms(MismsType.SOFT, 10, 2),
    ]
    tl, tr = trim_soft_clips(al)
    assert tl == [3, 0] and tr == [2, 0]
    assert len(al.read[0]) == 7
    assert len(al.mismatches[0]) == 1
    assert al.mismatches[0][0].position == 2  # shifted by left clip


def test_overlap_equal_span_quality_tiebreak():
    # R1 fwd at 11..20, R2 rev at 16..25 (1-based), R2 lower quality
    al = AlignDetails()
    al.forward_position = 11
    al.reverse_position = 16
    al.reference_span = [10, 10]
    al.orientation = FORWARD
    al.read[0] = packed("ACGTACGTAC", [40] * 10)
    al.read[1] = packed("CGTACGTACG", [30] * 10)
    tl, tr = handle_overlap(al)
    # overlap = 5; R2 (lower qual) left-trimmed, its start moves to 21
    assert al.reverse_position == 21
    assert len(al.read[0]) == 10
    assert len(al.read[1]) == 5
    assert tl == [0, 5] and tr == [0, 0]


def test_overlap_span_decides_before_quality():
    al = AlignDetails()
    al.forward_position = 11
    al.reverse_position = 16
    al.reference_span = [12, 10]  # R1 longer span -> trim R2
    al.orientation = FORWARD
    al.read[0] = packed("ACGTACGTACGT", [10] * 12)  # despite lower qual
    al.read[1] = packed("CGTACGTACG", [40] * 10)
    handle_overlap(al)
    assert len(al.read[0]) == 12
    assert len(al.read[1]) < 10


def test_normalize_indels_deletion_pads_n():
    # CIGAR 4M2D4M -> one INS event (ref deletion) at read pos 4
    al = AlignDetails()
    al.read[0] = packed("ACGTACGT", [30] * 8)
    al.mismatches[0] = [Misms(MismsType.INS, 4, 2)]
    orig, max_pos = normalize_indels(al, [0, 0], [0, 0])
    assert len(al.read[0]) == 10
    q = al.read[0] >> 2
    assert list(q[4:6]) == [0, 0]  # padded N, quality 0
    assert list(orig[0][:6]) == [0, 1, 2, 3, -1, -1]
    assert max_pos == 8


def test_normalize_indels_insertion_removed():
    # CIGAR 4M2I4M stored as DEL at read pos 4
    al = AlignDetails()
    al.read[0] = packed("ACGTTTACGT", [30] * 10)
    al.mismatches[0] = [Misms(MismsType.DEL, 4, 2)]
    orig, max_pos = normalize_indels(al, [0, 0], [0, 0])
    assert len(al.read[0]) == 8
    assert list(orig[0]) == [0, 1, 2, 3, 6, 7, 8, 9]


def test_left_right_trim_orientation_swap():
    # orientation REVERSE: read[0] is R2, so -L for read 1 applies to read[1]
    al = AlignDetails()
    al.orientation = REVERSE
    al.read[0] = packed("ACGTACGT", [30] * 8)
    al.read[1] = packed("ACGTACGT", [30] * 8)
    al.forward_position = 1
    al.reverse_position = 100  # no overlap
    al.reference_span = [8, 8]
    process_template(al, left_trim=(2, 0), right_trim=(0, 0))
    # read1 trim goes to segment 1 (0 ^ msk with msk=1)
    assert (al.read[1][:2] >> 2).tolist() == [63, 63]
    assert (al.read[0][:2] >> 2).tolist() == [30, 30]


# ---- end-to-end paired run ----

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


def write_pair(w, name, pos1, pos2, rlen, q1=40, q2=40, dup=False):
    """Proper pair: R1 forward at pos1, R2 reverse at pos2 (0-based)."""
    f1 = FPAIRED | FPROPER_PAIR | FMREVERSE | FREAD1
    f2 = FPAIRED | FPROPER_PAIR | FREVERSE | FREAD2
    if dup:
        f1 |= FDUP
        f2 |= FDUP
    isize = pos2 + rlen - pos1
    w.write(
        name, f1, 0, pos1, 57, [(rlen, 0)], 0, pos2, isize,
        SEQ[pos1 : pos1 + rlen], np.full(rlen, q1, np.uint8),
    )
    return (
        name, f2, 0, pos2, 57, [(rlen, 0)], 0, pos1, -isize,
        SEQ[pos2 : pos2 + rlen], np.full(rlen, q2, np.uint8),
    )


def run_vcf(tmp_path, writer_fn, **cfg_kw):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    writer_fn(w)
    w.close()
    cfg = CallerConfig(
        input_file=str(bam),
        reference_file=str(ref),
        benchmark_mode=True,
        all_positions=True,
        **cfg_kw,
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    sites = {}
    for line in out.getvalue().decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        fmt = dict(zip(f[8].split(":"), f[9].split(":")))
        sites[int(f[1])] = {"ref": f[3], **fmt}
    return sites


def test_paired_overlap_single_counting(tmp_path):
    # R1 at 0-based 4 (1-based 5..14), R2 at 0-based 10 (11..20), overlap 4
    def build(w):
        recs = []
        recs.append(write_pair(w, "p1", 4, 10, 10, q1=40, q2=30))
        # mates must come in coordinate order
        for r in sorted(recs, key=lambda r: r[3]):
            w.write(*r)

    sites = run_vcf(tmp_path, build)
    # overlap positions 11..14 counted once (from R1, higher qual)
    for pos in range(11, 15):
        assert int(sites[pos]["DP"]) == 1
        assert sites[pos]["AMQ"] == "40"
    # R2-only positions 15..20 counted from R2
    for pos in range(15, 21):
        assert int(sites[pos]["DP"]) == 1
        assert sites[pos]["AMQ"] == "30"
    # R1-only prefix
    for pos in range(5, 11):
        assert int(sites[pos]["DP"]) == 1
        assert sites[pos]["AMQ"] == "40"


def test_duplicate_pair_keeps_higher_mapq(tmp_path):
    def build(w):
        r2a = write_pair(w, "a", 4, 10, 10, q1=20, q2=20)
        # second pair, same positions + strand -> duplicate; higher qual
        r2b = write_pair(w, "b", 4, 10, 10, q1=40, q2=40)
        w.write(*r2a)
        w.write(*r2b)

    sites = run_vcf(tmp_path, build)
    # only one pair survives; the better-quality one (b)
    assert int(sites[6]["DP"]) == 1
    assert sites[6]["AMQ"] == "40"


def test_flagged_duplicates_filtered(tmp_path):
    def build(w):
        r2 = write_pair(w, "a", 4, 10, 10)
        w.write(*r2)
        r2d = write_pair(w, "d", 14, 20, 10, dup=True)
        w.write(*r2d)

    sites = run_vcf(tmp_path, build)
    assert 6 in sites
    # dup pair covered 15..30 exclusively; those positions have no coverage
    assert 28 not in sites


def test_deletion_creates_coverage_gap(tmp_path):
    # CIGAR 4M2D4M at 0-based 4: covers ref 5..8 and 11..14 (1-based)
    def build(w):
        seq = SEQ[4:8] + SEQ[10:14]
        w.write(
            "s1", 0, 0, 4, 60, [(4, 0), (2, 2), (4, 0)], -1, -1, 0,
            seq, np.full(8, 40, np.uint8),
        )

    sites = run_vcf(tmp_path, build)
    for pos in (5, 6, 7, 8, 11, 12, 13, 14):
        assert int(sites[pos]["DP"]) == 1, pos
    for pos in (9, 10):
        assert pos not in sites or int(sites[pos].get("DP", 0)) == 0


def test_insertion_consumes_read_not_ref(tmp_path):
    # CIGAR 4M2I4M at 0-based 4: covers ref 5..12 (1-based), 10 read bases
    def build(w):
        seq = SEQ[4:8] + "TT" + SEQ[8:12]
        w.write(
            "s1", 0, 0, 4, 60, [(4, 0), (2, 1), (4, 0)], -1, -1, 0,
            seq, np.full(10, 40, np.uint8),
        )

    sites = run_vcf(tmp_path, build)
    for pos in range(5, 13):
        assert int(sites[pos]["DP"]) == 1, pos
    assert 13 not in sites or int(sites[13].get("DP", 0)) == 0


def test_duplicate_tiebreak_mapq_before_qual(tmp_path):
    """Duplicate selection compares mean MAPQ first and base quality only
    on ties (get_template_vector.c:292-311): the higher-MAPQ pair wins
    even with lower base quality."""
    def build(w):
        f1 = FPAIRED | FPROPER_PAIR | FMREVERSE | FREAD1
        f2 = FPAIRED | FPROPER_PAIR | FREVERSE | FREAD2
        rlen, pos1, pos2 = 12, 4, 10
        isize = pos2 + rlen - pos1
        for name, mapq, q in (("a", 30, 42), ("b", 50, 20)):
            w.write(
                name, f1, 0, pos1, mapq, [(rlen, 0)], 0, pos2, isize,
                SEQ[pos1 : pos1 + rlen], np.full(rlen, q, np.uint8),
            )
        for name, mapq, q in (("a", 30, 42), ("b", 50, 20)):
            w.write(
                name, f2, 0, pos2, mapq, [(rlen, 0)], 0, pos1, -isize,
                SEQ[pos2 : pos2 + rlen], np.full(rlen, q, np.uint8),
            )

    sites = run_vcf(tmp_path, build)
    # higher-MAPQ pair "b" survives despite lower base quality
    assert int(sites[6]["DP"]) == 1
    assert sites[6]["AMQ"] == "20"
    assert sites[6]["MQ"] == "50"
