"""Native indexed -C region iteration vs the Python paths.

The C++ pipeline replays the Python _indexed_region_records generator
(pipeline/runner.py) over BAI/CSI chunks — the reference's per-region
sam_itr_queryi loop (get_template_vector.c:69-101). These tests pin
byte-identity of VCF and report between the native path (device=auto)
and the Python indexed path (device=numpy), including the quirk corners:
records spanning two regions, records starting inside an earlier region,
pairs with one mate out of region, and the whole-contig shard pattern
where indexed mode replaces the full-file scan."""

import io
import os

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bai import write_bai
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.io.csi import write_csi
from bs_call_tpu.pipeline.runner import run_caller, _try_native
from bs_call_tpu.stats.collect import BsStats
from bs_call_tpu.stats.report import write_report


def make_fixture(tmp_path, seed=11):
    """Two contigs; paired reads, indels, duplicates, and a few long
    reads engineered to span region boundaries."""
    rng = np.random.default_rng(seed)
    lens = [4000, 3000]
    names = ["chr1", "chr2"]
    seqs = ["".join(rng.choice(list("ACGT"), ln)) for ln in lens]
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as f:
        for name, seq in zip(names, seqs):
            f.write(f">{name}\n{seq}\n")
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n"
        + "".join(f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(names, lens)),
        ref_names=names,
        ref_lens=lens,
    )
    bam = tmp_path / "in.bam"
    w = BamWriter(str(bam), hdr)
    rn = 0
    recs = []
    for tid, (seq, ln) in enumerate(zip(seqs, lens)):
        for pos in sorted(rng.integers(0, ln - 200, 500)):
            pos = int(pos)
            rlen = int(rng.integers(50, 100))
            flag = 0
            mpos, isize = -1, 0
            if rng.random() < 0.6:  # proper pair
                gap = int(rng.integers(-20, 80))
                mpos = pos + rlen + gap
                if mpos + rlen <= ln:
                    tlen = mpos + rlen - pos
                    recs.append(
                        (tid, pos, rlen, 0x63, mpos, tlen, f"p{rn}")
                    )
                    recs.append(
                        (tid, mpos, rlen, 0x93, pos, -tlen, f"p{rn}")
                    )
                    rn += 1
                    continue
            recs.append((tid, pos, rlen, flag, mpos, isize, f"s{rn}"))
            rn += 1
        # long reads spanning typical region boundaries
        for pos in (150, 850, 1100):
            recs.append((tid, pos, 180, 0, -1, 0, f"L{tid}_{pos}"))
    recs.sort(key=lambda r: (r[0], r[1]))
    for tid, pos, rlen, flag, mpos, isize, name in recs:
        seq = seqs[tid]
        rseq = list(seq[pos : pos + rlen])
        for i in np.nonzero(rng.random(len(rseq)) < 0.4)[0]:
            if rseq[i] == "C":
                rseq[i] = "T"
        q = rng.integers(20, 42, len(rseq)).astype(np.uint8)
        w.write(
            name, flag, tid, pos, 57, [(len(rseq), 0)], tid, mpos,
            isize, "".join(rseq), q,
        )
    w.close()
    return str(ref), str(bam), lens


def _run(bam, ref, bed, device):
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        contig_bed=bed, device=device,
    )
    out = io.BytesIO()
    stats = BsStats()
    _, table = run_caller(cfg, out_fileobj=out, stats=stats)
    rep = io.StringIO()
    write_report(rep, cfg, stats, table)
    return out.getvalue(), rep.getvalue()


BED = "chr1\t200\t900\nchr1\t1000\t1250\nchr1\t2000\t3100\nchr2\t100\t1200\n"


def test_partial_regions_native_matches_python_bai(tmp_path):
    ref, bam, _ = make_fixture(tmp_path)
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    vn, rn = _run(bam, ref, str(bed), "auto")
    vp, rp = _run(bam, ref, str(bed), "numpy")
    assert vn == vp
    assert rn == rp
    assert vn.count(b"\nchr1\t") > 0 and vn.count(b"\nchr2\t") > 0


def test_partial_regions_native_matches_python_csi(tmp_path):
    ref, bam, _ = make_fixture(tmp_path, seed=12)
    write_csi(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    vn, rn = _run(bam, ref, str(bed), "auto")
    vp, rp = _run(bam, ref, str(bed), "numpy")
    assert vn == vp
    assert rn == rp


def test_native_pipeline_engages_for_partial_regions(tmp_path):
    from bs_call_tpu.io.fasta import FastaIndex
    from bs_call_tpu.io.sam import open_alignment_file
    from bs_call_tpu.pipeline.contigs import reconcile_contigs

    ref, bam, _ = make_fixture(tmp_path)
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    cfg = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        contig_bed=str(bed), device="auto",
    )
    reader = open_alignment_file(bam)
    table = reconcile_contigs(
        FastaIndex(ref), reader.header, contig_bed=str(bed)
    )
    npipe = _try_native(cfg, table, reader=reader)
    assert npipe is not None, "indexed BAM + partial -C must be native"
    npipe.close()
    # without the index the native path must decline (Python pre-filter)
    os.rename(bam + ".bai", bam + ".bai.off")
    try:
        assert _try_native(cfg, table, reader=reader) is None
    finally:
        os.rename(bam + ".bai.off", bam + ".bai")


def test_whole_contig_indexed_matches_full_scan(tmp_path):
    """The shard pattern: whole-contig -C over an indexed BAM seeks to
    the contig's chunks; bytes must equal the tid_keep full scan."""
    ref, bam, lens = make_fixture(tmp_path, seed=13)
    bed = tmp_path / "w.bed"
    bed.write_text(f"chr2\t0\t{lens[1]}\n")
    v_scan, r_scan = _run(bam, ref, str(bed), "auto")  # no index yet
    write_bai(bam)
    v_idx, r_idx = _run(bam, ref, str(bed), "auto")
    assert v_idx == v_scan
    assert r_idx == r_scan


def test_spanning_record_quirk_parity(tmp_path):
    """A read overlapping two regions while starting before the first is
    yielded by BOTH region queries (the reference's two sam_itr_queryi
    iterators see it twice); native and Python indexed paths must agree
    on the resulting (double-counted) pileup."""
    rng = np.random.default_rng(3)
    ln = 600
    seq = "".join(rng.choice(list("ACGT"), ln))
    ref = tmp_path / "ref.fa"
    ref.write_text(f">chr1\n{seq}\n")
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ln}\n",
        ref_names=["chr1"], ref_lens=[ln],
    )
    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, hdr)
    # spans [50, 350): overlaps A=[100,200) and B=[250,330)
    w.write("span", 0, 0, 50, 60, [(300, 0)], -1, -1, 0,
            seq[50:350], np.full(300, 40, np.uint8))
    # starts inside A, overlaps B: yielded for A, skipped for B
    w.write("inA", 0, 0, 150, 60, [(150, 0)], -1, -1, 0,
            seq[150:300], np.full(150, 40, np.uint8))
    w.write("inB", 0, 0, 260, 60, [(40, 0)], -1, -1, 0,
            seq[260:300], np.full(40, 40, np.uint8))
    w.close()
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t100\t200\nchr1\t250\t330\n")
    vn, rn = _run(bam, str(ref), str(bed), "auto")
    vp, rp = _run(bam, str(ref), str(bed), "numpy")
    assert vn == vp
    assert rn == rp
