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
    # without an index the native path now builds a .bai on the fly
    # (round-5: every -C input kind runs natively) and still engages
    os.rename(bam + ".bai", bam + ".bai.off")
    try:
        npipe = _try_native(cfg, table, reader=reader)
        assert npipe is not None, (
            "non-indexed BAM + partial -C must engage natively "
            "(on-the-fly .bai or stream filter)"
        )
        npipe.close()
        assert os.path.exists(bam + ".bai")  # the on-the-fly index
    finally:
        os.unlink(bam + ".bai")
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


_CODE2BASE = "NACGT"
_CIGAR_OPS = "MIDNSHP=X"


def _rec_fields(rec):
    seq = "".join(_CODE2BASE[c] for c in rec.seq_code)
    qual = np.asarray(rec.qual, dtype=np.uint8)
    return seq, qual


def _to_cram(bam, ref, out):
    from bs_call_tpu.io.bam import BamReader
    from bs_call_tpu.io.cram_writer import CramWriter

    rd = BamReader(bam)
    w = CramWriter(out, rd.header, reference=ref)
    for rec in rd:
        seq, qual = _rec_fields(rec)
        w.write(rec.name, rec.flag, rec.tid, rec.pos, rec.mapq,
                rec.cigar, rec.mtid, rec.mpos, rec.isize, seq, qual)
    w.close()


def _to_sam(bam, out):
    from bs_call_tpu.io.bam import BamReader

    rd = BamReader(bam)
    names = rd.header.ref_names
    with open(out, "w") as f:
        f.write(rd.header.text)
        for rec in rd:
            seq, qual = _rec_fields(rec)
            cig = "".join(
                f"{ln}{_CIGAR_OPS[op]}" for ln, op in rec.cigar
            ) or "*"
            rnext = (
                "*" if rec.mtid < 0
                else "=" if rec.mtid == rec.tid
                else names[rec.mtid]
            )
            f.write("\t".join([
                rec.name, str(rec.flag), names[rec.tid],
                str(rec.pos + 1), str(rec.mapq), cig, rnext,
                str(rec.mpos + 1), str(rec.isize), seq,
                "".join(chr(q + 33) for q in qual),
            ]) + "\n")


def test_partial_regions_native_cram_matches_bam(tmp_path):
    """-C over CRAM runs the native pipeline through the C++ stream
    region filter (round-5: no Python pre-filter path left for CRAM);
    output and report must byte-match the indexed-BAM run."""
    from bs_call_tpu.io.fasta import FastaIndex
    from bs_call_tpu.io.sam import open_alignment_file
    from bs_call_tpu.pipeline.contigs import reconcile_contigs

    ref, bam, _ = make_fixture(tmp_path)
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    v_bam, r_bam = _run(bam, ref, str(bed), "auto")
    cram = str(tmp_path / "in.cram")
    _to_cram(bam, ref, cram)
    # the native path must actually engage for CRAM -C now
    cfg = CallerConfig(
        input_file=cram, reference_file=ref, benchmark_mode=True,
        contig_bed=str(bed), device="auto",
    )
    reader = open_alignment_file(cram, reference=ref)
    table = reconcile_contigs(
        FastaIndex(ref), reader.header, contig_bed=str(bed)
    )
    npipe = _try_native(cfg, table, reader=reader)
    assert npipe is not None, "CRAM + partial -C must engage natively"
    npipe.close()
    v_cram, r_cram = _run(cram, ref, str(bed), "auto")
    assert v_cram == v_bam
    assert r_cram == r_bam


def test_partial_regions_native_sam_matches_bam(tmp_path):
    """-C over SAM text runs natively through the stream filter."""
    ref, bam, _ = make_fixture(tmp_path)
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    v_bam, _ = _run(bam, ref, str(bed), "auto")
    sam = str(tmp_path / "in.sam")
    _to_sam(bam, sam)
    v_sam, _ = _run(sam, ref, str(bed), "auto")
    assert v_sam == v_bam


def test_partial_regions_stream_filter_matches_python(tmp_path, monkeypatch):
    """Force the stream filter (no index, index build disabled by a
    read-only-style override) and compare against the Python
    pre-filter path (device=numpy)."""
    import bs_call_tpu.pipeline.runner as runner_mod

    ref, bam, _ = make_fixture(tmp_path, seed=23)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    v_py, r_py = _run(bam, ref, str(bed), "numpy")
    # disable the on-the-fly index build so the stream filter engages
    monkeypatch.setattr(
        "bs_call_tpu.parallel.shard_runner._ensure_bam_index",
        lambda path: None,
    )
    assert not os.path.exists(bam + ".bai")
    v_native, r_native = _run(bam, ref, str(bed), "auto")
    assert not os.path.exists(bam + ".bai")  # build really was disabled
    assert v_native == v_py
    assert r_native == r_py


def test_rowengine_disabled_for_partial_regions(tmp_path, monkeypatch):
    """Round-5 regression: on a single-device host (the production
    configuration — the 8-virtual-device test mesh disables the
    rowengine via _prefer_xla_f64 and masked this) the native row
    engine used to emit covered positions OUTSIDE the -C windows,
    because bsre_emit has no region gate. Partial-region runs must now
    bypass the rowengine and byte-match the Python path."""
    from bs_call_tpu.pipeline.engine import CallEngine

    monkeypatch.setattr(
        CallEngine, "_prefer_xla_f64", lambda self: False
    )
    ref, bam, _ = make_fixture(tmp_path, seed=31)
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    vn, rn = _run(bam, ref, str(bed), "auto")
    vp, rp = _run(bam, ref, str(bed), "numpy")
    assert vn == vp
    assert rn == rp


def test_prefetch_vs_chunk_seek_race(tmp_path):
    """Round-5 regression: the linear stream's background inflate
    prefetch thread must be stopped before indexed chunk mode seeks the
    same FILE* (open_chunk). The race only manifests when the input is
    large enough that prefetch is still running after the header read —
    small fixtures hit EOF first and mask it (observed as all four
    bench shard workers crashing on the 94 MB fixture). This fixture is
    sized past the prefetch queue (3 batches x 64 BGZF blocks)."""
    from bs_call_tpu.io.bai import write_bai as _wb
    from bs_call_tpu.utils.synth import make_wgbs_fixture

    ref, bam, _n = make_wgbs_fixture(
        str(tmp_path), 30000, 200_000, seed=3, n_contigs=2
    )
    import os as _os

    assert _os.path.getsize(bam) > 3 * 64 * 20_000  # beyond the queue
    _wb(bam)
    bed = tmp_path / "w.bed"
    bed.write_text("chr2\t0\t200000\n")
    vn, rn = _run(bam, ref, str(bed), "auto")
    vp, rp = _run(bam, ref, str(bed), "numpy")
    assert vn == vp
    assert rn == rp


def test_partial_regions_stdin_bam_native(tmp_path, monkeypatch):
    """stdin BAM + partial -C: round-5 closes the last Python
    pre-filter path — the stream region filter runs in C++ for piped
    input too, byte-matching the file-based run."""
    import subprocess
    import sys

    ref, bam, _ = make_fixture(tmp_path, seed=41)
    write_bai(bam)
    bed = tmp_path / "r.bed"
    bed.write_text(BED)
    v_file, _ = _run(bam, ref, str(bed), "auto")
    env = {**os.environ, "PYTHONPATH": os.pathsep.join(
        p for p in (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.environ.get("PYTHONPATH"),
        ) if p
    )}
    with open(bam, "rb") as f:
        r = subprocess.run(
            [sys.executable, "-m", "bs_call_tpu.cli", "-", "-r", ref,
             "-o", str(tmp_path / "stdin.vcf"), "--benchmark-mode",
             "-C", str(bed)],
            stdin=f, capture_output=True, timeout=300, env=env,
        )
    assert r.returncode == 0, r.stderr[-1500:]
    assert (tmp_path / "stdin.vcf").read_bytes() == v_file
