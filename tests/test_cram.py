"""CRAM round-trip tests: writer -> reader record equality against the BAM
path, plus an end-to-end caller run producing identical VCF from CRAM and
BAM inputs."""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamReader, BamWriter, aux_tag
from bs_call_tpu.io.cram import CramReader
from bs_call_tpu.io.cram_writer import CramWriter
from bs_call_tpu.pipeline.runner import run_caller


def make_dataset(tmp_path, seed=0, n=300):
    rng = np.random.default_rng(seed)
    ctg_len = 4000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    recs = []
    bases = "ACGT"
    tags = [b"", aux_tag("XB", "A", "C"), aux_tag("XG", "Z", "GA"),
            aux_tag("NM", "i", 3) + aux_tag("ZS", "Z", "+")]
    for k in range(n):
        pos = int(rng.integers(0, ctg_len - 200))
        rlen = int(rng.integers(30, 80))
        kind = rng.random()
        rseq = list(seq[pos : pos + rlen])
        for i in np.nonzero(rng.random(rlen) < 0.05)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        cigar = [(rlen, 0)]
        if kind < 0.15 and rlen > 12:
            cigar = [(4, 4), (rlen - 4, 0)]
            rseq = list("TTTT") + rseq[: rlen - 4]
        elif kind < 0.3 and rlen > 20:
            half = rlen // 2
            cigar = [(half, 0), (3, 1), (rlen - half - 3, 0)]
            rseq = (
                rseq[:half] + list("GGG") + rseq[half : rlen - 3]
            )
        elif kind < 0.45 and rlen > 20:
            half = rlen // 2
            cigar = [(half, 0), (2, 2), (rlen - half, 0)]
            rseq = list(
                seq[pos : pos + half] + seq[pos + half + 2 : pos + half + 2 + rlen - half]
            )
        qual = rng.integers(0, 60, len(rseq)).astype(np.uint8)
        flag = 16 if rng.random() < 0.5 else 0
        recs.append(
            (f"r{k:05d}", flag, 0, pos, int(rng.integers(0, 61)), cigar,
             -1, -1, 0, "".join(rseq), qual, bytes(tags[k % 4]))
        )
    # proper pairs
    for k in range(40):
        pos1 = int(rng.integers(0, ctg_len - 400))
        pos2 = pos1 + int(rng.integers(50, 150))
        rlen = 60
        isize = pos2 + rlen - pos1
        q1 = rng.integers(10, 44, rlen).astype(np.uint8)
        q2 = rng.integers(10, 44, rlen).astype(np.uint8)
        recs.append(
            (f"p{k:04d}", 0x63, 0, pos1, 55, [(rlen, 0)], 0, pos2, isize,
             seq[pos1 : pos1 + rlen], q1, b"")
        )
        recs.append(
            (f"p{k:04d}", 0x93, 0, pos2, 55, [(rlen, 0)], 0, pos1, -isize,
             seq[pos2 : pos2 + rlen], q2, b"")
        )
    recs.sort(key=lambda r: r[3])
    return str(ref), hdr, recs


def write_both(tmp_path, ref, hdr, recs):
    bam = tmp_path / "t.bam"
    cram = tmp_path / "t.cram"
    wb = BamWriter(str(bam), hdr)
    wc = CramWriter(str(cram), hdr, reference=ref)
    for r in recs:
        wb.write(*r)
        wc.write(*r)
    wb.close()
    wc.close()
    return str(bam), str(cram)


@pytest.mark.parametrize("seed", [0, 1])
def test_cram_roundtrip_matches_bam(tmp_path, seed):
    ref, hdr, recs = make_dataset(tmp_path, seed)
    bam, cram = write_both(tmp_path, ref, hdr, recs)
    b_recs = list(BamReader(bam))
    c_recs = list(CramReader(cram, reference=ref))
    assert len(b_recs) == len(c_recs)
    for rb, rc in zip(b_recs, c_recs):
        assert rb.name == rc.name
        assert rb.flag == rc.flag, rb.name
        assert rb.tid == rc.tid and rb.pos == rc.pos
        assert rb.mapq == rc.mapq
        assert rb.cigar == rc.cigar, (rb.name, rb.cigar, rc.cigar)
        np.testing.assert_array_equal(
            rb.seq_code, rc.seq_code, err_msg=rb.name
        )
        np.testing.assert_array_equal(rb.qual, rc.qual, err_msg=rb.name)
        assert rb.mtid == rc.mtid and rb.pos == rc.pos
        if rb.flag & 0x1:
            assert rb.mpos == rc.mpos, rb.name
            assert rb.isize == rc.isize, rb.name
        # aux tags preserve the bisulfite strand
        from bs_call_tpu.io.bam import decode_bs_strand

        assert decode_bs_strand(rb.aux) == decode_bs_strand(rc.aux)


def test_cram_end_to_end_matches_bam(tmp_path):
    ref, hdr, recs = make_dataset(tmp_path, 2)
    bam, cram = write_both(tmp_path, ref, hdr, recs)
    outs = []
    for path in (bam, cram):
        cfg = CallerConfig(
            input_file=path, reference_file=ref, benchmark_mode=True
        )
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]


def test_native_rans_matches_python(tmp_path):
    """The C++ rANS4x8 decoder (native/bsc_rans.cpp) must produce the
    same records as the Python decoder on both o0 and o1 blocks."""
    import bs_call_tpu.io.cram_codecs as cc
    from bs_call_tpu.native import load

    if load() is None:
        pytest.skip("native library unavailable")
    # raw codec equality on random payloads (o0 and o1)
    rng = np.random.default_rng(11)
    for enc in (cc.rans_encode_o0, cc.rans_encode_o1):
        for size in (1, 5, 100, 4097, 65536):
            data = bytes(
                rng.choice(
                    np.frombuffer(b"ACGT!IIQQ", dtype=np.uint8), size
                )
            )
            blob = enc(data)
            # tiny o1 inputs are encoded as o0 (rans_encode_o1 fallback)
            native = cc._rans_decode_native(blob[0], blob[9:], size)
            assert native is not None
            assert native == data
    # whole-file record equality, native vs forced-Python decode
    ref, hdr, recs = make_dataset(tmp_path, seed=4)
    bam, cram = write_both(tmp_path, ref, hdr, recs)

    def snap():
        return [
            (r.name, r.pos, bytes(r.seq_code), bytes(r.qual))
            for r in CramReader(cram, reference=ref)
        ]

    a = snap()
    orig = cc._rans_decode_native
    cc._rans_decode_native = lambda *args: None
    try:
        b = snap()
    finally:
        cc._rans_decode_native = orig
    assert a == b


def test_roundtrip_deletion_reference_advance(tmp_path):
    """Writer regression: mismatch detection after a deletion must
    compare against the deletion-advanced reference (a 75M3D75M read
    with SNPs downstream of the D used to come back with substitution
    bases decoded off the shifted reference)."""
    import numpy as np

    from bs_call_tpu.io.bam import BamHeader
    from bs_call_tpu.io.cram import CramReader
    from bs_call_tpu.io.cram_writer import CramWriter

    rng = np.random.default_rng(0)
    ctg_len = 2000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    path = tmp_path / "d.cram"
    w = CramWriter(str(path), hdr, reference=str(ref))
    pos = 100
    # 75M 3D 75M with mismatches after the deletion
    left = seq[pos : pos + 75]
    right = list(seq[pos + 78 : pos + 153])
    for k in (5, 20, 40):
        right[k] = "ACGT"[("ACGT".index(right[k]) + 1) % 4]
    s = left + "".join(right)
    q = rng.integers(1, 44, 150).astype(np.uint8)
    w.write("d1", 0, 0, pos, 40, [(75, 0), (3, 2), (75, 0)], -1, -1, 0,
            s, q)
    w.close()
    (rec,) = list(CramReader(str(path), reference=str(ref)))
    got = "".join("NACGT"[c] for c in rec.seq_code)
    assert got == s
    assert rec.cigar == [(75, 0), (3, 2), (75, 0)]


def make_multicontig_dataset(tmp_path, seed=0, n_ctg=6, per_ctg=60):
    """Many small contigs — the workload htslib packs into multi-ref
    slices (ref_id -2 + per-record RI)."""
    rng = np.random.default_rng(seed)
    ctg_len = 900
    names, lens, seqs = [], [], []
    ref = tmp_path / "refm.fa"
    with open(ref, "w") as f:
        for c in range(n_ctg):
            seq = "".join(rng.choice(list("ACGT"), ctg_len))
            names.append(f"ctg{c}")
            lens.append(ctg_len)
            seqs.append(seq)
            f.write(f">ctg{c}\n")
            for i in range(0, ctg_len, 60):
                f.write(seq[i:i + 60] + "\n")
    text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{nm}\tLN:{ln}\n" for nm, ln in zip(names, lens)
    )
    hdr = BamHeader(text=text, ref_names=names, ref_lens=lens)
    recs = []
    bases = "ACGT"
    for c in range(n_ctg):
        seq = seqs[c]
        for k in range(per_ctg):
            pos = int(rng.integers(0, ctg_len - 120))
            rlen = int(rng.integers(30, 80))
            rseq = list(seq[pos:pos + rlen])
            for i in np.nonzero(rng.random(rlen) < 0.05)[0]:
                rseq[i] = bases[int(rng.integers(0, 4))]
            cigar = [(rlen, 0)]
            if k % 5 == 1 and rlen > 12:
                cigar = [(4, 4), (rlen - 4, 0)]
                rseq = list("TTTT") + rseq[:rlen - 4]
            elif k % 5 == 2 and rlen > 20:
                half = rlen // 2
                cigar = [(half, 0), (2, 2), (rlen - half, 0)]
                rseq = list(
                    seq[pos:pos + half]
                    + seq[pos + half + 2:pos + half + 2 + rlen - half]
                )
            qual = rng.integers(0, 60, len(rseq)).astype(np.uint8)
            flag = 16 if rng.random() < 0.5 else 0
            recs.append(
                (f"c{c}r{k:04d}", flag, c, pos, 50, cigar, -1, -1, 0,
                 "".join(rseq), qual, b"")
            )
    recs.sort(key=lambda r: (r[2], r[3]))
    return str(ref), hdr, recs


def test_cram_multiref_roundtrip_matches_bam(tmp_path):
    """multi_ref=True packs several contigs per slice (ref_id -2 +
    per-record RI, absolute AP); the Python reader must reproduce the
    BAM records exactly."""
    ref, hdr, recs = make_multicontig_dataset(tmp_path, seed=4)
    bam = tmp_path / "m.bam"
    cram = tmp_path / "m.cram"
    wb = BamWriter(str(bam), hdr)
    wc = CramWriter(str(cram), hdr, reference=ref, multi_ref=True)
    for r in recs:
        wb.write(*r)
        wc.write(*r)
    wb.close()
    wc.close()
    # the file must actually exercise the multi-ref layout
    from bs_call_tpu.io.cram import CramReader as _CR

    rdr = _CR(str(cram), reference=ref)
    metas = []
    while True:
        got = rdr._read_container()
        if got is None or got[0] is None:
            break
        metas.append(got[1]["ref_id"])
    assert -2 in metas, f"no multi-ref container written: {metas}"

    b_recs = list(BamReader(str(bam)))
    c_recs = list(CramReader(str(cram), reference=ref))
    assert len(b_recs) == len(c_recs)
    for rb, rc in zip(b_recs, c_recs):
        assert (rb.name, rb.flag, rb.tid, rb.pos, rb.mapq) == (
            rc.name, rc.flag, rc.tid, rc.pos, rc.mapq
        )
        assert rb.cigar == rc.cigar, rb.name
        np.testing.assert_array_equal(
            rb.seq_code, rc.seq_code, err_msg=rb.name
        )
        np.testing.assert_array_equal(rb.qual, rc.qual, err_msg=rb.name)


def test_cram_multiref_end_to_end_matches_bam(tmp_path):
    """A multi-ref CRAM run through the full caller must equal the BAM
    run byte for byte (the native slice decoder now handles ref_id -2
    via the per-tid reference table; no Python fallback)."""
    ref, hdr, recs = make_multicontig_dataset(tmp_path, seed=5)
    bam = tmp_path / "m.bam"
    cram = tmp_path / "m.cram"
    wb = BamWriter(str(bam), hdr)
    wc = CramWriter(str(cram), hdr, reference=ref, multi_ref=True)
    for r in recs:
        wb.write(*r)
        wc.write(*r)
    wb.close()
    wc.close()
    outs = []
    for path in (str(bam), str(cram)):
        cfg = CallerConfig(
            input_file=path, reference_file=ref, benchmark_mode=True
        )
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]


def test_iter_record_blobs_region_pruning(tmp_path):
    """Container/slice pruning via the spec's header span fields (the
    .crai fast path): restricting to a window must skip out-of-window
    slices while keeping EVERY record that overlaps the window."""
    import struct as _struct

    ref, hdr, recs = make_dataset(tmp_path, 0)
    cram = tmp_path / "prune.cram"
    w = CramWriter(str(cram), hdr, reference=ref)
    w.SLICE_RECORDS = 64  # many small slices so pruning has targets
    for r in recs:
        w.write(*r)
    w.close()
    from bs_call_tpu.io.cram import CramReader

    def names_of(blobs):
        out = set()
        for blob, _tid in blobs:
            off = 0
            while off < len(blob):
                (sz,) = _struct.unpack_from("<I", blob, off)
                body = blob[off + 4 : off + 4 + sz]
                l_name = body[8]
                out.add(body[32 : 32 + l_name - 1].decode())
                off += 4 + sz
        return out

    full = list(CramReader(str(cram), reference=ref).iter_record_blobs())
    beg, stop = 1000, 1800
    pruned = list(
        CramReader(str(cram), reference=ref).iter_record_blobs(
            regions={0: [(beg, stop)]}
        )
    )
    assert len(pruned) < len(full)  # pruning really skipped slices
    want = set()
    for r in recs:
        pos = r[3]  # 0-based
        span = sum(ln for ln, op in r[5] if op in (0, 2, 3, 7, 8)) or 1
        if pos + 1 <= stop and pos + span >= beg:
            want.add(r[0])
    got = names_of(pruned)
    assert want <= got  # nothing overlapping the window was dropped
