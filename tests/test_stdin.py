"""Streaming input from stdin ('-'): SAM, gzipped SAM, and BAM, matching
the reference's pipe support through htslib (process.c:112-137)."""

import gzip
import io
import sys

import numpy as np

from bs_call_tpu.io.bam import BamHeader, BamReader, BamWriter
from bs_call_tpu.io.sam import open_alignment_file


class _FakeStdin:
    def __init__(self, data: bytes):
        self.buffer = io.BytesIO(data)


def _bam_bytes(tmp_path, n=300):
    rng = np.random.default_rng(0)
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n",
        ref_names=["chr1"],
        ref_lens=[100000],
    )
    p = tmp_path / "t.bam"
    w = BamWriter(str(p), hdr)
    seq = "".join(rng.choice(list("ACGT"), 100))
    for k, pos in enumerate(np.sort(rng.integers(0, 99000, n))):
        q = rng.integers(20, 44, 100).astype(np.uint8)
        w.write(f"r{k}", 0, 0, int(pos), 60, [(100, 0)], -1, -1, 0, seq, q)
    w.close()
    return str(p), open(p, "rb").read()


def test_bam_from_stdin(tmp_path, monkeypatch):
    path, raw = _bam_bytes(tmp_path)
    want = [(r.name, r.pos) for r in BamReader(path)]
    monkeypatch.setattr(sys, "stdin", _FakeStdin(raw))
    rd = open_alignment_file("-")
    assert isinstance(rd, BamReader)
    got = [(r.name, r.pos) for r in rd]
    assert got == want


def test_sam_and_gz_sam_from_stdin(tmp_path, monkeypatch):
    sam = (
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chr1\tLN:1000\n"
        "r1\t0\tchr1\t10\t60\t5M\t*\t0\t0\tACGTA\tIIIII\n"
        "r2\t0\tchr1\t20\t60\t5M\t*\t0\t0\tTTTTT\tIIIII\n"
    ).encode()
    for payload in (sam, gzip.compress(sam)):
        monkeypatch.setattr(sys, "stdin", _FakeStdin(payload))
        rd = open_alignment_file("-")
        names = [r.name for r in rd]
        assert names == ["r1", "r2"]


def test_stdin_bam_native_run_matches_file(tmp_path, monkeypatch):
    """stdin BAM goes through the stream-push native pipeline (forwarded
    decompressed bytes) and must match the file run, including stats
    (stdin pipes cannot be reopened, so stats are on from the start)."""
    import io as iomod

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.pipeline.runner import run_caller
    from bs_call_tpu.stats.collect import BsStats
    from bs_call_tpu.stats.report import write_report

    path, raw = _bam_bytes(tmp_path, n=2000)
    rng = np.random.default_rng(0)
    ctg_len = 100000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    outs, reps = [], []
    for src in (path, "-"):
        if src == "-":
            monkeypatch.setattr(sys, "stdin", _FakeStdin(raw))
        cfg = CallerConfig(
            input_file=src, reference_file=str(ref),
            benchmark_mode=True, report_file="x",
        )
        o = iomod.BytesIO()
        st = BsStats()
        st, table = run_caller(cfg, out_fileobj=o, stats=st)
        outs.append(o.getvalue())
        r = iomod.StringIO()
        write_report(r, cfg, st, table)
        reps.append(r.getvalue())
    assert outs[0] == outs[1]
    assert reps[0] == reps[1]


def test_stdin_cram_matches_file(tmp_path, monkeypatch):
    """`cat in.cram | bs_call -` must match the file-input run — the
    reference's hts_open("-") auto-detects CRAM (process.c:112-137)."""
    import io as iomod

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.io.cram_writer import CramWriter
    from bs_call_tpu.pipeline.runner import run_caller

    path, _raw = _bam_bytes(tmp_path, n=800)
    rng = np.random.default_rng(0)
    ctg_len = 100000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    cram = tmp_path / "t.cram"
    rd = BamReader(path)
    w = CramWriter(str(cram), rd.header, reference=str(ref))
    for r in rd:
        s_txt = "".join("NACGT"[c] for c in r.seq_code)
        w.write(r.name, r.flag, r.tid, r.pos, r.mapq, r.cigar, r.mtid,
                r.mpos, r.isize, s_txt, r.qual, r.aux)
    w.close()
    raw = open(cram, "rb").read()
    outs = []
    for src in (str(cram), "-"):
        if src == "-":
            monkeypatch.setattr(sys, "stdin", _FakeStdin(raw))
        cfg = CallerConfig(
            input_file=src, reference_file=str(ref), benchmark_mode=True,
        )
        o = iomod.BytesIO()
        run_caller(cfg, out_fileobj=o)
        outs.append(o.getvalue())
    assert outs[0] == outs[1] and outs[0].count(b"\n") > 100
