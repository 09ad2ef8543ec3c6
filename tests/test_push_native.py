"""Push-mode native pipeline: CRAM/SAM records decoded host-side and fed
to the C++ block builder must produce byte-identical VCF + JSON report to
the BAM path (which streams through the C++ decoder directly)."""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller
from bs_call_tpu.stats.collect import BsStats
from bs_call_tpu.stats.report import write_report


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("push")
    rng = np.random.default_rng(9)
    ctg_len = 30_000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp / "ref.fa"
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
    bases = "ACGT"
    recs = []
    for k in range(1500):
        pos = int(rng.integers(0, ctg_len - 200))
        rlen = 100
        rseq = list(seq[pos : pos + rlen])
        for i in np.nonzero(rng.random(rlen) < 0.03)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(15, 44, rlen).astype(np.uint8)
        recs.append(
            (f"r{k}", 0, 0, pos, 50, [(rlen, 0)], -1, -1, 0,
             "".join(rseq), q)
        )
    # proper pairs exercise the C++ mate pairing through push mode
    for k in range(200):
        p1 = int(rng.integers(0, ctg_len - 400))
        p2 = p1 + int(rng.integers(40, 120))
        rlen = 80
        isize = p2 + rlen - p1
        q1 = rng.integers(15, 44, rlen).astype(np.uint8)
        q2 = rng.integers(15, 44, rlen).astype(np.uint8)
        recs.append(
            (f"p{k}", 0x63, 0, p1, 55, [(rlen, 0)], 0, p2, isize,
             seq[p1 : p1 + rlen], q1)
        )
        recs.append(
            (f"p{k}", 0x93, 0, p2, 55, [(rlen, 0)], 0, p1, -isize,
             seq[p2 : p2 + rlen], q2)
        )
    recs.sort(key=lambda r: r[3])
    bam = tmp / "in.bam"
    w = BamWriter(str(bam), hdr)
    for r in recs:
        w.write(*r)
    w.close()
    sam = tmp / "in.sam"
    with open(sam, "w") as f:
        f.write(hdr.text)
        for r in recs:
            name, flag, _tid, pos, mapq, cigar, mtid, mpos, isize, s, q = r
            cig = "".join(f"{ln}{'MIDNSHP=X'[op]}" for ln, op in cigar)
            rnext = "=" if mtid == 0 else "*"
            qs = "".join(chr(33 + int(v)) for v in q)
            f.write(
                f"{name}\t{flag}\tchr1\t{pos+1}\t{mapq}\t{cig}\t{rnext}\t"
                f"{(mpos+1) if mpos >= 0 else 0}\t{isize}\t{s}\t{qs}\n"
            )
    from bs_call_tpu.io.cram_writer import CramWriter

    cram = tmp / "in.cram"
    wc = CramWriter(str(cram), hdr, str(ref))
    for r in recs:
        wc.write(*r)
    wc.close()
    return str(ref), str(bam), str(sam), str(cram)


def _run(path, ref):
    cfg = CallerConfig(
        input_file=path, reference_file=ref, benchmark_mode=True,
        report_file="x",
    )
    out = io.BytesIO()
    st = BsStats()
    st, table = run_caller(cfg, out_fileobj=out, stats=st)
    rep = io.StringIO()
    write_report(rep, cfg, st, table)
    return out.getvalue(), rep.getvalue()


@pytest.mark.parametrize("fmt", ["sam", "cram"])
def test_push_native_matches_bam(dataset, fmt):
    ref, bam, sam, cram = dataset
    vcf_bam, rep_bam = _run(bam, ref)
    vcf_x, rep_x = _run({"sam": sam, "cram": cram}[fmt], ref)
    assert vcf_x == vcf_bam
    assert rep_x == rep_bam
    assert vcf_bam.count(b"\n") > 500


def test_native_sam_text_parser(tmp_path):
    """The C++ SAM line parser must produce the same calls as the Python
    SAM reader across aux types, missing quals, = rnext, CRLF, and
    unknown-contig lines."""
    import gzip
    import io

    import numpy as np

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.native.pipeline import NativeSamPipeline
    from bs_call_tpu.pipeline.runner import run_caller

    seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + seq + "\n")
    lines = [
        "@HD\tVN:1.6\tSO:coordinate",
        "@SQ\tSN:chr1\tLN:40",
    ]
    rng = np.random.default_rng(0)
    for i, pos in enumerate(range(1, 25)):
        q = "".join(chr(int(v) + 33) for v in rng.integers(20, 41, 12))
        # the strand tag deliberately NOT first: every aux field must
        # be parsed (a field cap used to drop all but the first tag)
        aux = "\tNM:i:0\tZZ:Z:hello\tBB:B:c,1,-2,3\tXB:A:C\tFF:f:1.5"
        lines.append(
            f"r{i}\t0\tchr1\t{pos}\t60\t12M\t=\t0\t0\t"
            f"{seq[pos - 1 : pos + 11]}\t{q}{aux}"
        )
    # star qual (kept sorted: input must be coordinate-sorted)
    lines.append(f"s1\t0\tchr1\t25\t50\t12M\t*\t0\t0\t{seq[24:36]}\t*")
    # CRLF line ending + unknown contig (skipped consistently)
    sam_text = "\r\n".join(lines) + "\n"
    plain = tmp_path / "in.sam"
    plain.write_text(sam_text)
    gzp = tmp_path / "in.sam.gz"
    with gzip.open(gzp, "wt") as f:
        f.write(sam_text)

    outs = []
    for path, native in ((plain, True), (plain, False), (gzp, True)):
        cfg = CallerConfig(
            input_file=str(path), reference_file=str(ref),
            benchmark_mode=True, device="numpy",
        )
        if not native:
            # force the Python record path by disabling the native class
            orig = NativeSamPipeline.__init__

            def boom(self, *a, **k):
                raise RuntimeError("disabled")

            NativeSamPipeline.__init__ = boom
            try:
                out = io.BytesIO()
                run_caller(cfg, out_fileobj=out)
            finally:
                NativeSamPipeline.__init__ = orig
        else:
            out = io.BytesIO()
            run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1], "native SAM parse != Python SAM parse"
    assert outs[0] == outs[2], "gzip SAM != plain SAM"
    assert b"chr1" in outs[0]


def test_unsorted_input_rejected_both_paths(tmp_path):
    """Unsorted input raises the same clean error from the native and
    Python block builders."""
    import io

    import pytest

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.native.pipeline import NativeSamPipeline
    from bs_call_tpu.pipeline.runner import run_caller

    seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + seq + "\n")
    q = "I" * 12
    sam = tmp_path / "u.sam"
    sam.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n"
        f"a\t0\tchr1\t20\t60\t12M\t*\t0\t0\t{seq[19:31]}\t{q}\n"
        f"b\t0\tchr1\t3\t60\t12M\t*\t0\t0\t{seq[2:14]}\t{q}\n"
    )
    for native in (True, False):
        cfg = CallerConfig(
            input_file=str(sam), reference_file=str(ref),
            benchmark_mode=True, device="numpy",
        )
        out = io.BytesIO()
        if native:
            with pytest.raises(ValueError, match="unsorted"):
                run_caller(cfg, out_fileobj=out)
        else:
            orig = NativeSamPipeline.__init__

            def boom(self, *a, **k):
                raise RuntimeError("disabled")

            NativeSamPipeline.__init__ = boom
            try:
                with pytest.raises(ValueError, match="unsorted"):
                    run_caller(cfg, out_fileobj=out)
            finally:
                NativeSamPipeline.__init__ = orig
