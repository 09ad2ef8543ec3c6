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
