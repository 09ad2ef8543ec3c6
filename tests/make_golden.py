"""Regenerate the golden snapshot (tests/golden/). Run manually after an
INTENTIONAL behavior change and commit the result:
    python tests/make_golden.py
"""

import hashlib
import io
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))  # repo root for bs_call_tpu
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def build_fixture(tmp):
    """Deterministic mixed fixture: pairs with overlap, clips, indels,
    duplicates, three bisulfite strands, N bases in the reference."""
    from bs_call_tpu.io.bam import BamHeader, BamWriter, aux_tag

    rng = np.random.default_rng(20260817)
    ctg_len = 4000
    seq = rng.choice(list("ACGT"), ctg_len)
    seq[rng.random(ctg_len) < 0.005] = "N"
    seq = "".join(seq)
    ref = os.path.join(tmp, "ref.fa")
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, ctg_len, 60):
            f.write(seq[i : i + 60] + "\n")
    bam = os.path.join(tmp, "in.bam")
    hdr = BamHeader(
        text=(
            "@HD\tVN:1.6\tSO:coordinate\n"
            f"@SQ\tSN:chr1\tLN:{ctg_len}\n"
            "@RG\tID:rg1\tBC:BC01\tSM:sample1\n"
        ),
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    recs = []
    bases = "ACGT"
    tags = [b"", aux_tag("XB", "A", "C"), aux_tag("XB", "A", "G")]
    for k in range(700):
        pos = int(rng.integers(0, ctg_len - 300))
        rlen = int(rng.integers(40, 90))
        rseq = list(seq[pos : pos + rlen].replace("N", "A"))
        for i in np.nonzero(rng.random(rlen) < 0.04)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(10, 44, rlen).astype(np.uint8)
        kind = rng.random()
        cigar = [(rlen, 0)]
        if kind < 0.1 and rlen > 12:
            cigar = [(3, 4), (rlen - 3, 0)]
        elif kind < 0.2 and rlen > 24:
            h = rlen // 2
            cigar = [(h, 0), (2, 1), (rlen - h - 2, 0)]
        elif kind < 0.3 and rlen > 24:
            h = rlen // 2
            cigar = [(h, 0), (3, 2), (rlen - h, 0)]
            rseq = list(
                (seq[pos : pos + h] + seq[pos + h + 3 :]).replace("N", "A")
            )[:rlen]
        flag = 16 if rng.random() < 0.5 else 0
        recs.append(
            (pos, f"s{k}", flag, 0, pos, int(rng.integers(0, 61)), cigar,
             -1, -1, 0, "".join(rseq[: sum(l for l, o in cigar if o in (0,1,4))]),
             q, bytes(tags[k % 3]))
        )
    for k in range(150):
        pos1 = int(rng.integers(0, ctg_len - 500))
        pos2 = pos1 + int(rng.integers(20, 160))
        rlen = 70
        isize = pos2 + rlen - pos1
        for which, (p, fl) in enumerate(
            (((pos1), 0x63), ((pos2), 0x93))
        ):
            rs = list(seq[p : p + rlen].replace("N", "A"))
            q = rng.integers(10, 44, rlen).astype(np.uint8)
            recs.append(
                (p, f"p{k}", fl, 0, p, 50, [(rlen, 0)], 0,
                 pos2 if which == 0 else pos1,
                 isize if which == 0 else -isize, "".join(rs), q,
                 bytes(tags[k % 3]))
            )
    recs.sort(key=lambda r: r[0])
    w = BamWriter(bam, hdr)
    for r in recs:
        w.write(*r[1:])
    w.close()
    # dbSNP index
    from bs_call_tpu.io.dbsnp_idx import DbSnpIndexBuilder

    b = DbSnpIndexBuilder(maf_limit=0.1, header="track name=goldenSNP")
    for p in sorted(rng.choice(ctg_len - 10, 200, replace=False)):
        b.add_snp("chr1", int(p) + 1, f"rs{p}",
                  maf=0.4 if p % 4 == 0 else -1.0)
    idx = os.path.join(tmp, "dbsnp.bin")
    b.write(idx)
    return ref, bam, idx


def run(tmp):
    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.pipeline.runner import run_caller
    from bs_call_tpu.stats.collect import BsStats
    from bs_call_tpu.stats.report import write_report

    ref, bam, idx = build_fixture(tmp)
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        dbsnp_file=idx,
        benchmark_mode=True,
        left_trim=(2, 1),
        right_trim=(1, 0),
        sample_name="golden",
    )
    out = io.BytesIO()
    stats = BsStats()
    stats, table = run_caller(cfg, out_fileobj=out, stats=stats)
    rep = io.StringIO()
    write_report(rep, cfg, stats, table, dbsnp=True)
    report = rep.getvalue()
    # strip the date line (not stable)
    report = "\n".join(
        l for l in report.splitlines() if not l.startswith('\t"date"')
    )
    return out.getvalue().decode(), report


def run_bcf(tmp):
    """Same fixture/config as run() but BCF output; returns the
    *decompressed* BCF byte stream (stable across zlib builds)."""
    import gzip

    from bs_call_tpu import constants as C
    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.pipeline.runner import run_caller

    ref, bam, idx = build_fixture(tmp)
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        dbsnp_file=idx,
        benchmark_mode=True,
        left_trim=(2, 1),
        right_trim=(1, 0),
        sample_name="golden",
        out_file_type=C.FT_BCF_GZ,
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    return gzip.decompress(out.getvalue())


def main():
    import tempfile

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        vcf, report = run(tmp)
    with tempfile.TemporaryDirectory() as tmp:
        bcf = run_bcf(tmp)
    with open(os.path.join(GOLDEN_DIR, "golden.vcf"), "w") as f:
        f.write(vcf)
    with open(os.path.join(GOLDEN_DIR, "golden_report.json"), "w") as f:
        f.write(report)
    with open(os.path.join(GOLDEN_DIR, "golden.bcf.u"), "wb") as f:
        f.write(bcf)
    print("golden vcf sha:", hashlib.sha256(vcf.encode()).hexdigest()[:16])
    print("golden bcf sha:", hashlib.sha256(bcf).hexdigest()[:16])
    print("records:", sum(1 for l in vcf.splitlines() if not l.startswith("#")))


if __name__ == "__main__":
    main()
