"""Exhaustive (called genotype x reference base) emission parity.

Random fixtures rarely produce rare combos (e.g. GT "1/2" at an N
reference, multi-ALT GL compaction rows). This fixture engineers 50
consecutive loci — each of the 10 diploid genotypes at each of the 5
reference bases (A,C,G,T,N) — with overwhelming unconverted coverage, so
every row of the GT/ALT/CS/GT-int/GL-ordering LUTs (print_vcf.c:34-96)
is exercised, and the scalar and vectorized emitters must agree on all
of them byte for byte."""

import io

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller

GTS = ["AA", "AC", "AG", "AT", "CC", "CG", "CT", "GG", "GT", "TT"]
REFS = "ACGTN"


def _fixture(tmp_path):
    n_loci = 50
    start = 100
    ctg_len = 400
    seq = list("A" * ctg_len)
    combos = []
    for gi, gt in enumerate(GTS):
        for ri, rb in enumerate(REFS):
            combos.append((gt, rb))
    assert len(combos) == n_loci
    for i, (gt, rb) in enumerate(combos):
        seq[start + i] = rb
    seq = "".join(seq)
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    w = BamWriter(str(bam), hdr)
    q = np.full(n_loci, 40, np.uint8)
    n_reads = 40
    for k in range(n_reads):
        bases = []
        for gt, _rb in combos:
            bases.append(gt[k % 2] if gt[0] != gt[1] else gt[0])
        # no bisulfite tag: non-converted strand, plain genotyping
        w.write(
            f"r{k}", 0, 0, start, 60, [(n_loci, 0)], -1, -1, 0,
            "".join(bases), q,
        )
    w.close()
    return str(ref), str(bam), combos, start


def test_all_genotype_ref_combos_scalar_vector_parity(tmp_path):
    ref, bam, combos, start = _fixture(tmp_path)
    outs = []
    for use_vector in (False, True):
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            all_positions=True, keep_duplicates=True,
        )
        if not use_vector:
            cfg.out_file_type = -1  # text writer, vector gate off
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs.append(
            [
                l
                for l in out.getvalue().decode().splitlines()
                if not l.startswith("#")
            ]
        )
    assert outs[0] == outs[1]
    rows = {
        int(l.split("\t")[1]): l.split("\t") for l in outs[1]
    }
    seen_gt = set()
    verified = 0
    for i, (gt, rb) in enumerate(combos):
        row = rows.get(start + i + 1)
        assert row is not None, (i, gt, rb)
        fmt = dict(zip(row[8].split(":"), row[9].split(":")))
        seen_gt.add((row[3], row[4], fmt["GT"]))
        # called genotype must be the engineered one: reconstruct the
        # allele pair from REF/ALT/GT. Some reference-quirk rows emit GT
        # indexes past the ALT list (the GT-int table bug kept verbatim,
        # print_vcf.c:34-96) — those can't be reconstructed; parity above
        # still pins their exact bytes.
        alleles = [row[3]] + (
            row[4].split(",") if row[4] != "." else []
        )
        idxs = [
            int(x) for x in fmt["GT"].replace("|", "/").split("/")
        ]
        if any(x >= len(alleles) for x in idxs):
            # must be the verbatim GT-int quirk: het-non-ref with two
            # ALTs encodes as "1/3" (print_vcf.c GT table, 0x48)
            assert fmt["GT"] == "1/3" and len(alleles) == 3, (i, gt, rb)
            continue
        if row[3] == "N" and rb != "N":
            # strncpy context truncation: sites within 2bp after an N
            # reference base print REF=N (the fixture packs N loci next
            # to others); parity above pins these bytes
            continue
        called = "".join(
            sorted(
                alleles[x] if alleles[x] != "N" else gt[0]
                for x in idxs
            )
        )
        want = "".join(sorted(gt))
        assert called == want, (i, gt, rb, row[3], row[4], fmt["GT"])
        verified += 1
    assert verified >= 20
    # the engineered space hits many distinct (REF, ALT, GT) rows
    assert len(seen_gt) >= 25
