"""Model-semantics sanity on simulated bisulfite chemistry.

Parity tests pin byte-equality against the transcribed math; this test
checks the *biology*: on simulated WGBS reads (C->T conversion on the
C2T strand, G->A on the G2A strand), methylated CpG cytosines keep their
C support (informative counts) and call CC with CG context, while fully
unmethylated cytosines convert and still call CC (the model attributes
T support at a C site to conversion, genotype_model.c:165-230)."""

import io

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter, aux_tag
from bs_call_tpu.pipeline.runner import run_caller


def _simulate(tmp_path, methylated: bool):
    rng = np.random.default_rng(42)
    ctg_len = 6000
    # reference with guaranteed CpG sites every ~40bp
    seq = list(rng.choice(list("ACGT"), ctg_len))
    cpg_sites = list(range(100, ctg_len - 100, 40))
    for p in cpg_sites:
        seq[p] = "C"
        seq[p + 1] = "G"
        # avoid accidental CpG right before/after
        if seq[p - 1] == "C":
            seq[p - 1] = "A"
        if seq[p + 2] == "G":
            seq[p + 2] = "T"
    seq = "".join(seq)
    ref = tmp_path / f"ref_{methylated}.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    bam = tmp_path / f"in_{methylated}.bam"
    hdr = BamHeader(
        text=f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:{ctg_len}\n",
        ref_names=["chr1"],
        ref_lens=[ctg_len],
    )
    w = BamWriter(str(bam), hdr)
    q = np.full(100, 40, np.uint8)
    k = 0
    cpg_set = set(cpg_sites)
    for pos in np.sort(rng.integers(0, ctg_len - 120, 3000)):
        pos = int(pos)
        strand_c2t = rng.random() < 0.5
        rseq = list(seq[pos : pos + 100])
        for i in range(100):
            g = pos + i
            if strand_c2t and rseq[i] == "C":
                keep = methylated and g in cpg_set
                if not keep:
                    rseq[i] = "T"  # converted (unmethylated)
            elif not strand_c2t and rseq[i] == "G":
                keep = methylated and (g - 1) in cpg_set
                if not keep:
                    rseq[i] = "A"
        tag = aux_tag("XB", "A", "C" if strand_c2t else "G")
        w.write(
            f"r{k}", 0, 0, pos, 60, [(100, 0)], -1, -1, 0,
            "".join(rseq), q, bytes(tag),
        )
        k += 1
    w.close()
    cfg = CallerConfig(
        input_file=str(bam), reference_file=str(ref),
        benchmark_mode=True, all_positions=True,
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    rows = {}
    for line in out.getvalue().decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        rows[int(f[1])] = f
    return rows, cpg_sites


def _fmt(row):
    return dict(zip(row[8].split(":"), row[9].split(":")))


def test_methylated_cpgs_call_cc_with_cg_status(tmp_path):
    rows, cpg_sites = _simulate(tmp_path, methylated=True)
    hits = 0
    for p in cpg_sites:
        row = rows.get(p + 1)  # VCF is 1-based; site is the C
        if row is None:
            continue
        fmt = _fmt(row)
        if int(fmt["DP"]) + sum(
            int(v) for v in fmt["MC8"].split(",")[4:]
        ) < 8:
            continue
        hits += 1
        assert fmt["GT"] == "0/0", (p, row)  # CC at a C reference base
        assert fmt["CG"] == "C", (p, fmt)  # one char, print_vcf.c:366
        mc8 = [int(v) for v in fmt["MC8"].split(",")]
        # methylated: informative C support (category 5) dominates
        # informative T (category 7) on the C strand
        assert mc8[5] > mc8[7], (p, mc8)
    assert hits > 50


def test_unmethylated_cpgs_still_call_cc(tmp_path):
    rows, cpg_sites = _simulate(tmp_path, methylated=False)
    hits = 0
    conv_dominant = 0
    for p in cpg_sites:
        row = rows.get(p + 1)
        if row is None:
            continue
        fmt = _fmt(row)
        mc8 = [int(v) for v in fmt["MC8"].split(",")]
        if sum(mc8) < 8:
            continue
        hits += 1
        # conversion must NOT flip the genotype to CT/TT
        assert fmt["GT"] == "0/0", (p, row)
        if mc8[7] > mc8[5]:
            conv_dominant += 1
    assert hits > 50
    # most sites show converted-T dominance (unmethylated signal)
    assert conv_dominant > hits * 0.8


def test_mate_overlap_counts_bases_once(tmp_path):
    """An overlapping proper pair covers a CpG with both mates; overlap
    resolution (al_utils.c:164-318) must count the overlapped cytosine
    once, not twice."""
    ctg_len = 400
    seq = list("A" * ctg_len)
    P = 200  # CpG at 0-based 200,201
    seq[P] = "C"
    seq[P + 1] = "G"
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
    q = np.full(60, 40, np.uint8)
    tag = bytes(aux_tag("XB", "A", "C"))
    p1, p2 = 170, 190  # both mates span the CpG at 200
    rlen = 60
    isize = p2 + rlen - p1
    w.write("p0", 0x63, 0, p1, 60, [(rlen, 0)], 0, p2, isize,
            seq[p1 : p1 + rlen], q, tag)
    w.write("p0", 0x93, 0, p2, 60, [(rlen, 0)], 0, p1, -isize,
            seq[p2 : p2 + rlen], q, tag)
    w.close()
    cfg = CallerConfig(
        input_file=str(bam), reference_file=str(ref),
        benchmark_mode=True, all_positions=True,
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    row = None
    for line in out.getvalue().decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        if int(f[1]) == P + 1:
            row = f
    assert row is not None
    mc8 = [int(v) for v in _fmt(row)["MC8"].split(",")]
    assert sum(mc8) == 1, mc8  # the overlapped base counted once
    assert mc8[5] == 1, mc8  # informative C (methylated, unconverted)
