"""End-to-end pipeline test: synthetic FASTA + BAM -> VCF records.

Single-end, non-converted reads tiling a small contig; expectations are
hand-derived from the reference's documented behavior (emission rules,
field layout, CpG annotations).
"""

import io

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller

# positions:            123456789012345678901234567890123456789012
SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40 bases


def make_fixture(tmp_path, qual=40, read_len=12):
    """One read per start position (coordinate-sorted; identical starts
    would trigger duplicate removal). Interior positions get read_len
    coverage."""
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    quals = np.full(read_len, qual, dtype=np.uint8)
    for n, pos in enumerate(range(0, 40 - read_len + 1)):
        w.write(
            f"r{n}",
            0,
            0,
            pos,
            60,
            [(read_len, 0)],
            -1,
            -1,
            0,
            SEQ[pos : pos + read_len],
            quals,
        )
    w.close()
    return str(ref), str(bam)


def parse_vcf(buf: bytes):
    sites = {}
    header = []
    for line in buf.decode().splitlines():
        if line.startswith("#"):
            header.append(line)
            continue
        f = line.split("\t")
        fmt = dict(zip(f[8].split(":"), f[9].split(":")))
        sites[int(f[1])] = {
            "chrom": f[0],
            "id": f[2],
            "ref": f[3],
            "alt": f[4],
            "qual": f[5],
            "filter": f[6],
            "info": f[7],
            **fmt,
        }
    return header, sites


@pytest.fixture(scope="module")
def called(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    ref, bam = make_fixture(tmp)
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        benchmark_mode=True,
        sample_name="S1",
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    return parse_vcf(out.getvalue())


def test_header_structure(called):
    header, _ = called
    assert header[0] == "##fileformat=VCFv4.2"
    assert any(l.startswith("##contig=<ID=chr1,length=40") for l in header)
    assert any("ID=MC8" in l for l in header)
    assert header[-1].endswith("\tS1")
    # benchmark mode: no date/source lines
    assert not any(l.startswith("##source") for l in header)


def test_sites_and_skips(called):
    _, sites = called
    # ref A positions called AA and ref T positions called TT are skipped
    # (hom-ref skip, print_vcf.c:139); C and G positions are emitted
    for pos in range(5, 25):
        base = SEQ[pos - 1]
        if base in "CG":
            assert pos in sites, f"missing site at {pos} ({base})"
        else:
            assert pos not in sites, f"unexpected site at {pos} ({base})"


def test_hom_ref_c_site(called):
    _, sites = called
    s = sites[14]  # an interior C position with full depth
    assert s["ref"] == "C"
    assert s["alt"] == "."
    assert s["GT"] == "0/0"
    assert s["CS"] == "+"
    assert int(s["DP"]) == 12
    mc8 = [int(v) for v in s["MC8"].split(",")]
    assert mc8[1] == 12 and sum(mc8) == 12
    assert s["AMQ"] == "40"
    # CX from reference: positions 12-16 = TACGT
    assert s["info"] == "CX=TACGT"
    assert s["CX"] == "TACGT"
    # C followed by called GG -> CpG; the reference emits one char
    # (print_vcf.c:366-368), so CpG status prints "C"
    assert s["CG"] == "C"
    assert s["filter"] == "PASS"


def test_hom_ref_g_site(called):
    _, sites = called
    s = sites[15]  # G position following the C
    assert s["ref"] == "G"
    assert s["GT"] == "0/0"
    assert s["CS"] == "-"
    assert s["CG"] == "C"


def test_gl_layout_hom_ref(called):
    _, sites = called
    s = sites[14]
    gl = s["GL"].split(",")
    # hom-ref with no ALT: all_idx[CC][C] = {0,0} -> single GL entry
    # (print_vcf.c:328 loop requires aix[i] > 0)
    assert len(gl) == 1
    assert float(gl[0]) > -1.0  # called genotype likelihood near 0
