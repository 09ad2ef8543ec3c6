"""BCF output round-trip and vcf.gz output tests."""

import gzip
import io

import numpy as np

from bs_call_tpu import constants as C
from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.io.bcf import BcfReader
from bs_call_tpu.pipeline.runner import run_caller

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


def make_fixture(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    for n, pos in enumerate(range(0, 28)):
        w.write(
            f"r{n}", 0, 0, pos, 60, [(12, 0)], -1, -1, 0,
            SEQ[pos : pos + 12], np.full(12, 40, np.uint8),
        )
    w.close()
    return str(ref), str(bam)


def run_with_type(tmp_path, ft):
    ref, bam = make_fixture(tmp_path)
    cfg = CallerConfig(
        input_file=bam,
        reference_file=ref,
        benchmark_mode=True,
        out_file_type=ft,
        sample_name="S1",
    )
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    return out.getvalue()


def test_bcf_roundtrip(tmp_path):
    data = run_with_type(tmp_path, C.FT_BCF_GZ)
    r = BcfReader(io.BytesIO(data))
    assert "##fileformat=VCFv4.2" in r.header_text
    recs = list(r)
    assert recs, "no BCF records"
    by_pos = {r["pos"]: r for r in recs}
    s = by_pos[14]
    assert s["chrom"] == "chr1"
    assert s["alleles"] == ["C"]
    assert s["filters"] == ["PASS"]
    assert s["info"]["CX"] == "TACGT"
    assert s["fmt"]["GT"] == [2, 2]  # 0/0 encoding
    assert s["fmt"]["DP"] == [12]
    assert s["fmt"]["MC8"] == [0, 12, 0, 0, 0, 0, 0, 0]
    assert s["fmt"]["CS"] == "+"
    assert s["fmt"]["CG"] == "CG"
    assert s["fmt"]["FT"] == "PASS"
    assert int(s["qual"]) == s["fmt"]["GQ"][0]


def test_vcf_gz_output(tmp_path):
    data = run_with_type(tmp_path, C.FT_VCF_GZ)
    text = gzip.decompress(data).decode()
    assert text.startswith("##fileformat=VCFv4.2")
    recs = [l for l in text.splitlines() if not l.startswith("#")]
    assert recs
    assert recs[0].split("\t")[0] == "chr1"


def test_bcf_matches_vcf_text(tmp_path):
    bcf_data = run_with_type(tmp_path, C.FT_BCF_GZ)
    vcf_data = run_with_type(tmp_path, C.FT_VCF)
    vcf_sites = {}
    for line in vcf_data.decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        vcf_sites[int(f[1])] = f
    bcf_sites = {r["pos"]: r for r in BcfReader(io.BytesIO(bcf_data))}
    assert set(vcf_sites) == set(bcf_sites)
    for pos, f in vcf_sites.items():
        b = bcf_sites[pos]
        assert f[3] == b["alleles"][0]
        assert f[6] == ";".join(b["filters"])
        fmt = dict(zip(f[8].split(":"), f[9].split(":")))
        assert int(fmt["DP"]) == b["fmt"]["DP"][0]
        assert int(fmt["GQ"]) == b["fmt"]["GQ"][0]
        assert fmt["CG"] == b["fmt"]["CG"]
