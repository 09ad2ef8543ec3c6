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
    assert s["fmt"]["CG"] == "C"  # one char, print_vcf.c:366
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


def test_bcf_with_dbsnp_and_duplicates(tmp_path):
    """BASELINE config 3 shape: dbSNP annotation + duplicate filtering
    with BCF output — rs IDs and records must match the text-VCF path."""
    rng = np.random.default_rng(6)
    ctg_len = 8000
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
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
    bases = "ACGT"
    k = 0
    for pos in np.sort(rng.integers(0, ctg_len - 120, 800)):
        pos = int(pos)
        rseq = list(seq[pos : pos + 100])
        for i in np.nonzero(rng.random(100) < 0.04)[0]:
            rseq[i] = bases[int(rng.integers(0, 4))]
        q = rng.integers(15, 44, 100).astype(np.uint8)
        reps = 2 if rng.random() < 0.15 else 1  # duplicate starts
        for _ in range(reps):
            w.write(
                f"r{k}", 0, 0, pos, 50, [(100, 0)], -1, -1, 0,
                "".join(rseq), q,
            )
            k += 1
    w.close()
    from bs_call_tpu.io.dbsnp_idx import DbSnpIndexBuilder

    b = DbSnpIndexBuilder(maf_limit=0.1)
    for p in np.sort(rng.choice(ctg_len - 10, 400, replace=False)):
        b.add_snp("chr1", int(p) + 1, f"rs{int(p)}",
                  maf=0.3 if p % 3 == 0 else -1.0)
    idx = tmp_path / "snp.bin"
    b.write(str(idx))
    outs = {}
    for ft in (C.FT_BCF_GZ, C.FT_VCF):
        cfg = CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, out_file_type=ft,
            dbsnp_file=str(idx),
        )
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs[ft] = out.getvalue()
    vcf_ids = {}
    for line in outs[C.FT_VCF].decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        vcf_ids[int(f[1])] = f[2]
    bcf_ids = {
        r["pos"]: (r["id"] or ".")
        for r in BcfReader(io.BytesIO(outs[C.FT_BCF_GZ]))
    }
    assert set(vcf_ids) == set(bcf_ids)
    assert vcf_ids == bcf_ids
    assert any(v.startswith("rs") for v in vcf_ids.values())


def test_uncompressed_bcf_output(tmp_path):
    """-O u emits the raw BCF stream with no BGZF framing (htslib 'wbu'
    semantics); record content equals the compressed -O b output."""
    raw = run_with_type(tmp_path, C.FT_BCF)
    comp = run_with_type(tmp_path, C.FT_BCF_GZ)
    assert raw.startswith(b"BCF\x02\x02")
    assert comp.startswith(b"\x1f\x8b")
    assert gzip.decompress(comp) == raw
    recs = list(BcfReader(io.BytesIO(raw)))
    assert len(recs) > 10
