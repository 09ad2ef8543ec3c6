"""dbSNP index build + read round-trip and e2e annotation."""

import io

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.io.dbsnp import DbSnpIndex
from bs_call_tpu.io.dbsnp_idx import DbSnpIndexBuilder
from bs_call_tpu.pipeline.runner import run_caller

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


def test_roundtrip_bed(tmp_path):
    b = DbSnpIndexBuilder(header="track name=test")
    # BED convention: pos = end coordinate (1-based position)
    b.add_snp("chr1", 14, "rs123")
    b.add_snp("chr1", 100, "rs4567")
    b.add_snp("chr1", 101, "rs89")
    b.add_snp("chr2", 7, "ss42")
    p = tmp_path / "idx.bin"
    b.write(str(p))
    idx = DbSnpIndex(str(p))
    assert idx.header_line == "name=test"
    assert set(idx.contigs) == {"chr1", "chr2"}
    c1 = idx.load_contig("chr1")
    assert c1.lookup(14) == (1, "rs123\x00")
    assert c1.lookup(100) == (1, "rs4567")
    assert c1.lookup(101) == (1, "rs89")
    assert c1.lookup(15) == (0, "")
    assert c1.lookup(6400) == (0, "")
    c2 = idx.load_contig("chr2")
    assert c2.lookup(7) == (1, "ss42")


def test_roundtrip_odd_digits_and_selection(tmp_path):
    b = DbSnpIndexBuilder(maf_limit=0.1)
    b.add_snp("chr1", 5, "rs1", maf=0.3)   # selected
    b.add_snp("chr1", 9, "rs22", maf=0.05)  # not selected
    p = tmp_path / "idx.bin"
    b.write(str(p))
    idx = DbSnpIndex(str(p))
    c = idx.load_contig("chr1")
    assert c.lookup(5) == (3, "rs1\x00")   # maf-selected -> res 3
    assert c.lookup(9) == (1, "rs22")


def test_select_list_and_aliases(tmp_path):
    b = DbSnpIndexBuilder(
        select_names=["rs7"], aliases={"NC_1": "chr1"}
    )
    b.add_snp("NC_1", 5, "rs7")
    b.add_snp("unknown_ctg", 9, "rs8")  # dropped (no alias)
    p = tmp_path / "idx.bin"
    b.write(str(p))
    idx = DbSnpIndex(str(p))
    assert list(idx.contigs) == ["chr1"]
    c = idx.load_contig("chr1")
    assert c.lookup(5) == (3, "rs7\x00")


def test_bed_vcf_json_parsing(tmp_path):
    b = DbSnpIndexBuilder()
    b.read_stream(
        io.StringIO(
            "track name=dbSNP153\n"
            "chr1\t13\t14\trs100\t0\n"
            "chr1\t20\t22\trs_bad\t0\n"  # not a SNP (len 2)
        )
    )
    assert b.n_snps == 1
    b2 = DbSnpIndexBuilder()
    b2.read_stream(
        io.StringIO(
            "##fileformat=VCFv4.0\n"
            "#CHROM\tPOS\tID\tREF\tALT\n"
            "chr1\t14\trs100\tC\tT\n"
            "chr1\t15\trs101\tCT\tT\n"  # indel: skipped
        )
    )
    assert b2.n_snps == 1
    import json as _json

    rec = {
        "refsnp_id": "999",
        "primary_snapshot_data": {
            "placements_with_allele": [
                {
                    "is_ptlp": True,
                    "alleles": [
                        {
                            "allele": {
                                "spdi": {
                                    "seq_id": "chr1",
                                    "position": 13,
                                    "deleted_sequence": "C",
                                    "inserted_sequence": "T",
                                }
                            }
                        }
                    ],
                }
            ],
            "allele_annotations": [
                {
                    "frequency": [
                        {
                            "study_name": "X",
                            "allele_count": 30,
                            "total_count": 100,
                            "observation": {
                                "deleted_sequence": "C",
                                "inserted_sequence": "T",
                            },
                        }
                    ]
                }
            ],
        },
    }
    b3 = DbSnpIndexBuilder(maf_limit=0.2)
    b3.read_stream(io.StringIO(_json.dumps(rec) + "\n"))
    assert b3.n_snps == 1
    p = tmp_path / "j.bin"
    b3.write(str(p))
    c = DbSnpIndex(str(p)).load_contig("chr1")
    assert c.lookup(13) == (3, "rs999\x00")  # maf 0.3 >= 0.2 -> selected


def test_e2e_annotation(tmp_path):
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
    b = DbSnpIndexBuilder(maf_limit=0.1)
    b.add_snp("chr1", 14, "rs14")       # a C site
    b.add_snp("chr1", 17, "rs17sel", maf=0.4)  # an A site, maf-selected
    idxp = tmp_path / "dbsnp.bin"
    b.write(str(idxp))
    cfg = CallerConfig(
        input_file=str(bam),
        reference_file=str(ref),
        dbsnp_file=str(idxp),
        benchmark_mode=True,
    )
    out = io.BytesIO()
    from bs_call_tpu.stats.collect import BsStats

    stats = BsStats()
    run_caller(cfg, out_fileobj=out, stats=stats)
    sites = {}
    for line in out.getvalue().decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        sites[int(f[1])] = f
    assert sites[14][2] == "rs14"
    # maf-selected site forces emission of an AA hom-ref position
    # (print_vcf.c:139, rs_found & 2)
    assert 17 in sites and sites[17][2] == "rs17sel"
    assert 13 not in sites  # plain A site still skipped
    assert stats.dbSNP_sites[0] == 2


def test_idx_cli_compressed_inputs(tmp_path):
    """dbsnp_idx sniffs gzip/bzip2/xz by magic bytes, matching the
    reference's decompression-filter support (dbSNP_utils.c:163-242)."""
    import bz2
    import gzip
    import lzma

    from bs_call_tpu.io.dbsnp import DbSnpIndex
    from bs_call_tpu.io.dbsnp_idx import main as idx_main

    bed = (
        "track name=t\n"
        "chr1\t99\t100\trs100\t0\n"
        "chr1\t199\t200\trs200\t0\n"
    ).encode()
    for name, comp in (
        ("a.dat", gzip.compress),
        ("b.dat", bz2.compress),
        ("c.dat", lzma.compress),
        ("d.dat", bytes),  # plain
    ):
        p = tmp_path / name
        p.write_bytes(comp(bed))
        out = str(tmp_path / (name + ".idx"))
        assert idx_main([str(p), "-o", out]) == 0
        ctg = DbSnpIndex(out).load_contig("chr1")
        assert ctg.lookup(100) == (1, "rs100\x00")
        assert ctg.lookup(200) == (1, "rs200\x00")


def test_idx_parallel_byte_identical(tmp_path):
    """-@ N (parallel readers + deflate pool) must produce the exact
    bytes of the serial build, including cross-file duplicate positions
    and prefix-table order (dbSNP_idx.c:53-93 pipeline analogue)."""
    import subprocess
    import sys as _sys

    rng = __import__("numpy").random.default_rng(4)
    files = []
    for fi in range(4):
        p = tmp_path / f"part{fi}.bed"
        with open(p, "w") as f:
            if fi == 0:
                f.write("track name=par\n")
            for k in range(3000):
                pos = int(rng.integers(1, 500000))
                ctg = f"chr{int(rng.integers(1, 4))}"
                # <= 3 distinct prefixes: the reference's >=4-prefix
                # escape has a writer-LE/reader-BE mismatch that the
                # format reproduces verbatim (dbSNP.c:332)
                pref = ["rs", "ss", "esv"][int(rng.integers(0, 3))]
                f.write(f"{ctg}\t{pos - 1}\t{pos}\t{pref}{pos}\t0\n")
            # cross-file duplicate positions (first file wins)
            f.write(f"chr1\t99\t100\trs77{fi}\t0\n")
        files.append(str(p))
    out_s = tmp_path / "serial.bin"
    out_p = tmp_path / "par.bin"
    env = None
    r1 = subprocess.run(
        [_sys.executable, "-m", "bs_call_tpu.io.dbsnp_idx",
         *files, "-o", str(out_s)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run(
        [_sys.executable, "-m", "bs_call_tpu.io.dbsnp_idx",
         *files, "-o", str(out_p), "-@", "4"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r2.returncode == 0, r2.stderr
    assert out_s.read_bytes() == out_p.read_bytes()
    # and it still loads
    idx = DbSnpIndex(str(out_p))
    assert idx.header_line == "name=par"
    c1 = idx.load_contig("chr1")
    assert c1.lookup(100)[0] == 1


def test_idx_parallel_fallback_shared_contig(tmp_path):
    """Files sharing a contig defeat the fast section-concat path; the
    build must detect it, fall back, and still be byte-identical."""
    import subprocess
    import sys as _sys

    files = []
    for fi in range(2):
        p = tmp_path / f"f{fi}.bed"
        with open(p, "w") as f:
            for k in range(50):
                pos = 10 + fi * 1000 + k * 7
                f.write(f"chr1\t{pos - 1}\t{pos}\trs{fi}{k}\t0\n")
            # one colliding position across both files
            f.write("chr1\t499\t500\trs9999\t0\n")
        files.append(str(p))
    out_s = tmp_path / "s.bin"
    out_p = tmp_path / "p.bin"
    for out, extra in ((out_s, []), (out_p, ["-@", "2"])):
        r = subprocess.run(
            [_sys.executable, "-m", "bs_call_tpu.io.dbsnp_idx",
             *files, "-o", str(out), *extra],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr
    assert out_s.read_bytes() == out_p.read_bytes()
