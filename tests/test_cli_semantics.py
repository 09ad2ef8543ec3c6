"""CLI-level semantics: dbSNP report sections, -t thread partition,
binary-to-tty guard (parse_args.c:187-213, stats.c:52-54/290-292)."""

import json
import os
import subprocess
import sys

import numpy as np

from bs_call_tpu.cli import args_to_config, build_parser
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.io.dbsnp_idx import DbSnpIndexBuilder

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


def _fixture(tmp_path):
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
        seq = list(SEQ[pos : pos + 12])
        # homozygous A->T SNP at 1-based position 21 so contigStats
        # (gated on snps[all] > 0, stats.c:284) has a chr1 entry
        if pos <= 20 < pos + 12:
            seq[20 - pos] = "T"
        w.write(
            f"r{n}", 0, 0, pos, 60, [(12, 0)], -1, -1, 0,
            "".join(seq), np.full(12, 40, np.uint8),
        )
    w.close()
    return str(ref), str(bam)


def test_cli_dbsnp_report_sections(tmp_path):
    """A -D run's JSON report must carry dbSNPSites/dbSNPVariantSites in
    totalStats AND contigStats (stats.c:52-54, 290-292)."""
    ref, bam = _fixture(tmp_path)
    b = DbSnpIndexBuilder(header="track name=t")
    for pos in (5, 10, 15):
        b.add_snp("chr1", pos, "rs%d" % pos)
    dbsnp = tmp_path / "idx.bin"
    b.write(str(dbsnp))
    out = tmp_path / "o.vcf"
    rep = tmp_path / "r.json"
    res = subprocess.run(
        [
            sys.executable, "-m", "bs_call_tpu.cli", bam, "-r", ref,
            "-o", str(out), "-D", str(dbsnp), "--benchmark-mode",
            "--report-file", str(rep), "--device", "numpy", "-A",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    doc = json.loads(rep.read_text())
    assert "dbSNPSites" in doc["totalStats"]
    assert "dbSNPVariantSites" in doc["totalStats"]
    ctg = doc["contigStats"]["chr1"]
    assert "dbSNPSites" in ctg
    # the three dbSNP positions are covered, so the counter must be live
    assert doc["totalStats"]["dbSNPSites"]["All"] >= 3


def _cfg(argv):
    return args_to_config(build_parser().parse_args(argv))


def test_thread_triple_explicit(tmp_path):
    ref, bam = _fixture(tmp_path)
    cfg = _cfg([bam, "-r", ref, "-t", "5,2,3"])
    assert cfg.threads == 5
    assert cfg.input_threads == 2
    assert cfg.output_threads == 3


def test_thread_auto_partition(tmp_path):
    """Lone -t N auto-splits ~4:3:3; shares only for compressed streams
    (parse_args.c:194-213)."""
    ref, bam = _fixture(tmp_path)
    # BAM input (compressed), plain VCF to file: input share only
    cfg = _cfg([bam, "-r", ref, "-t", "10", "-o", str(tmp_path / "o.vcf")])
    # nn=7 -> input = 10*3//7 = 4, calc = 6, output = 0
    assert cfg.input_threads == 4
    assert cfg.output_threads == 0
    assert cfg.threads == 6
    # BAM input + vcf.gz output: both shares
    cfg = _cfg(
        [bam, "-r", ref, "-t", "10", "-o", str(tmp_path / "o.vcf.gz")]
    )
    # nn=10 -> input = 3, k=7, nn=7 -> output = 3, calc = 4
    assert cfg.input_threads == 3
    assert cfg.output_threads == 3
    assert cfg.threads == 4


def test_binary_to_tty_guard(tmp_path, monkeypatch):
    """-O b with no -o on a terminal downgrades to plain VCF
    (parse_args.c:187-190)."""
    import bs_call_tpu.constants as C

    ref, bam = _fixture(tmp_path)
    monkeypatch.setattr(sys.stdout, "isatty", lambda: True)
    cfg = _cfg([bam, "-r", ref, "-O", "b"])
    assert cfg.out_file_type == C.FT_VCF
    # ...but not when -o is given
    cfg = _cfg([bam, "-r", ref, "-O", "b", "-o", str(tmp_path / "o.bcf")])
    assert cfg.out_file_type == C.FT_BCF_GZ


def test_shards_dbsnp_report_matches_single(tmp_path):
    """--shards with -D + --report-file: concatenated VCF and merged
    report (incl. dbSNP sections) byte-identical to single-process."""
    ref, bam = _fixture(tmp_path)
    b = DbSnpIndexBuilder(header="track name=t")
    for pos in (5, 10, 15, 21):
        b.add_snp("chr1", pos, "rs%d" % pos)
    dbsnp = tmp_path / "idx.bin"
    b.write(str(dbsnp))
    outs = {}
    for tag, extra in (("single", []), ("sharded", ["--shards", "2"])):
        out = tmp_path / f"{tag}.vcf"
        rep = tmp_path / f"{tag}.json"
        res = subprocess.run(
            [
                sys.executable, "-m", "bs_call_tpu.cli", bam, "-r", ref,
                "-o", str(out), "-D", str(dbsnp), "--benchmark-mode",
                "--report-file", str(rep), "--device", "numpy", *extra,
            ],
            capture_output=True, text=True, timeout=300,
            # actually shard on small-core test hosts (the CLI
            # auto-degrades --shards to single-process below 9 cores)
            env={**os.environ, "BS_CALL_FORCE_SHARDS": "1"},
        )
        assert res.returncode == 0, res.stderr[-2000:]
        doc = json.loads(rep.read_text())
        doc.pop("date", None)
        outs[tag] = (out.read_bytes(), doc)
    assert outs["single"][0] == outs["sharded"][0]
    assert outs["single"][1] == outs["sharded"][1]
    assert "dbSNPSites" in outs["sharded"][1]["totalStats"]
