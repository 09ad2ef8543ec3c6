"""Option surface tests: thresholds, conversion rates, duplicate modes,
keep-unmatched, CLI subprocess smoke."""

import io
import subprocess
import sys

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import (
    BamHeader,
    BamWriter,
    FDUP,
    FPAIRED,
    FPROPER_PAIR,
    FMREVERSE,
    FREVERSE,
    FREAD1,
    FREAD2,
)
from bs_call_tpu.pipeline.runner import run_caller

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


def simple_fixture(tmp_path, quals=40, mapq=60):
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
            f"r{n}", 0, 0, pos, mapq, [(12, 0)], -1, -1, 0,
            SEQ[pos : pos + 12], np.full(12, quals, np.uint8),
        )
    w.close()
    return str(ref), str(bam)


def run_sites(cfg):
    out = io.BytesIO()
    run_caller(cfg, out_fileobj=out)
    sites = {}
    for line in out.getvalue().decode().splitlines():
        if line.startswith("#"):
            continue
        f = line.split("\t")
        sites[int(f[1])] = dict(
            zip(f[8].split(":"), f[9].split(":")), filter=f[6]
        )
    return sites


def test_bq_threshold_excludes_bases(tmp_path):
    ref, bam = simple_fixture(tmp_path, quals=25)
    base = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True
    )
    s1 = run_sites(base)
    assert s1, "no sites"
    # -Q 30 excludes all q25 bases -> no coverage -> no sites
    hi = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True, min_qual=30
    )
    s2 = run_sites(hi)
    assert not s2


def test_mapq_threshold_filters_reads(tmp_path):
    ref, bam = simple_fixture(tmp_path, mapq=15)
    lo = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        mapq_thresh=10,
    )
    assert run_sites(lo)
    hi = CallerConfig(
        input_file=bam, reference_file=ref, benchmark_mode=True,
        mapq_thresh=20,
    )
    assert not run_sites(hi)


def test_keep_duplicates_doubles_depth(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    for n in range(2):  # same start position: duplicates
        w.write(
            f"r{n}", 0, 0, 4, 60, [(12, 0)], -1, -1, 0,
            SEQ[4:16], np.full(12, 40, np.uint8),
        )
    w.close()
    dedup = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True,
        )
    )
    keep = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, keep_duplicates=True,
        )
    )
    assert int(dedup[6]["DP"]) == 1
    assert int(keep[6]["DP"]) == 2


def test_flagged_duplicates_vs_ignore(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    # dup-flagged proper pair: --ignore-duplicates only affects the
    # paired branch (input_sam.c:242-243; unpaired dups always drop)
    f1 = FPAIRED | FPROPER_PAIR | FMREVERSE | FREAD1 | FDUP
    f2 = FPAIRED | FPROPER_PAIR | FREVERSE | FREAD2 | FDUP
    w.write(
        "d1", f1, 0, 4, 60, [(12, 0)], 0, 20, 28, SEQ[4:16],
        np.full(12, 40, np.uint8),
    )
    w.write(
        "d1", f2, 0, 20, 60, [(12, 0)], 0, 4, -28, SEQ[20:32],
        np.full(12, 40, np.uint8),
    )
    w.close()
    drop = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True,
        )
    )
    assert not drop  # duplicate-flagged pair filtered
    keep = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, ignore_duplicates=True,
        )
    )
    assert keep  # flag ignored for proper pairs


def test_conversion_rates_change_informative_calls(tmp_path):
    # C2T-strand T observations at a ref C: high over-conversion explains
    # them as converted methyl-free C; default rates lean toward CT/TT
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    from bs_call_tpu.io.bam import aux_tag

    w = BamWriter(str(bam), hdr)
    read = SEQ[0:12].replace("C", "T")  # all C converted
    for n in range(6):
        w.write(
            f"r{n}", 0, 0, n, 60, [(12, 0)], -1, -1, 0,
            (SEQ[n : n + 12]).replace("C", "T"),
            np.full(12, 40, np.uint8), aux_tag("XB", "A", "C"),
        )
    w.close()
    lo = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, under_conv=0.01, over_conv=0.05,
            all_positions=True,
        )
    )
    hi = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, under_conv=0.9, over_conv=0.05,
            all_positions=True,
        )
    )
    c_sites = [p for p in lo if SEQ[p - 1] == "C" and p in hi]
    assert c_sites
    # with under_conv=0.9 unconverted Cs are expected, so all-T evidence
    # should argue against CC more than at default rates
    diffs = [
        (lo[p]["GT"], hi[p]["GT"]) for p in c_sites
    ]
    assert any(a != b for a, b in diffs) or all(
        lo[p]["GT"] == "0/0" for p in c_sites
    )


def test_keep_unmatched_retains_widowed_mate(tmp_path):
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr1\n" + SEQ + "\n")
    bam = tmp_path / "in.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    # reverse-facing mate whose forward partner never appears
    f2 = FPAIRED | FPROPER_PAIR | FREVERSE | FREAD2
    w.write(
        "w1", f2, 0, 10, 60, [(12, 0)], 0, 2, -20, SEQ[10:22],
        np.full(12, 40, np.uint8),
    )
    w.close()
    drop = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True,
        )
    )
    keep = run_sites(
        CallerConfig(
            input_file=str(bam), reference_file=str(ref),
            benchmark_mode=True, keep_unmatched=True,
        )
    )
    assert len(keep) >= len(drop)


def test_haploid_and_blank_trim_accepted_noop(tmp_path):
    # parsed but unused in the reference (bs_call.h:309-311); accepted here
    ref, bam = simple_fixture(tmp_path)
    a = run_sites(
        CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
        )
    )
    b = run_sites(
        CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
            haploid=True, blank_trim=True,
        )
    )
    assert a == b


def test_cli_subprocess_smoke(tmp_path):
    ref, bam = simple_fixture(tmp_path)
    out = tmp_path / "o.vcf.gz"
    rep = tmp_path / "r.json"
    res = subprocess.run(
        [
            sys.executable, "-m", "bs_call_tpu.cli", bam, "-r", ref,
            "-o", str(out), "-n", "S", "--benchmark-mode",
            "--report-file", str(rep), "--device", "numpy",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    import gzip
    import json

    text = gzip.decompress(out.read_bytes()).decode()
    assert "##fileformat=VCFv4.2" in text
    json.loads(rep.read_text())
