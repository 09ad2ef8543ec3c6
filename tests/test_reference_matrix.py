"""Extended byte-parity matrix against the compiled reference binary.

VERDICT r03 items 4+5: the round-3 suite diffed only default, -A and
per-contig runs against the real binary; every other flag was pinned
only to the in-repo transcription. This module parametrizes the flag
matrix (trims, thresholds, duplicate handling, conversion rates,
reference bias, haploid) plus the JSON report and the dbSNP round trip
through the REAL compiled reference (tools/htslib_shim build).

Known divergence (excluded below, documented in README.md): the
reference's filterStats.ReadLevel.Passed.Reads counts phantom empty
read-ends — its align-object pool keeps recycled read vectors non-NULL
(al_utils.c:55-62), the mate-pairing path swaps read-vector identities
between aligns (get_template_vector.c:231-238), and process_template.c
:50-62 then counts any non-NULL (even empty, zero-base) vector as a
passed read. The count depends on pool recycling order, i.e. on the
allocator history, not the data; we count actual read-ends.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

from tests.test_reference_binary import (  # noqa: F401  (fixture reuse)
    _fixture,
    _run_c,
    _run_py,
    ref_binary,
)

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def matrix_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refmatrix")
    ref, bam, n = _fixture(tmp, n_reads=2500, ctg_len=40_000)
    return tmp, ref, bam


FLAG_CASES = [
    pytest.param(["-L", "5,3"], id="left-trim-asym"),
    pytest.param(["-R", "4,6"], id="right-trim-asym"),
    pytest.param(["-L", "2,2", "-R", "3,1", "-B"], id="blank-trim"),
    pytest.param(["-q", "0"], id="mapq0"),
    pytest.param(["-q", "40"], id="mapq40"),
    pytest.param(["-Q", "13"], id="bq13"),
    pytest.param(["-k"], id="keep-unmatched"),
    pytest.param(["-d"], id="keep-duplicates"),
    pytest.param(["--ignore-duplicates"], id="ignore-duplicates"),
    pytest.param(["-c", "0.002,0.02"], id="conversion"),
    pytest.param(["--reference-bias", "1"], id="refbias1"),
    pytest.param(["--reference-bias", "5.5"], id="refbias5.5"),
    pytest.param(["-1"], id="haploid"),
    pytest.param(["-l", "300"], id="max-template-300"),
    pytest.param(["-A", "-q", "10", "-Q", "26"], id="all-pos-thresholds"),
]


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_flag_matrix_byte_identity(ref_binary, matrix_fixture, flags):
    tmp, ref, bam = matrix_fixture
    tag = "".join(c if c.isalnum() else "_" for c in "".join(flags))
    c_out = tmp / f"c_{tag}.vcf"
    p_out = tmp / f"p_{tag}.vcf"
    _run_c(ref_binary, bam, ref, c_out, list(flags))
    _run_py(bam, ref, p_out, list(flags))
    assert c_out.read_bytes() == p_out.read_bytes()


def _strip_known_divergences(report_text):
    rep = json.loads(report_text)
    rep.pop("date", None)
    rl = rep.get("filterStats", {}).get("ReadLevel", {})
    if "Passed" in rl:
        # phantom empty read-ends: pool-history-dependent in the
        # reference (see module docstring)
        rl["Passed"].pop("Reads", None)
    return rep


def test_report_identity(ref_binary, matrix_fixture):
    """Full JSON report equality vs the compiled reference, modulo the
    documented Passed.Reads pool artifact. Covers filterStats,
    totalStats (incl. the advanced-alt SNPS quirk), QC distributions,
    coverage maps, quality hists, mutation spectrum, methylation grids
    and NonCpGreadProfile (stats.c:19-298)."""
    tmp, ref, bam = matrix_fixture
    _run_c(ref_binary, bam, ref, tmp / "cr.vcf",
           ["--report-file", str(tmp / "cr.json")])
    _run_py(bam, ref, tmp / "pr.vcf",
            ["--report-file", str(tmp / "pr.json")])
    assert (tmp / "cr.vcf").read_bytes() == (tmp / "pr.vcf").read_bytes()
    c = _strip_known_divergences((tmp / "cr.json").read_text())
    p = _strip_known_divergences((tmp / "pr.json").read_text())
    assert c == p


def test_report_identity_all_positions(ref_binary, matrix_fixture):
    """-A exercises the SNPS quirk on hom-ref rows too: the reference
    counts EVERY emitted row as a SNP (print_vcf.c:400 reads alt's NUL
    terminator after :177-181 advanced it)."""
    tmp, ref, bam = matrix_fixture
    _run_c(ref_binary, bam, ref, tmp / "cra.vcf",
           ["-A", "--report-file", str(tmp / "cra.json")])
    _run_py(bam, ref, tmp / "pra.vcf",
            ["-A", "--report-file", str(tmp / "pra.json")])
    c = _strip_known_divergences((tmp / "cra.json").read_text())
    p = _strip_known_divergences((tmp / "pra.json").read_text())
    assert c == p
    # and the quirk itself: SNPS.All == number of emitted records
    rows = sum(
        1 for ln in (tmp / "cra.vcf").read_bytes().splitlines()
        if ln and not ln.startswith(b"#")
    )
    assert c["totalStats"]["SNPS"]["All"] == rows
    assert c["totalStats"]["Multiallelic"]["All"] == 0


# ---- dbSNP round trip through both binaries (VERDICT item 5) ----


@pytest.fixture(scope="module")
def dbsnp_inputs(matrix_fixture):
    tmp, ref, bam = matrix_fixture
    bed = tmp / "snps.bed"
    with open(bed, "w") as f:
        f.write("track name=testdb\n")
        for pos in range(100, 39_000, 97):
            # 5 columns: the reference's parse_bed_line requires
            # n_tok > 4 (dbSNP_input.c:122) — 4-column BEDs are
            # silently ignored by the real binary
            f.write(f"chr1\t{pos}\t{pos + 1}\trs{pos * 3 + 1}\t0\n")
    return tmp, ref, bam, bed


def _ref_idx_binary(ref_binary):
    cand = ref_binary.parent / "dbSNP_idx"
    if not cand.exists():
        pytest.skip("reference dbSNP_idx not built")
    return cand


def test_dbsnp_index_byte_identity(ref_binary, dbsnp_inputs):
    """Our dbsnp_idx and the reference's dbSNP_idx produce the SAME
    index bytes from the same BED (the format has no timestamps:
    dbSNP_output.c:139-182)."""
    tmp, ref, bam, bed = dbsnp_inputs
    idx_bin = _ref_idx_binary(ref_binary)
    ours = tmp / "ours.idx"
    theirs = tmp / "theirs.idx"
    r = subprocess.run(
        [sys.executable, "-m", "bs_call_tpu.io.dbsnp_idx",
         "-o", str(ours), str(bed)],
        capture_output=True, cwd=str(REPO),
        env={**os.environ, "PYTHONPATH": os.pathsep.join(
            p for p in (str(REPO), os.environ.get("PYTHONPATH")) if p
        )},
    )
    assert r.returncode == 0, r.stderr[-500:]
    r = subprocess.run(
        [str(idx_bin), "-o", str(theirs), str(bed)],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert ours.read_bytes() == theirs.read_bytes()


def test_dbsnp_cross_binary_calls(ref_binary, dbsnp_inputs):
    """4-way -D identity: {our caller, reference caller} x {our index,
    reference index} all emit the same bytes (rs names in ID, the
    dbSNP AA/TT emission gate print_vcf.c:133-139, dbSNP.c:306-350)."""
    tmp, ref, bam, bed = dbsnp_inputs
    idx_bin = _ref_idx_binary(ref_binary)
    ours = tmp / "ours2.idx"
    theirs = tmp / "theirs2.idx"
    env = {**os.environ, "PYTHONPATH": os.pathsep.join(
        p for p in (str(REPO), os.environ.get("PYTHONPATH")) if p
    )}
    subprocess.run(
        [sys.executable, "-m", "bs_call_tpu.io.dbsnp_idx", "-o",
         str(ours), str(bed)],
        check=True, capture_output=True, cwd=str(REPO), env=env,
    )
    subprocess.run(
        [str(idx_bin), "-o", str(theirs), str(bed)],
        check=True, capture_output=True,
    )
    outs = {}
    for idx_name, idx in (("ours", ours), ("theirs", theirs)):
        c_out = tmp / f"c_{idx_name}.vcf"
        p_out = tmp / f"p_{idx_name}.vcf"
        _run_c(ref_binary, bam, ref, c_out, ["-D", str(idx)])
        _run_py(bam, ref, p_out, ["-D", str(idx)])
        outs[f"c_{idx_name}"] = c_out.read_bytes()
        outs[f"p_{idx_name}"] = p_out.read_bytes()
    assert len(set(outs.values())) == 1, {
        k: len(v) for k, v in outs.items()
    }
    # rs names actually landed in the output
    assert b"\trs" in outs["c_ours"]


# ---------------------------------------------------------------------------
# Cross-binary BCF (VERDICT r04 item 6): the shim now implements real
# binary bcf_hdr_write/bcf_write (BCF2.2 framing; the typed streams are
# encoded by print_vcf.c itself through bcf_enc_*), so -O u/b/z can be
# validated against the compiled reference instead of an in-repo golden.


def test_bcf_u_cross_binary_byte_identity(ref_binary, matrix_fixture):
    """-O u (uncompressed BCF): whole-file byte identity — magic,
    l_text, header text, and every BCF2.2 record (framing + typed
    streams) must match the reference+htslib encoding exactly."""
    tmp, ref, bam = matrix_fixture
    _run_c(ref_binary, bam, ref, tmp / "c.bcf", extra=["-O", "u"])
    _run_py(bam, ref, tmp / "py.bcf", extra=["-O", "u"])
    c = (tmp / "c.bcf").read_bytes()
    p = (tmp / "py.bcf").read_bytes()
    assert c[:5] == b"BCF\x02\x02"
    assert c == p


@pytest.mark.parametrize("otype", ["b", "z"])
def test_compressed_cross_binary_stream_identity(
    ref_binary, matrix_fixture, otype
):
    """-O b (BGZF BCF) and -O z (bgzip VCF): the DECOMPRESSED streams
    must be byte-identical (BGZF block framing is writer-dependent, so
    raw container bytes are not comparable)."""
    import gzip

    tmp, ref, bam = matrix_fixture
    _run_c(ref_binary, bam, ref, tmp / f"c.{otype}", extra=["-O", otype])
    _run_py(bam, ref, tmp / f"py.{otype}", extra=["-O", otype])
    with gzip.open(tmp / f"c.{otype}") as f:
        c = f.read()
    with gzip.open(tmp / f"py.{otype}") as f:
        p = f.read()
    assert c == p
    if otype == "b":
        assert c[:5] == b"BCF\x02\x02"


# ---------------------------------------------------------------------------
# The reference's multi-contig tail-loss race (found round 5, documented
# in README.md "Documented divergences"): in a sequential multi-contig
# run, processing the NEXT contig's first block calls
# get_sequence_string -> free_sequence(prev_ctg) (get_sequence.c:24,
# read_reference.c:35-42), which zeroes prev_ctg->end_pos WHILE the
# printer thread is still draining the previous contig's final block;
# _print_vcf_entry then silently drops every remaining row through
# `skip = x > ctg->end_pos` (print_vcf.c:158). Net effect: the final
# pileup block of every non-final contig is lost. The reference's OWN
# production per-contig workflow (-C, README.md:73-76) does not hit the
# race and byte-matches our multi-contig output — so we keep the
# correct rows rather than reproducing a thread-timing-dependent loss.


def _records_by_contig(path):
    out = {}
    for line in pathlib.Path(path).read_bytes().split(b"\n"):
        if not line or line.startswith(b"#"):
            continue
        out.setdefault(line.split(b"\t", 1)[0].decode(), []).append(line)
    return out


def test_reference_multicontig_tail_loss_race(ref_binary, tmp_path):
    sys.path.insert(0, str(REPO))
    from bs_call_tpu.utils.synth import make_wgbs_fixture

    ref, bam, _n = make_wgbs_fixture(
        str(tmp_path), 800, 12_000, n_contigs=3
    )
    # reference, sequential multi-contig (racy path)
    _run_c(ref_binary, bam, ref, tmp_path / "c_seq.vcf")
    # reference, its own production per-contig mode (correct path)
    per_contig = {}
    for i in (1, 2, 3):
        bed = tmp_path / f"chr{i}.bed"
        bed.write_text(f"chr{i}\t0\t12000\n")
        _run_c(ref_binary, bam, ref, tmp_path / f"c_chr{i}.vcf",
               extra=["-C", str(bed)])
        per_contig.update(_records_by_contig(tmp_path / f"c_chr{i}.vcf"))
    # ours, multi-contig single process
    _run_py(bam, ref, tmp_path / "py.vcf")
    ours = _records_by_contig(tmp_path / "py.vcf")
    racy = _records_by_contig(tmp_path / "c_seq.vcf")

    # ours == the reference's own per-contig (non-racy) output
    assert ours == per_contig
    # the racy run lost a SUFFIX of rows on non-final contigs only
    assert racy.get("chr3") == ours.get("chr3")
    lost_any = False
    for c in ("chr1", "chr2"):
        n = len(racy.get(c, []))
        assert racy.get(c, []) == ours[c][:n]  # strict prefix property
        lost_any = lost_any or n < len(ours[c])
    # the race is timing-dependent in principle; on every observed run
    # it fires, but the invariants above are what we guarantee
    assert lost_any, (
        "reference did not drop any tail rows this run — race did not "
        "fire; invariants above still verified"
    )


def test_partial_region_cross_binary_byte_identity(
    ref_binary, matrix_fixture
):
    """-C with PARTIAL windows against the real binary: the shim now
    loads the .bai and serves sam_itr_queryi/sam_itr_next (round 5), so
    the reference takes its real indexed-iteration path — emission
    gated to the windows (print_vcf.c:156). First cross-binary
    validation of partial-region semantics (whole-contig -C was covered
    before; without an index the reference silently ignores partial
    windows entirely)."""
    tmp, ref, bam = matrix_fixture
    from bs_call_tpu.io.bai import write_bai

    if not os.path.exists(str(bam) + ".bai"):
        write_bai(str(bam))
    bed = tmp / "part.bed"
    bed.write_text("chr1\t3000\t11000\n")
    _run_c(ref_binary, bam, ref, tmp / "c_part.vcf",
           extra=["-C", str(bed)])
    _run_py(bam, ref, tmp / "py_part.vcf", extra=["-C", str(bed)])
    c = (tmp / "c_part.vcf").read_bytes()
    p = (tmp / "py_part.vcf").read_bytes()
    assert c == p
    assert c.count(b"\nchr1\t") > 100


def test_multi_region_divergence_pinned(ref_binary, matrix_fixture):
    """Two -C windows on one contig: the reference drops every region
    after the first (ctg->curr_reg is set once per contig,
    get_template_vector.c:122, and the printer gates on it,
    print_vcf.c:156) — the documented divergence in README.md. Pin the
    exact relationship: the reference's output equals ours restricted
    to the first window."""
    tmp, ref, bam = matrix_fixture
    from bs_call_tpu.io.bai import write_bai

    if not os.path.exists(str(bam) + ".bai"):
        write_bai(str(bam))
    bed = tmp / "multi.bed"
    bed.write_text("chr1\t3000\t11000\nchr1\t15000\t26000\n")
    _run_c(ref_binary, bam, ref, tmp / "c_multi.vcf",
           extra=["-C", str(bed)])
    _run_py(bam, ref, tmp / "py_multi.vcf", extra=["-C", str(bed)])

    def recs(path):
        return [
            l for l in (tmp / path).read_bytes().split(b"\n")
            if l and not l.startswith(b"#")
        ]

    ours = recs("py_multi.vcf")
    theirs = recs("c_multi.vcf")
    in_w1 = [r for r in ours if int(r.split(b"\t")[1]) <= 11000]
    in_w2 = [r for r in ours if int(r.split(b"\t")[1]) > 11000]
    assert theirs == in_w1  # reference == ours restricted to window 1
    assert len(in_w2) > 100  # we really do call the second window


def test_bcf_u_with_dbsnp_cross_binary(ref_binary, dbsnp_inputs):
    """-O u + -D: the BCF typed-stream encoding of dbSNP rs IDs
    (including the odd-digit trailing-NUL quirk inside a BCF CHAR
    vector) must be byte-identical to the reference."""
    tmp, ref, bam, bed = dbsnp_inputs
    idx_bin = _ref_idx_binary(ref_binary)
    idx = tmp / "bcfdb.idx"
    subprocess.run(
        [str(idx_bin), "-o", str(idx), str(bed)],
        check=True, capture_output=True,
    )
    _run_c(ref_binary, bam, ref, tmp / "c_db.bcf",
           extra=["-D", str(idx), "-O", "u"])
    _run_py(bam, ref, tmp / "py_db.bcf",
            extra=["-D", str(idx), "-O", "u"])
    c = (tmp / "c_db.bcf").read_bytes()
    p = (tmp / "py_db.bcf").read_bytes()
    assert c == p
    assert b"rs" in c  # rs names actually present in the stream


def test_contig_sizes_uniform_header_cross_binary(ref_binary, tmp_path):
    """-C one contig + -s listing the full universe: the VCF header must
    carry ##contig lines for EVERY -s contig (the uniform-header
    contract that makes sharded outputs concat-compatible,
    process_sam_header.c:52-70) — byte-identical to the reference."""
    sys.path.insert(0, str(REPO))
    from bs_call_tpu.io.bai import write_bai
    from bs_call_tpu.utils.synth import make_wgbs_fixture

    ref, bam, _n = make_wgbs_fixture(
        str(tmp_path), 600, 8000, seed=9, n_contigs=3
    )
    write_bai(bam)
    sizes = tmp_path / "sizes.txt"
    sizes.write_text("chr1\t8000\nchr2\t8000\nchr3\t8000\n")
    bed = tmp_path / "one.bed"
    bed.write_text("chr2\t0\t8000\n")
    _run_c(ref_binary, bam, ref, tmp_path / "c.vcf",
           extra=["-C", str(bed), "-s", str(sizes)])
    _run_py(bam, ref, tmp_path / "py.vcf",
            extra=["-C", str(bed), "-s", str(sizes)])
    c = (tmp_path / "c.vcf").read_bytes()
    p = (tmp_path / "py.vcf").read_bytes()
    assert c == p
    for name in (b"chr1", b"chr2", b"chr3"):
        assert b"##contig=<ID=" + name in c  # full -s universe present
    # records only for the called contig
    assert c.count(b"\nchr2\t") > 50
    assert c.count(b"\nchr1\t") == 0 and c.count(b"\nchr3\t") == 0


def test_report_identity_with_dbsnp(ref_binary, dbsnp_inputs):
    """-D + --report-file: the dbSNP report sections (dbSNPSites /
    dbSNPVariantSites in totalStats AND per-contig) must match the
    compiled reference, alongside the rest of the report."""
    tmp, ref, bam, bed = dbsnp_inputs
    idx_bin = _ref_idx_binary(ref_binary)
    idx = tmp / "repdb.idx"
    subprocess.run(
        [str(idx_bin), "-o", str(idx), str(bed)],
        check=True, capture_output=True,
    )
    _run_c(ref_binary, bam, ref, tmp / "crd.vcf",
           ["-D", str(idx), "--report-file", str(tmp / "crd.json")])
    _run_py(bam, ref, tmp / "prd.vcf",
            ["-D", str(idx), "--report-file", str(tmp / "prd.json")])
    assert (tmp / "crd.vcf").read_bytes() == (tmp / "prd.vcf").read_bytes()
    c = _strip_known_divergences((tmp / "crd.json").read_text())
    p = _strip_known_divergences((tmp / "prd.json").read_text())
    assert c == p
    assert c["totalStats"]["dbSNPSites"]["All"] > 0
