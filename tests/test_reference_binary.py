"""Cross-validation against the REAL reference C binary.

tools/htslib_shim lets the reference bs_call 2.1.7 sources compile in
this environment (BASELINE.md's open action item). These tests build the
binary once per session and assert that bs_call_tpu's output is
byte-identical to it — the strongest parity anchor in the suite: every
field of every record, including the FT embedded-NUL and CG one-char
quirks (print_vcf.c:283-296, 366-368), must agree with the actual
compiled reference implementation, not a transcription of it."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
BUILD = pathlib.Path("/tmp/bsref")
BIN = BUILD / "bin" / "bs_call"
REF_TREE = pathlib.Path(
    os.environ.get("BS_CALL_REFERENCE", "/root/reference")
)


@pytest.fixture(scope="session")
def ref_binary():
    if not REF_TREE.is_dir():
        pytest.skip("reference tree unavailable")
    script = REPO / "tools" / "htslib_shim" / "build_ref.sh"
    shim_mtime = max(
        p.stat().st_mtime
        for p in (REPO / "tools" / "htslib_shim").rglob("*")
        if p.is_file()
    )
    if not BIN.exists() or BIN.stat().st_mtime < shim_mtime:
        r = subprocess.run(
            ["bash", str(script), str(REF_TREE), str(BUILD)],
            capture_output=True, text=True, timeout=600,
        )
        if r.returncode != 0:
            pytest.skip(f"reference build failed: {r.stderr[-500:]}")
    return BIN


def _fixture(tmp, n_reads=4000, ctg_len=60_000, n_contigs=1):
    sys.path.insert(0, str(REPO))
    from bench import _make_e2e_fixture

    return _make_e2e_fixture(str(tmp), n_reads, ctg_len, n_contigs=n_contigs)


def _run_c(binary, bam, ref, out, extra=()):
    r = subprocess.run(
        [str(binary), str(bam), "-r", str(ref), "-o", str(out),
         "--benchmark-mode", "-n", "SAMPLE", *extra],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-800:]


def _run_py(bam, ref, out, extra=()):
    r = subprocess.run(
        [sys.executable, "-m", "bs_call_tpu.cli", str(bam), "-r",
         str(ref), "-o", str(out), "--benchmark-mode", "-n", "SAMPLE",
         *extra],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": os.pathsep.join(
            p for p in (str(REPO), os.environ.get("PYTHONPATH")) if p
        )}, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-800:]


def test_byte_identity_default(ref_binary, tmp_path):
    ref, bam, _ = _fixture(tmp_path)
    _run_c(ref_binary, bam, ref, tmp_path / "c.vcf")
    _run_py(bam, ref, tmp_path / "py.vcf")
    c = (tmp_path / "c.vcf").read_bytes()
    p = (tmp_path / "py.vcf").read_bytes()
    assert c == p


def test_byte_identity_all_positions(ref_binary, tmp_path):
    ref, bam, _ = _fixture(tmp_path, n_reads=1500, ctg_len=30_000)
    _run_c(ref_binary, bam, ref, tmp_path / "c.vcf", ["-A"])
    _run_py(bam, ref, tmp_path / "py.vcf", ["-A"])
    assert (tmp_path / "c.vcf").read_bytes() == (
        tmp_path / "py.vcf"
    ).read_bytes()


def test_byte_identity_multi_contig(ref_binary, tmp_path):
    """Multi-contig parity vs the real binary.

    The reference must run per contig here: a single multi-contig run
    nondeterministically drops each non-final contig's last pileup
    block (a print-thread vs free_sequence race on ctg->end_pos,
    print_vcf.c:158 / get_sequence.c:24 — see
    tools/htslib_shim/README.md). One `-C` process per contig is the
    race-free configuration (each contig is that process's last) and
    the reference's documented per-contig production workflow; their
    concatenated records must equal our single multi-contig run."""
    ref, bam, _ = _fixture(
        tmp_path, n_reads=1200, ctg_len=25_000, n_contigs=3
    )
    c_records = b""
    for i in (1, 2, 3):
        bed = tmp_path / f"chr{i}.bed"
        bed.write_text(f"chr{i}\t0\t25000\n")
        out = tmp_path / f"c{i}.vcf"
        _run_c(ref_binary, bam, ref, out, ["-C", str(bed)])
        body = out.read_bytes()
        c_records += body[body.index(b"\nchr") + 1:]
    _run_py(bam, ref, tmp_path / "py.vcf", [])
    py = (tmp_path / "py.vcf").read_bytes()
    py_records = py[py.index(b"\nchr") + 1:]
    assert c_records == py_records
