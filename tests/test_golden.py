"""Golden snapshot regression: the frozen fixture must reproduce the
committed output byte-for-byte. Regenerate deliberately with
`python tests/make_golden.py` after intentional behavior changes."""

import os
import tempfile

import pytest

from make_golden import GOLDEN_DIR, run, run_bcf


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "golden.vcf")),
    reason="golden files not generated",
)
def test_golden_snapshot():
    with tempfile.TemporaryDirectory() as tmp:
        vcf, report = run(tmp)
    with open(os.path.join(GOLDEN_DIR, "golden.vcf")) as f:
        want_vcf = f.read()
    with open(os.path.join(GOLDEN_DIR, "golden_report.json")) as f:
        want_report = f.read()
    got = [l for l in vcf.splitlines() if not l.startswith("#")]
    want = [l for l in want_vcf.splitlines() if not l.startswith("#")]
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a == b
    assert vcf == want_vcf
    assert report == want_report


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "golden.bcf.u")),
    reason="golden BCF not generated",
)
def test_golden_bcf_snapshot():
    """BCF binary encoding (record layout + typed values) pinned as the
    decompressed stream, so zlib build differences cannot flake it."""
    with tempfile.TemporaryDirectory() as tmp:
        bcf = run_bcf(tmp)
    with open(os.path.join(GOLDEN_DIR, "golden.bcf.u"), "rb") as f:
        want = f.read()
    assert bcf == want
