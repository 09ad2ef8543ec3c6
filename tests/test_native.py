"""Native C++ ingest parity vs the pure-Python BAM reader."""

import numpy as np
import pytest

from bs_call_tpu.io.bam import BamHeader, BamReader, BamWriter, aux_tag
from bs_call_tpu.io.bam import decode_bs_strand
from bs_call_tpu.native import load


pytestmark = pytest.mark.skipif(
    load() is None, reason="native toolchain unavailable"
)

SEQ = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


@pytest.fixture(scope="module")
def fixture_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    bam = tmp / "t.bam"
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:40\n",
        ref_names=["chr1"],
        ref_lens=[40],
    )
    w = BamWriter(str(bam), hdr)
    rng = np.random.default_rng(0)
    tags = [b"", aux_tag("XB", "A", "C"), aux_tag("ZS", "Z", "-"),
            aux_tag("NM", "i", 2) + aux_tag("XG", "Z", "GA")]
    for n in range(500):
        pos = n % 28
        ln = 5 + (n % 8)
        qual = rng.integers(0, 60, ln).astype(np.uint8)
        cigar = [(ln, 0)] if n % 3 else [(2, 4), (ln - 2, 0)]
        w.write(
            f"read{n}", (n % 2) * 16, 0, pos, n % 61, cigar,
            -1, -1, 0, SEQ[pos : pos + ln], qual, bytes(tags[n % 4]),
        )
    w.close()
    return str(bam)


def test_native_matches_python_reader(fixture_bam):
    from bs_call_tpu.native.reader import NativeBamReader

    py = list(BamReader(fixture_bam))
    nat = list(NativeBamReader(fixture_bam))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.tid == b.tid and a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        assert a.mtid == b.mtid and a.mpos == b.mpos and a.isize == b.isize
        np.testing.assert_array_equal(a.packed_read(), b.packed)
        assert decode_bs_strand(a.aux) == b.bs_strand


def test_native_end_to_end_matches_python(tmp_path):
    """Full pipeline must produce identical VCF with either reader."""
    import io

    from bs_call_tpu.config import CallerConfig
    from bs_call_tpu.pipeline.runner import run_caller

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
    outs = []
    for native in (False, True):
        import bs_call_tpu.io.sam as sam_mod

        orig = sam_mod.open_alignment_file
        cfg = CallerConfig(
            input_file=str(bam), reference_file=str(ref), benchmark_mode=True
        )
        out = io.BytesIO()
        if not native:
            # force pure-python reader
            import bs_call_tpu.pipeline.runner as runner_mod

            runner_mod.open_alignment_file = (
                lambda p, **kw: sam_mod.open_alignment_file(p, native=False)
            )
            run_caller(cfg, out_fileobj=out)
            runner_mod.open_alignment_file = orig
        else:
            run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]
