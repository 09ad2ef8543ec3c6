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


def test_fisher_batch_parity():
    """Native diagonal-walk Fisher == scalar oracle bit-for-bit over
    randomized and adversarial 2x2 tables."""
    import numpy as np

    from bs_call_tpu.constants import LOG10
    from bs_call_tpu.native import load
    from bs_call_tpu.ops import oracle

    lib = load()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(17)
    tabs = rng.integers(0, 60, size=(4000, 4)).astype(np.int64)
    # adversarial rows: zeros, single-cell, big counts past the lfact
    # memo (lgamma path), symmetric tables
    extra = np.array(
        [
            [0, 0, 0, 0],
            [5, 0, 0, 0],
            [0, 7, 3, 0],
            [300, 2, 1, 400],
            [1000, 1000, 1000, 1000],
            [255, 256, 257, 258],
            [1, 0, 0, 1],
        ],
        dtype=np.int64,
    )
    tabs = np.concatenate([tabs, extra])
    import math

    out = np.empty(len(tabs), dtype=np.float64)
    lib.bsc_fisher_batch(len(tabs), tabs.ctypes.data, out.ctypes.data)
    for i, t in enumerate(tabs):
        z = oracle.fisher([int(v) for v in t])
        if z < 1.0e-20:
            z = 1.0e-20
        want = math.log(z) / LOG10  # libm, as the C binary
        assert out[i] == want, (i, t, out[i], want)


def test_phred_scores_vectorized_parity():
    import math

    import numpy as np

    from bs_call_tpu.constants import LOG10
    from bs_call_tpu.ops.postprocess import phred_scores

    rng = np.random.default_rng(23)
    n = 5000
    gt_prob = -rng.exponential(2.0, size=(n, 10))
    max_gt = rng.integers(0, 10, size=n).astype(np.int32)
    # saturation rows: argmax posterior == 1 exactly
    gt_prob[:50, :] = -50.0
    gt_prob[np.arange(50), max_gt[:50]] = 0.0
    got = phred_scores(gt_prob, max_gt)
    for i in range(n):
        z1 = math.exp(float(gt_prob[i, max_gt[i]]) * LOG10)
        if z1 >= 1.0:
            want = 255
        else:
            want = min(255, int(-10.0 * math.log(1.0 - z1) / LOG10))
        assert got[i] == want, (i, got[i], want)
