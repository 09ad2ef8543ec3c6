"""CSI index: build/read parity with BAI, generalized binning, and the
indexed-region pipeline path with only a .csi present
(process.c:125 sam_index_load loads either flavor)."""

import io
import os

import numpy as np

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bai import IndexedBamReader, write_bai
from bs_call_tpu.io.bam import BamReader
from bs_call_tpu.io.csi import CsiIndex, reg2bin, reg2bins, write_csi
from bs_call_tpu.pipeline.runner import run_caller

from test_bai import make_bam


def test_generalized_binning_matches_bai_scheme():
    from bs_call_tpu.io.bai import _reg2bin, _reg2bins

    rng = np.random.default_rng(0)
    for _ in range(500):
        beg = int(rng.integers(0, 1 << 28))
        end = beg + int(rng.integers(1, 100000))
        assert reg2bin(beg, end) == _reg2bin(beg, end)
        assert sorted(reg2bins(beg, end)) == sorted(_reg2bins(beg, end))


def test_csi_query_matches_bai(tmp_path):
    bam = make_bam(tmp_path)
    write_bai(bam)
    write_csi(bam)
    # force each index flavor explicitly
    idx_bai = IndexedBamReader(bam, bam + ".bai")
    idx_csi = IndexedBamReader(bam, bam + ".csi")
    assert isinstance(idx_csi.index, CsiIndex)
    for tid, beg, end in [
        (0, 0, 1000),
        (0, 150000, 160000),
        (1, 299000, 300000),
        (0, 50000, 50001),
        (1, 0, 300000),
    ]:
        a = [r.name for r in idx_bai.query(tid, beg, end)]
        b = [r.name for r in idx_csi.query(tid, beg, end)]
        assert a == b, (tid, beg, end)
    idx_bai.close()
    idx_csi.close()


def test_csi_nondefault_shift_depth(tmp_path):
    bam = make_bam(tmp_path, n=800)
    write_csi(bam, min_shift=12, depth=6)
    idx = IndexedBamReader(bam, bam + ".csi")
    assert (idx.index.min_shift, idx.index.depth) == (12, 6)
    all_recs = list(BamReader(bam))
    for tid, beg, end in [(0, 1000, 5000), (1, 100000, 140000)]:
        want = [
            r.name
            for r in all_recs
            if r.tid == tid
            and r.pos < end
            and r.pos + sum(l for l, op in r.cigar if op == 0) > beg
        ]
        got = [r.name for r in idx.query(tid, beg, end)]
        assert got == want
    idx.close()


def test_region_run_with_csi_only(tmp_path, monkeypatch):
    # keep the first pass genuinely index-free: round 5 auto-builds a
    # .bai for partial -C over non-indexed BAMs, which would turn the
    # "linear" arm into an indexed run
    monkeypatch.setattr(
        "bs_call_tpu.parallel.shard_runner._ensure_bam_index",
        lambda path: None,
    )
    bam = make_bam(tmp_path, n=500, ctg_len=50000)
    ctg_len = 50000
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), ctg_len))
    ref = tmp_path / "ref.fa"
    ref.write_text(
        ">chr1\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n>chr2\n"
        + "\n".join(seq[i : i + 60] for i in range(0, ctg_len, 60))
        + "\n"
    )
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t10000\t20000\nchr2\t5000\t9000\n")
    outs = []
    for mode in ("linear", "csi"):
        if mode == "csi":
            write_csi(bam)
        assert not os.path.exists(bam + ".bai")
        cfg = CallerConfig(
            input_file=bam, reference_file=str(ref),
            benchmark_mode=True, contig_bed=str(bed),
        )
        out = io.BytesIO()
        run_caller(cfg, out_fileobj=out)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]
