"""Native emit-side stats accumulator vs the numpy path (byte parity).

bsc_stats.cpp's StatsAcc replaces VectorBlockEmitter._accumulate_stats'
numpy kernels with one sequential C++ pass (the reference's inline
printer-thread accumulation, print_vcf.c:382-526). The full JSON report
— totals, per-contig, coverage hash, GC%, QC distributions, filter
combos, CpG pairs, methylation posterior grids, mutation spectra —
must be byte-identical between the two implementations."""

import io
import os

import numpy as np
import pytest

from bs_call_tpu.config import CallerConfig
from bs_call_tpu.io.bam import BamHeader, BamWriter
from bs_call_tpu.pipeline.runner import run_caller
from bs_call_tpu.stats.collect import BsStats
from bs_call_tpu.stats.report import write_report


def make_fixture(tmp_path, seed=5):
    """CpG-rich two-contig fixture with pairs, dbSNP-ish density and
    heavy bisulfite conversion so every report section is non-trivial."""
    rng = np.random.default_rng(seed)
    lens = [5000, 3000]
    names = ["chr1", "chr2"]
    seqs = []
    for ln in lens:
        # salt with CG dinucleotides so CpG stats and meth grids fill
        s = rng.choice(list("ACGT"), ln)
        for p in range(10, ln - 2, 17):
            s[p], s[p + 1] = "C", "G"
        seqs.append("".join(s))
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as f:
        for name, seq in zip(names, seqs):
            f.write(f">{name}\n{seq}\n")
    hdr = BamHeader(
        text="@HD\tVN:1.6\tSO:coordinate\n"
        + "".join(f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(names, lens)),
        ref_names=names,
        ref_lens=lens,
    )
    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, hdr)
    rn = 0
    for tid, (seq, ln) in enumerate(zip(seqs, lens)):
        for pos in sorted(rng.integers(0, ln - 130, 900)):
            pos = int(pos)
            rlen = int(rng.integers(60, 110))
            rseq = list(seq[pos : pos + rlen])
            rev = bool(rng.random() < 0.5)
            for i in range(len(rseq)):
                if not rev and rseq[i] == "C" and rng.random() < 0.6:
                    rseq[i] = "T"
                if rev and rseq[i] == "G" and rng.random() < 0.6:
                    rseq[i] = "A"
                if rng.random() < 0.01:
                    rseq[i] = "ACGT"[int(rng.integers(4))]
            q = rng.integers(18, 42, len(rseq)).astype(np.uint8)
            w.write(
                f"r{rn}", 16 if rev else 0, tid, pos,
                int(rng.integers(20, 60)), [(len(rseq), 0)], -1, -1, 0,
                "".join(rseq), q,
            )
            rn += 1
    w.close()
    return str(ref), bam


def _report(bam, ref, force_py):
    env_before = os.environ.get("BS_CALL_PY_STATS")
    if force_py:
        os.environ["BS_CALL_PY_STATS"] = "1"
    else:
        os.environ.pop("BS_CALL_PY_STATS", None)
    try:
        cfg = CallerConfig(
            input_file=bam, reference_file=ref, benchmark_mode=True,
        )
        out = io.BytesIO()
        stats = BsStats()
        _, table = run_caller(cfg, out_fileobj=out, stats=stats)
        rep = io.StringIO()
        write_report(rep, cfg, stats, table)
        return out.getvalue(), rep.getvalue()
    finally:
        if env_before is None:
            os.environ.pop("BS_CALL_PY_STATS", None)
        else:
            os.environ["BS_CALL_PY_STATS"] = env_before


def test_native_stats_report_byte_parity(tmp_path):
    ref, bam = make_fixture(tmp_path)
    v_nat, r_nat = _report(bam, ref, force_py=False)
    v_py, r_py = _report(bam, ref, force_py=True)
    assert v_nat == v_py
    assert r_nat == r_py
    # the fixture must actually exercise the interesting sections
    assert '"CpG_ref"' in r_nat or "CpG" in r_nat
    assert "Coverage" in r_nat or "coverage" in r_nat


def test_native_stats_used_by_default(tmp_path):
    from bs_call_tpu.stats.native_acc import NativeStatsAcc

    acc = NativeStatsAcc.create()
    assert acc is not None, "native stats accumulator must load here"
    acc.close()
